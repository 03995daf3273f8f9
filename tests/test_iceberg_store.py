"""IcebergSnapshotStore tests — run only when an iceberg-spark-runtime jar
is on the classpath (the sandbox image ships none; on a real cluster these
exercise the production store branch the parquet fallback mirrors)."""

import pytest
from pyspark.sql import functions as F

from kit_spark.sources.tables import IcebergSnapshotStore, iceberg_available


@pytest.fixture(scope="module")
def iceberg_store(spark):
    from kit_spark.sources.tables import iceberg_catalog_name

    if not iceberg_available(spark):
        pytest.skip("no iceberg runtime jar + catalog configured")
    return IcebergSnapshotStore(spark, catalog=iceberg_catalog_name(spark),
                                namespace="kit_test")


def test_write_read_history_roundtrip(iceberg_store, spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    snap1 = iceberg_store.write("t1", df)
    assert iceberg_store.exists("t1")
    assert iceberg_store.read("t1").count() == 2
    snap2 = iceberg_store.write("t1", df.limit(1))
    assert snap2 != snap1
    # time travel back to the first commit
    assert iceberg_store.read("t1", snap1).count() == 2
    assert iceberg_store.read("t1").count() == 1
    assert iceberg_store.history("t1")[-1] == snap2


def test_bucketed_url_seen_and_idempotent_merge(iceberg_store, spark):
    seen = spark.createDataFrame(
        [(f"https://h{i % 3}.test/u{i}",) for i in range(100)],
        "url_canon string")
    iceberg_store.write_bucketed("url_seen_t", seen, n_buckets=4)
    newer = spark.createDataFrame(
        [(f"https://h{i % 3}.test/u{i}",) for i in range(50, 150)],
        "url_canon string")
    iceberg_store.merge_url_seen(newer, name="url_seen_t")
    assert iceberg_store.read("url_seen_t").count() == 150
    # replaying the same merge (torn-round resume) must not duplicate
    iceberg_store.merge_url_seen(newer, name="url_seen_t")
    assert iceberg_store.read("url_seen_t").count() == 150
    # hidden bucket partitioning visible in the files metadata table
    files = spark.sql(
        f"SELECT partition FROM {iceberg_store._ident('url_seen_t')}.files"
    ).collect()
    assert len(files) >= 1


def test_sql_surface_parses(spark):
    """Pure-metadata dry check, runs WITHOUT the Iceberg jar: every SQL
    statement the store can issue must parse under Spark's SQL parser.
    Catches drift between the store's string builders and Spark's grammar
    (MERGE INTO, VERSION AS OF time travel, metadata tables, TBLPROPERTIES,
    CALL procedure syntax) even though execution needs a real catalog."""
    store = IcebergSnapshotStore.__new__(IcebergSnapshotStore)  # no catalog:
    store.spark = spark                      # skip __init__'s CREATE NAMESPACE
    store.catalog, store.namespace = "local", "kit"
    parser = spark._jsparkSession.sessionState().sqlParser()  # noqa: SLF001
    surface = store.sql_surface()
    assert set(surface) == {"create_namespace", "snapshots",
                            "snapshots_latest", "set_meta", "merge_url_seen",
                            "time_travel", "show_props", "rollback"}
    for key, sql in surface.items():
        parser.parsePlan(sql)  # raises ParseException on invalid syntax


def test_sql_surface_is_what_executes(spark):
    """The executing methods must go through the same dry builders the
    parse test covers (no second, unchecked SQL path)."""
    import inspect

    from kit_spark.sources import tables

    src = inspect.getsource(tables.IcebergSnapshotStore)
    # every spark.sql(...) call inside the store references a *_sql builder
    import re

    for call in re.findall(r"self\.spark\.sql\(([^)]*)\)", src):
        assert "_sql(" in call or "sql_surface" in call, call
