"""Snapshot table store — checkpointable state tables (D8).

On a production cluster this layer is Iceberg (atomic snapshots, MERGE INTO,
hidden bucket partitioning); the sandbox image ships no Iceberg runtime jar
(spark.read.format("iceberg") is probed at import), so the same narrow API —
``write(name, df)`` / ``read(name)`` / ``history(name)`` — is implemented
over parquet snapshot directories with an atomically-replaced ``_CURRENT``
pointer.  Semantics preserved relative to Iceberg:

* every commit is a new immutable snapshot directory (``snap-00007/``);
* readers resolve through ``_CURRENT`` (os.replace — atomic on POSIX), so a
  crash mid-write leaves the previous snapshot current: checkpoint/resume
  reads a consistent set of tables;
* ``history`` exposes snapshot ids for the lineage table;
* bucketed layout for the url_seen table: writers pre-repartition by
  ``pmod(xxhash64(url_canon), n_buckets)`` so the per-round anti-join
  reuses a stable partitioning (Iceberg ``bucket(url_canon)`` analog).
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F


def iceberg_catalog_name(spark: SparkSession) -> str | None:
    """Name of a configured Iceberg Spark catalog, or None."""
    for key, value in spark.sparkContext.getConf().getAll():
        if (key.startswith("spark.sql.catalog.") and key.count(".") == 3
                and "iceberg" in value.lower()):
            return key.rsplit(".", 1)[1]
    return None


def iceberg_available(spark: SparkSession) -> bool:
    """True only when BOTH the runtime jar and a catalog are configured.

    NOTE: probing ``spark._jvm.org.apache.iceberg.Table`` is a false
    positive — py4j returns a JavaPackage placeholder for missing classes
    instead of raising — so the class check must go through
    ``java.lang.Class.forName`` (which genuinely throws)."""
    if iceberg_catalog_name(spark) is None:
        return False
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.Table")
        return True
    except Exception:
        return False


class IcebergSnapshotStore:
    """Iceberg-backed implementation of the same narrow store API
    (``write/read/read_or_none/exists/current_snapshot/history/meta``),
    used when an iceberg-spark-runtime jar and a catalog are on the
    classpath (``snapshot_store`` picks it automatically).

    Mapping to Iceberg:

    * ``write(name, df)`` -> ``writeTo(...).createOrReplace()`` — one
      atomic Iceberg snapshot commit per call; the returned id is the
      table's new ``snapshot_id`` (read back from the ``.snapshots``
      metadata table), so lineage rows carry real Iceberg snapshot ids.
    * ``read(name, snapshot)`` -> time travel (``VERSION AS OF``).
    * ``write_bucketed`` -> hidden ``bucket(n, url_canon)`` partition
      transform, the cluster-scale analog of the parquet store's manual
      ``pmod(xxhash64(url_canon), n)`` layout: the per-round url_seen
      anti-join co-locates on the bucket without a user-visible column.
    * ``merge_url_seen`` -> ``MERGE INTO ... WHEN NOT MATCHED THEN
      INSERT`` — the idempotent commit the crawl driver uses on resume
      (re-running a torn round re-merges the same admitted set with no
      duplicate rows), replacing the fallback's rewrite-the-union commit.

    The execution paths need an Iceberg jar (tests/test_iceberg_store.py
    runs them when one is present; the sandbox ships none), but every SQL
    statement the store issues is built by the dry ``*_sql`` builders
    below and asserted parseable by Spark's own SQL parser in
    ``test_sql_surface_parses`` — so the SQL surface is verified even
    where the catalog cannot run.
    """

    def __init__(self, spark: SparkSession, catalog: str = "local",
                 namespace: str = "kit") -> None:
        self.spark = spark
        self.catalog = catalog
        self.namespace = namespace
        spark.sql(self.create_namespace_sql())

    def _ident(self, name: str) -> str:
        return f"{self.catalog}.{self.namespace}.{name}"

    # --- SQL surface (dry string builders) ---------------------------------
    # Every statement the store runs is built here and ONLY executed through
    # these, so the sandbox (which ships no iceberg-spark-runtime jar) can
    # still assert the whole surface parses — tests/test_iceberg_store.py::
    # test_sql_surface_parses feeds each through Spark's SQL parser.

    def create_namespace_sql(self) -> str:
        return (f"CREATE NAMESPACE IF NOT EXISTS "
                f"{self.catalog}.{self.namespace}")

    def snapshots_sql(self, name: str, latest_only: bool = False) -> str:
        sql = (f"SELECT snapshot_id FROM {self._ident(name)}.snapshots "
               f"ORDER BY committed_at")
        return (sql + " DESC LIMIT 1") if latest_only else sql

    def set_meta_sql(self, name: str, meta: dict) -> str:
        props = ", ".join(f"'kit.meta.{k}'='{v}'" for k, v in meta.items())
        return f"ALTER TABLE {self._ident(name)} SET TBLPROPERTIES ({props})"

    def merge_url_seen_sql(self, name: str, url_col: str, view: str) -> str:
        return (f"MERGE INTO {self._ident(name)} t "
                f"USING {view} s ON t.{url_col} = s.{url_col} "
                f"WHEN NOT MATCHED THEN INSERT *")

    def time_travel_sql(self, name: str, snapshot: str) -> str:
        return f"SELECT * FROM {self._ident(name)} VERSION AS OF {snapshot}"

    def show_props_sql(self, name: str) -> str:
        return f"SHOW TBLPROPERTIES {self._ident(name)}"

    def rollback_sql(self, name: str, snapshot: str) -> str:
        """Torn-round recovery: roll the table head back to the pinned
        snapshot before replaying (an Iceberg stored procedure; needs the
        Iceberg SQL extensions on a real cluster)."""
        return (f"CALL {self.catalog}.system.rollback_to_snapshot"
                f"('{self.namespace}.{name}', {snapshot})")

    def sql_surface(self) -> dict[str, str]:
        """One representative instance of every statement the store can
        issue — the dry-testable contract."""
        return {
            "create_namespace": self.create_namespace_sql(),
            "snapshots": self.snapshots_sql("url_seen"),
            "snapshots_latest": self.snapshots_sql("url_seen",
                                                   latest_only=True),
            "set_meta": self.set_meta_sql("url_seen",
                                          {"round": "3", "rows": "100"}),
            "merge_url_seen": self.merge_url_seen_sql(
                "url_seen", "url_canon", "__kit_merge_url_seen"),
            "time_travel": self.time_travel_sql("url_seen",
                                                "4216516472974892331"),
            "show_props": self.show_props_sql("url_seen"),
            "rollback": self.rollback_sql("url_seen", "4216516472974892331"),
        }

    # --- execution ---------------------------------------------------------

    def _last_snapshot_id(self, name: str) -> str:
        row = self.spark.sql(self.snapshots_sql(name,
                                                latest_only=True)).collect()
        return str(row[0][0])

    def write(self, name: str, df: DataFrame,
              meta: dict | None = None) -> str:
        df.writeTo(self._ident(name)).using("iceberg") \
            .tableProperty("commit.retry.num-retries", "4") \
            .createOrReplace()
        if meta:
            self.spark.sql(self.set_meta_sql(name, meta))
        return self._last_snapshot_id(name)

    def append(self, name: str, delta: DataFrame, meta: dict | None = None,
               parent: str | None = None) -> str:
        """True Iceberg append — one snapshot commit containing the delta.

        ``parent`` is accepted for API parity with the parquet store but
        unused: Iceberg appends always chain from the table head.  Torn-
        round replay on Iceberg therefore uses ``merge_url_seen`` (insert-
        only MERGE) for the dedup-critical table and tolerates duplicate
        log rows keyed by round elsewhere — or rolls back to the pinned
        snapshot_id first (``CALL catalog.system.rollback_to_snapshot``)."""
        if not self.exists(name):
            return self.write(name, delta, meta)
        delta.writeTo(self._ident(name)).append()
        return self._last_snapshot_id(name)

    def write_bucketed(self, name: str, df: DataFrame, n_buckets: int,
                       bucket_col: str = "url_canon") -> str:
        ident = self._ident(name)
        df.writeTo(ident).using("iceberg") \
            .partitionedBy(F.bucket(n_buckets, bucket_col)) \
            .createOrReplace()
        return self._last_snapshot_id(name)

    def merge_url_seen(self, admitted: DataFrame, name: str = "url_seen",
                       url_col: str = "url_canon") -> str:
        """Idempotent url_seen commit: insert-only MERGE keyed on the
        canonical URL (safe to replay after a torn round)."""
        view = f"__kit_merge_{name}"
        admitted.select(url_col).createOrReplaceTempView(view)
        self.spark.sql(self.merge_url_seen_sql(name, url_col, view))
        self.spark.catalog.dropTempView(view)
        return self._last_snapshot_id(name)

    def exists(self, name: str) -> bool:
        return self.spark.catalog.tableExists(self._ident(name))

    def current_snapshot(self, name: str) -> str | None:
        return self._last_snapshot_id(name) if self.exists(name) else None

    def read(self, name: str, snapshot: str | None = None) -> DataFrame:
        if snapshot is None:
            return self.spark.table(self._ident(name))
        return self.spark.sql(self.time_travel_sql(name, snapshot))

    def read_or_none(self, name: str) -> DataFrame | None:
        return self.read(name) if self.exists(name) else None

    def history(self, name: str) -> list[str]:
        rows = self.spark.sql(self.snapshots_sql(name)).collect()
        return [str(r[0]) for r in rows]

    def rollback_to_snapshot(self, name: str, snapshot: str) -> None:
        """Roll the table head back to ``snapshot`` (torn-round recovery
        path documented in ``append``); requires the Iceberg SQL
        extensions (procedure syntax) on the cluster."""
        self.spark.sql(self.rollback_sql(name, snapshot))

    def meta(self, name: str, snapshot: str | None = None) -> dict:
        rows = self.spark.sql(self.show_props_sql(name)).collect()
        prefix = "kit.meta."
        return {r["key"][len(prefix):]: r["value"] for r in rows
                if r["key"].startswith(prefix)}


def snapshot_store(spark: SparkSession, root: str):
    """Factory: Iceberg-backed store when the runtime jar + catalog are
    configured, parquet snapshot-directory fallback otherwise (same API)."""
    if iceberg_available(spark):
        return IcebergSnapshotStore(spark, catalog=iceberg_catalog_name(spark))
    return SnapshotStore(spark, root)


class SnapshotStore:
    """Parquet snapshot directories with an atomic current-pointer."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths ---------------------------------------------------------------

    def _table_dir(self, name: str) -> str:
        path = os.path.join(self.root, name)
        os.makedirs(path, exist_ok=True)
        return path

    def _pointer(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_CURRENT")

    def current_snapshot(self, name: str) -> str | None:
        try:
            with open(self._pointer(name)) as fh:
                return fh.read().strip() or None
        except FileNotFoundError:
            return None

    def exists(self, name: str) -> bool:
        return self.current_snapshot(name) is not None

    # -- io ------------------------------------------------------------------

    def write(self, name: str, df: DataFrame, meta: dict | None = None) -> str:
        """Commit a new snapshot of ``name``; returns the snapshot id."""
        table_dir = self._table_dir(name)
        current = self.current_snapshot(name)
        next_id = 0 if current is None else int(current.split("-")[1]) + 1
        snap = f"snap-{next_id:05d}"
        out_dir = os.path.join(table_dir, snap)
        df.write.mode("overwrite").parquet(out_dir)
        if meta:
            with open(os.path.join(out_dir, "_meta.json"), "w") as fh:
                json.dump(meta, fh)
        # atomic pointer swap: readers never see a half-written snapshot
        fd, tmp = tempfile.mkstemp(dir=table_dir, prefix=".ptr-")
        with os.fdopen(fd, "w") as fh:
            fh.write(snap)
        os.replace(tmp, self._pointer(name))
        return snap

    _CURRENT_PARENT = "__current__"

    def append(self, name: str, delta: DataFrame, meta: dict | None = None,
               parent: str | None = _CURRENT_PARENT) -> str:
        """Delta commit (Iceberg append analog): the new snapshot holds only
        ``delta``'s rows plus a parent pointer; readers resolve the chain.
        Keeps per-round write cost O(delta) instead of O(total) for the
        monotonically growing tables (schedule, fetch_log, url_seen,
        robots_cache, metrics, lineage) — at the 10^10-row design point a
        full rewrite per round would dominate the round.

        ``parent`` defaults to the current pointer; a checkpointing caller
        replaying a torn round MUST pass its own pinned snapshot instead
        (the crawl driver passes driver_state's) so the replayed delta
        chains past any orphan left by the crash — otherwise the orphan's
        rows would be double-counted through the chain.
        """
        merged = dict(meta or {})
        merged["parent"] = (self.current_snapshot(name)
                            if parent == self._CURRENT_PARENT else parent)
        return self.write(name, delta, merged)

    def _chain(self, name: str, snap: str) -> list[str]:
        paths = []
        current: str | None = snap
        while current is not None:
            paths.append(os.path.join(self.root, name, current))
            current = self.meta(name, current).get("parent")
        return paths

    def read(self, name: str, snapshot: str | None = None) -> DataFrame:
        snap = snapshot or self.current_snapshot(name)
        if snap is None:
            raise FileNotFoundError(f"table {name} has no current snapshot")
        # resolving through the *pinned* snapshot (not the pointer) keeps
        # torn-commit resume consistent: orphan deltas past the pinned
        # snapshot are invisible
        return self.spark.read.parquet(*self._chain(name, snap))

    def read_or_none(self, name: str) -> DataFrame | None:
        return self.read(name) if self.exists(name) else None

    def history(self, name: str) -> list[str]:
        table_dir = self._table_dir(name)
        return sorted(d for d in os.listdir(table_dir) if d.startswith("snap-"))

    def meta(self, name: str, snapshot: str | None = None) -> dict:
        snap = snapshot or self.current_snapshot(name)
        try:
            with open(os.path.join(self.root, name, snap, "_meta.json")) as fh:
                return json.load(fh)
        except (FileNotFoundError, TypeError):
            return {}


def bucketed_by_url(df: DataFrame, n_buckets: int,
                    url_col: str = "url_canon") -> DataFrame:
    """Stable bucket layout for url_seen (Iceberg bucket-partition analog):
    co-locates the anti-join probe across rounds."""
    return df.repartition(n_buckets, F.pmod(F.xxhash64(url_col),
                                            F.lit(n_buckets)))


def read_robots_dir(spark: SparkSession, directory: str) -> DataFrame:
    """S2: robots.txt bodies from files — ``binaryFile`` source, one row per
    file: (host_key from the file name 'scheme_host_port.txt', access_state
    'successful', body).  The fetched-bytes column path (S1) is the usual
    production shape; this covers file-drop deployments and tests."""
    files = spark.read.format("binaryFile").load(f"{directory}/*.txt")
    name = F.regexp_extract(F.element_at(F.split("path", "/"), -1),
                            r"(.+)\.txt$", 1)
    # file-name convention: <scheme>_<host>_<port>.txt
    host_key = F.regexp_replace(name, r"^([a-z]+)_(.+)_([0-9]+)$",
                                r"$1://$2:$3")
    return files.select(
        host_key.alias("host_key"),
        F.lit("successful").alias("access_state"),
        F.col("content").alias("body"),
        F.col("length").alias("body_bytes"),  # countio S15 analog
    )
