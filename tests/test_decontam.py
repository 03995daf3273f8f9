"""Benchmark-decontamination operator: DuckDB replay + crafted cases."""

import duckdb
import pytest

from kit_spark.functions.decontam import contaminated_doc_ids, decontaminate

DOCS = [
    (1, "alpha beta gamma delta epsilon zeta"),   # contains bench 4-gram
    (2, "alpha beta gamma X delta epsilon"),       # broken by X: clean
    (3, "totally unrelated text goes right here"),
    (4, "Alpha  Beta GAMMA   delta words after"),  # normalization match
    (5, "tiny doc"),                               # shorter than n
]
BENCH = [
    ("alpha beta gamma delta",),
    ("some benchmark question nobody copied",),
]


@pytest.fixture(scope="module")
def frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    bench = spark.createDataFrame(BENCH, "text string")
    return docs, bench


def test_flags_exact_and_normalized_overlap(frames):
    docs, bench = frames
    for hash_grams in (True, False):
        flagged = {r["doc_id"] for r in contaminated_doc_ids(
            docs, bench, n=4, hash_grams=hash_grams,
            broadcast_benchmark=True).collect()}
        assert flagged == {1, 4}, hash_grams


def test_decontaminate_keeps_the_rest(frames):
    docs, bench = frames
    kept = {r["doc_id"] for r in decontaminate(docs, bench, n=4).collect()}
    assert kept == {2, 3, 5}


def test_matches_duckdb_on_documents(spark):
    """Use the first 20 fixture docs as a fake benchmark against the rest:
    replay the whole n-gram membership construction in DuckDB and compare
    flagged sets exactly (hashed and exact modes must agree too)."""
    sf = "/root/testdata/sf0.001"
    all_docs = spark.read.parquet(f"{sf}/documents.parquet").repartition(8)
    docs = all_docs.where("doc_id >= 20")
    bench = all_docs.where("doc_id < 20").select("text")
    n = 5
    got_exact = {r["doc_id"] for r in contaminated_doc_ids(
        docs, bench, n=n, hash_grams=False).collect()}
    got_hashed = {r["doc_id"] for r in contaminated_doc_ids(
        docs, bench, n=n, hash_grams=True).collect()}
    assert got_exact == got_hashed  # xxhash64 collisions: none expected here

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    sql = f"""
WITH norm AS (
  SELECT doc_id,
         string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
                      ' ') AS w
  FROM documents),
grams AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(w) - {n} + 1),
                i -> array_to_string(w[i:i+{n}-1], ' '))) AS gram
  FROM norm WHERE len(w) >= {n}),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < 20)
SELECT DISTINCT g.doc_id
FROM grams g JOIN bench b USING (gram)
WHERE g.doc_id >= 20
"""
    expect = {r[0] for r in con.execute(sql).fetchall()}
    assert got_exact == expect
    assert expect, "fixture should produce at least one overlap at n=5"
