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


def test_multi_n_sweep_matches_union_of_single_n(frames):
    docs, bench = frames
    swept = {r["doc_id"] for r in contaminated_doc_ids(
        docs, bench, ns=range(3, 6), broadcast_benchmark=True).collect()}
    singles = set()
    for n in range(3, 6):
        singles |= {r["doc_id"] for r in contaminated_doc_ids(
            docs, bench, n=n, broadcast_benchmark=True).collect()}
    assert swept == singles
    assert swept >= {1, 4}  # the 4-gram overlaps survive in the sweep


def test_contamination_stats_reports_first_gram(frames):
    from kit_spark.functions.decontam import contamination_stats

    docs, bench = frames
    rows = {r["doc_id"]: r for r in contamination_stats(
        docs, bench, n=4, broadcast_benchmark=True).collect()}
    assert set(rows) == {1, 4}
    # doc 1: "alpha beta gamma delta epsilon zeta" — bench 4-gram at pos 0
    assert rows[1]["first_gram_pos"] == 0
    assert rows[1]["first_gram_n"] == 4
    assert rows[1]["first_gram"] == "alpha beta gamma delta"
    assert rows[1]["n_matched_grams"] == 1
    # doc 4 normalizes to the same leading 4-gram
    assert rows[4]["first_gram"] == "alpha beta gamma delta"


def test_contamination_stats_matches_duckdb(spark):
    import duckdb as _dd

    from kit_spark.functions.decontam import contamination_stats

    sf = "/root/testdata/sf0.001"
    all_docs = spark.read.parquet(f"{sf}/documents.parquet").repartition(8)
    docs = all_docs.where("doc_id >= 20")
    bench = all_docs.where("doc_id < 20").select("text")
    n = 5
    got = {r["doc_id"]: (r["n_matched_grams"], r["first_gram_pos"],
                         r["first_gram"])
           for r in contamination_stats(docs, bench, n=n).collect()}

    con = _dd.connect()
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
         unnest(generate_series(1, len(w) - {n} + 1)) AS p,
         w FROM norm WHERE len(w) >= {n}),
gtext AS (
  SELECT doc_id, p - 1 AS pos,
         array_to_string(w[p:p+{n}-1], ' ') AS gram FROM grams),
bench AS (SELECT DISTINCT gram FROM gtext WHERE doc_id < 20)
SELECT g.doc_id,
       count(DISTINCT g.gram) AS n_matched,
       min(g.pos) AS first_pos,
       min_by(g.gram, g.pos) AS first_gram
FROM gtext g JOIN bench b USING (gram)
WHERE g.doc_id >= 20 GROUP BY g.doc_id
"""
    expect = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
    assert got == expect and expect


def test_decontam_plan_semi_join_on_longs(frames):
    from kit_spark import plans
    from kit_spark.functions.decontam import contaminated_doc_ids

    docs, bench = frames
    q = contaminated_doc_ids(docs, bench, ns=range(10, 14))
    plan = plans.formatted_plan(q)
    assert "LeftSemi" in plan
    assert "xxhash64" in plan
    assert "EvalPython" not in plan
    plans.assert_no_cartesian(q)


def test_empty_ns_rejected(frames):
    from kit_spark.functions.decontam import contamination_stats

    docs, bench = frames
    with pytest.raises(ValueError, match="gram size"):
        contaminated_doc_ids(docs, bench, ns=[])
    with pytest.raises(ValueError, match="gram size"):
        contamination_stats(docs, bench, ns=iter(()))


def test_ns_accepts_one_shot_iterator(frames):
    docs, bench = frames
    it = iter([4])  # both the docs and bench sides consume `ns`
    got = {r["doc_id"] for r in contaminated_doc_ids(
        docs, bench, ns=it, broadcast_benchmark=True).collect()}
    want = {r["doc_id"] for r in contaminated_doc_ids(
        docs, bench, n=4, broadcast_benchmark=True).collect()}
    assert got == want


def test_contamination_stats_exact_mode_matches_hashed(frames):
    from kit_spark.functions.decontam import contamination_stats

    docs, bench = frames
    kw = dict(n=4, broadcast_benchmark=True)
    hashed = {tuple(r) for r in contamination_stats(
        docs, bench, **kw).collect()}
    exact = {tuple(r) for r in contamination_stats(
        docs, bench, hash_grams=False, **kw).collect()}
    assert hashed == exact and exact
