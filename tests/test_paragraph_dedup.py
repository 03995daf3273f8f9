"""Cross-document paragraph dedup: crafted cases, DuckDB replay, plan lock."""

import duckdb

from kit_spark import plans
from kit_spark.functions.dedup import paragraph_dedup

NL = "\n"

DOCS = [
    (1, "shared boiler plate" + NL + "" + NL + "unique body one"),
    (2, "Shared  BOILER plate" + NL + "unique body two"),   # normalized dup
    (3, "unique body three" + NL + "shared boiler plate"),  # dup at pos 1
    (4, "shared boiler plate"),                             # nothing survives
    (5, "" + NL + ""),                                      # blanks are exempt
]


def _run(spark, hash_paras):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {r["doc_id"]: r for r in
            paragraph_dedup(docs, hash_paras=hash_paras).collect()}


def test_first_occurrence_wins_and_order_survives(spark):
    for hash_paras in (True, False):
        out = _run(spark, hash_paras)
        assert set(out) == {1, 2, 3, 4, 5}
        # doc 1 is the global first occurrence: keeps everything
        assert out[1]["text_dedup"] == DOCS[0][1]
        assert (out[1]["n_paras"], out[1]["n_kept"]) == (3, 3)
        # doc 2's first paragraph normalizes into doc 1's — dropped
        assert out[2]["text_dedup"] == "unique body two"
        assert (out[2]["n_paras"], out[2]["n_kept"]) == (2, 1)
        # doc 3 loses the duplicate at pos 1, keeps pos 0
        assert out[3]["text_dedup"] == "unique body three"
        # doc 4 loses its only paragraph: present, empty, counted
        assert out[4]["text_dedup"] == ""
        assert (out[4]["n_paras"], out[4]["n_kept"]) == (1, 0)
        # blank lines are exempt from dedup (min_chars=1): doc 5 intact
        assert out[5]["text_dedup"] == DOCS[4][1]
        assert (out[5]["n_paras"], out[5]["n_kept"]) == (2, 2)


def test_matches_duckdb_on_documents(spark):
    """Union the fixture docs with a doc_id-shifted copy (every copied
    paragraph is a cross-doc duplicate; originals win on doc_id order)
    and replay the whole construction in DuckDB."""
    sf = "/root/testdata/sf0.001"
    base = spark.read.parquet(f"{sf}/documents.parquet") \
        .select("doc_id", "text").limit(200)
    docs = base.union(base.selectExpr("doc_id + 100000 AS doc_id", "text")) \
        .repartition(8)
    got = {r["doc_id"]: (r["text_dedup"], r["n_paras"], r["n_kept"])
           for r in paragraph_dedup(docs, hash_paras=False).collect()}
    got_hashed = {r["doc_id"]: (r["text_dedup"], r["n_paras"], r["n_kept"])
                  for r in paragraph_dedup(docs, hash_paras=True).collect()}
    assert got == got_hashed  # no xxhash64 collisions expected here

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW base AS SELECT doc_id, text FROM "
        f"read_parquet('{sf}/documents.parquet') ORDER BY doc_id LIMIT 200")
    con.execute("CREATE VIEW docs2 AS SELECT * FROM base "
                "UNION ALL SELECT doc_id + 100000, text FROM base")
    sql = r"""
WITH paras AS (
  SELECT doc_id, i - 1 AS pos, parts[i] AS para
  FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM docs2),
       LATERAL unnest(generate_series(1, len(parts))) AS t(i)
),
normed AS (
  SELECT *, regexp_replace(trim(lower(para)), '\s+', ' ', 'g') AS k
  FROM paras),
flagged AS (SELECT *, length(k) >= 1 AS elig FROM normed),
ranked AS (
  SELECT doc_id, pos, para,
         row_number() OVER (PARTITION BY k ORDER BY doc_id, pos) AS rn
  FROM flagged WHERE elig),
kept AS (
  SELECT doc_id, pos, para FROM ranked WHERE rn = 1
  UNION ALL
  SELECT doc_id, pos, para FROM flagged WHERE NOT elig),
agg AS (
  SELECT doc_id, string_agg(para, chr(10) ORDER BY pos) AS text_dedup,
         count(*) AS n_kept FROM kept GROUP BY doc_id),
totals AS (
  SELECT doc_id, len(string_split(text, chr(10))) AS n_paras FROM docs2)
SELECT t.doc_id, coalesce(a.text_dedup, '') AS text_dedup, t.n_paras,
       coalesce(a.n_kept, 0) AS n_kept
FROM totals t LEFT JOIN agg a USING (doc_id)
"""
    expect = {r[0]: (r[1], r[2], r[3]) for r in con.execute(sql).fetchall()}
    assert got == expect
    # the shifted copies must actually have been deduplicated
    n_copy_kept = sum(v[2] for k, v in expect.items() if k >= 100000)
    n_copy_paras = sum(v[1] for k, v in expect.items() if k >= 100000)
    assert n_copy_kept < n_copy_paras


def test_plan_shape(spark):
    # groupBy-min winner election + key join + per-doc reassembly:
    # no Python, no window over the corpus, no cartesian
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    out = paragraph_dedup(docs)
    plan = plans.formatted_plan(out)
    assert "EvalPython" not in plan
    assert "Window" not in plan
    plans.assert_no_cartesian(out)
