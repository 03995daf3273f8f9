"""Gopher-style repetition filters vs a DuckDB replay (in-test oracle;
the driver catalog is capped at 50 entries, so this operator's oracle
lives here with the same rigor: same SQL engine, value comparison)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from kit_spark.functions.text import repetition_stats

DOCS = [
    (1, "a b c\na b c\nx y z"),              # one duplicated line of 3
    (2, "aaa\naaa\naaa\naaa"),               # all lines duplicate
    (3, "unique one\nunique two\nunique three"),
    (4, "spark spark spark batch batch"),     # heavy 2-gram repetition
    (5, "one two three four five six"),       # no repetition
    (6, ""),                                  # empty doc
    (7, "t t t t t t t t"),                   # degenerate single token
]


@pytest.fixture(scope="module")
def result(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert sorted(rows) == [d for d, _ in DOCS]
    return rows


def test_dup_line_fracs(result):
    # DataTrove/NeMo-Curator semantics: repeats BEYOND the first count
    r1 = result[1]
    assert r1["dup_line_frac"] == pytest.approx(1 / 3)
    assert r1["dup_line_char_frac"] == pytest.approx(5 / 15)
    assert result[2]["dup_line_frac"] == pytest.approx(3 / 4)
    assert result[2]["dup_line_char_frac"] == pytest.approx(9 / 12)
    assert result[3]["dup_line_frac"] == 0.0
    assert result[5]["dup_line_frac"] == 0.0


def test_dup_line_published_threshold_transfers(spark):
    # two identical lines → 0.5, i.e. the Gopher 0.30 threshold flags a
    # doc that is half repeats, not a doc with ANY single repeated line
    df = spark.createDataFrame([(1, "same line\nsame line")],
                               "doc_id long, text string")
    row = repetition_stats(df).collect()[0]
    assert row["dup_line_frac"] == pytest.approx(0.5)


def test_top_ngram_coverage(result):
    # doc 4 normalized: "spark spark spark batch batch" (29 chars);
    # top 2-gram "spark spark" occurs 2x, len 11 -> 22/29
    assert result[4]["top2gram_char_frac"] == pytest.approx(
        round(2 * 11 / 29, 4))
    # doc 7: "t t t t t t t t" (15 chars), "t t" occurs 7x, len 3 -> 21/15
    # (overlapping occurrences can exceed 1; Gopher counts occurrences)
    assert result[7]["top2gram_char_frac"] == pytest.approx(
        round(7 * 3 / 15, 4))
    # doc 5 has no repeated 2-gram: every 2-gram occurs once, and the
    # documented tie-break picks the lexicographically greatest gram
    # ("two three", 9 chars of 27)
    assert result[5]["top2gram_char_frac"] == pytest.approx(
        round(1 * len("two three") / len("one two three four five six"), 4))
    assert result[6]["top2gram_char_frac"] == 0.0


def test_matches_duckdb_on_documents(spark):
    """Replay the n-gram coverage stats in DuckDB over the real documents
    fixture and compare every value (the same bar a catalog oracle row
    would apply)."""
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").repartition(8)
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    per_n = "\nUNION ALL\n".join(
        f"SELECT doc_id, length(t) AS chars, {n} AS n, "
        f"unnest(list_transform(generate_series(1, len(w) - {n} + 1), "
        f"  i -> array_to_string(w[i:i+{n}-1], ' '))) AS g "
        f"FROM toks WHERE len(w) >= {n}" for n in (2, 3, 4))
    sql = f"""
WITH norm AS (
  SELECT doc_id,
         regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
  FROM documents),
toks AS (SELECT doc_id, t, string_split(t, ' ') AS w FROM norm),
grams AS ({per_n}),
counted AS (
  SELECT doc_id, chars, n, g, count(*) AS cnt
  FROM grams GROUP BY ALL),
top AS (
  SELECT doc_id, n,
         round(cnt * length(g) / chars, 4) AS frac,
         row_number() OVER (PARTITION BY doc_id, n
                            ORDER BY cnt DESC, g DESC) AS rk
  FROM counted)
SELECT doc_id,
       max(CASE WHEN n = 2 THEN frac END) AS f2,
       max(CASE WHEN n = 3 THEN frac END) AS f3,
       max(CASE WHEN n = 4 THEN frac END) AS f4
FROM top WHERE rk = 1 GROUP BY doc_id
"""
    expect = {r[0]: r for r in con.execute(sql).fetchall()}
    assert set(expect) == set(got)
    for doc_id, (_, f2, f3, f4) in expect.items():
        assert got[doc_id]["top2gram_char_frac"] == pytest.approx(f2), doc_id
        assert got[doc_id]["top3gram_char_frac"] == pytest.approx(f3), doc_id
        assert got[doc_id]["top4gram_char_frac"] == pytest.approx(f4), doc_id


def test_dup_line_stats_match_duckdb(spark):
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").repartition(8)
    got = {r["doc_id"]: (r["dup_line_frac"], r["dup_line_char_frac"])
           for r in repetition_stats(docs).collect()}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{sf}/documents.parquet')")
    sql = """
WITH lines AS (
  SELECT doc_id, unnest(string_split(text, chr(10))) AS line
  FROM documents),
per_line AS (
  SELECT doc_id, line, count(*) AS cnt FROM lines GROUP BY ALL)
SELECT doc_id,
       sum(cnt - 1) / sum(cnt) AS dlf,
       sum(length(line) * (cnt - 1)) / nullif(sum(length(line) * cnt), 0)
           AS dlcf
FROM per_line GROUP BY doc_id
"""
    expect = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    assert set(expect) == set(got)
    for doc_id, (dlf, dlcf) in expect.items():
        assert got[doc_id][0] == pytest.approx(dlf), doc_id
        if dlcf is None:
            assert got[doc_id][1] is None, doc_id
        else:
            assert got[doc_id][1] == pytest.approx(dlcf), doc_id
