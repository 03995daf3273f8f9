"""C4 line/page cleaning + PII redaction: crafted cases and DuckDB replay."""

import duckdb
import pytest

from kit_spark import plans
from kit_spark.functions.cleaning import (
    EMAIL_RE, EMAIL_TOKEN, IP_TOKEN, IPV4_RE, PHONE_RE, PHONE_TOKEN,
    c4_line_filter, redact_pii)

NL = "\n"
SF = "/root/testdata/sf0.001"

C4_DOCS = [
    # keeps 3 sentence-ending lines of >= 5 words: survives
    (1, "This is a fine sentence one." + NL
        + "short line." + NL                       # < 5 words: dropped
        + "Another good long sentence right here!" + NL
        + "no terminal punctuation on this line" + NL  # dropped
        + "And a third full sentence to finish?"),
    # javascript line dropped; page left with 1 sentence: page dropped
    (2, "Please enable JavaScript to continue viewing." + NL
        + "Only one real sentence is left here."),
    # curly brace: page dropped even though lines pass
    (3, "A perfectly good sentence sits here." + NL
        + "But the page has { a brace } in one sentence." + NL
        + "And yet another complete sentence too."),
    # lorem ipsum: page dropped
    (4, "Lorem ipsum dolor sit amet something consectetur." + NL
        + "Second full sentence of filler text here." + NL
        + "Third full sentence of filler text here."),
    # blocklist word: page dropped when the list is passed
    (5, "This page mentions a blockedword in passing today." + NL
        + "It otherwise has plenty of good sentences." + NL
        + "Three of them in fact, all quite long."),
    # brace only on a line the LINE filter drops: the page gate reads the
    # ORIGINAL page (C4 §2.2), so the page is still dropped
    (6, "A perfectly good first sentence sits here." + NL
        + "function(){return}" + NL                 # dropped line w/ brace
        + "Another good long sentence right here!" + NL
        + "And a third full sentence to finish?"),
]


def _clean(spark, blocklist=None):
    docs = spark.createDataFrame(C4_DOCS, "doc_id long, text string")
    return {r["doc_id"]: r for r in
            c4_line_filter(docs, blocklist=blocklist).collect()}


def test_c4_rules(spark):
    out = _clean(spark)
    # 2: too few sentences, 3: brace, 4: lorem, 6: brace on a dropped
    # line (page gates read the ORIGINAL page)
    assert set(out) == {1, 5}
    r1 = out[1]
    assert r1["n_lines"] == 5 and r1["n_kept_lines"] == 3
    assert "short line." not in r1["text_clean"]
    assert "no terminal punctuation" not in r1["text_clean"]
    assert r1["n_sentences"] == 3
    assert 2 not in out and 4 not in out


def test_c4_blocklist(spark):
    assert 5 in _clean(spark)
    assert 5 not in _clean(spark, blocklist=["BlockedWord"])


def test_c4_matches_duckdb(spark):
    crafted = spark.createDataFrame(C4_DOCS, "doc_id long, text string")
    base = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text")
    docs = base.union(crafted.selectExpr("doc_id + 10000 AS doc_id", "text"))
    got = {r["doc_id"]: (r["text_clean"], r["n_lines"], r["n_kept_lines"],
                         r["n_sentences"])
           for r in c4_line_filter(docs).collect()}

    import pandas as pd

    con = duckdb.connect()
    con.register("crafted", pd.DataFrame(
        [(i + 10000, t) for i, t in C4_DOCS], columns=["doc_id", "text"]))
    con.execute(f"CREATE VIEW docs2 AS SELECT doc_id, text FROM "
                f"read_parquet('{SF}/documents.parquet') "
                f"UNION ALL SELECT * FROM crafted")
    sql = r"""
WITH lines AS (
  SELECT doc_id, i AS pos, parts[i] AS line, len(parts) AS n_lines
  FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM docs2),
       LATERAL unnest(generate_series(1, len(parts))) AS t(i)
),
kept AS (
  SELECT * FROM lines
  WHERE regexp_matches(trim(line), '[.!?"]\s*$')
    AND len(string_split_regex(trim(line), '\s+')) >= 5
    AND NOT contains(lower(trim(line)), 'javascript')),
pages AS (
  SELECT doc_id, any_value(n_lines) AS n_lines,
         string_agg(line, chr(10) ORDER BY pos) AS text_clean,
         count(*) AS n_kept_lines
  FROM kept GROUP BY doc_id),
scored AS (
  SELECT *, len(regexp_extract_all(text_clean, '[.!?]')) AS n_sentences
  FROM pages)
SELECT s.doc_id, s.text_clean, s.n_lines, s.n_kept_lines, s.n_sentences
FROM scored s JOIN docs2 d ON d.doc_id = s.doc_id
WHERE s.n_sentences >= 3
  AND NOT contains(lower(d.text), '{')
  AND NOT contains(lower(d.text), '}')
  AND NOT contains(lower(d.text), 'lorem ipsum')
"""
    expect = {r[0]: (r[1], r[2], r[3], r[4])
              for r in con.execute(sql).fetchall()}
    assert got == expect
    assert 10001 in got  # the crafted survivor came through both engines


PII_DOCS = [
    (1, "mail bob.smith+x@example.co.uk and 10.0.0.1 plus +1-555-123-4567"),
    (2, "call 555-123-4567 or (nothing)"),
    (3, "no pii at all in this one"),
]


def test_redact_pii(spark):
    docs = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    out = {r["doc_id"]: r for r in redact_pii(docs).collect()}
    r1 = out[1]
    assert EMAIL_TOKEN in r1["text_redacted"]
    assert IP_TOKEN in r1["text_redacted"]
    assert PHONE_TOKEN in r1["text_redacted"]
    assert "example.co.uk" not in r1["text_redacted"]
    assert (r1["n_emails"], r1["n_ips"], r1["n_phones"]) == (1, 1, 1)
    assert out[2]["n_phones"] == 1
    assert PHONE_TOKEN in out[2]["text_redacted"]
    assert out[3]["text_redacted"] == PII_DOCS[2][1]
    assert (out[3]["n_emails"], out[3]["n_ips"], out[3]["n_phones"]) \
        == (0, 0, 0)


def test_redact_pii_matches_duckdb(spark):
    docs = spark.createDataFrame(PII_DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["text_redacted"], r["n_emails"], r["n_ips"],
                         r["n_phones"])
           for r in redact_pii(docs).collect()}
    import pandas as pd

    con = duckdb.connect()
    con.register("docs2", pd.DataFrame(PII_DOCS, columns=["doc_id", "text"]))
    sql = f"""
WITH staged AS (
  SELECT doc_id, text,
         regexp_replace(text, '{EMAIL_RE}', '{EMAIL_TOKEN}', 'g')
             AS after_email
  FROM docs2
), staged2 AS (
  SELECT *, regexp_replace(after_email, '{IPV4_RE}', '{IP_TOKEN}', 'g')
             AS after_ip
  FROM staged
)
SELECT doc_id,
       regexp_replace(after_ip, '{PHONE_RE}', '{PHONE_TOKEN}', 'g') AS red,
       len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(after_email, '{IPV4_RE}')) AS n_ips,
       len(regexp_extract_all(after_ip, '{PHONE_RE}')) AS n_phones
FROM staged2"""
    expect = {r[0]: (r[1], r[2], r[3], r[4])
              for r in con.execute(sql).fetchall()}
    assert got == expect


def test_cleaning_plans_have_no_exchange(spark):
    docs = spark.createDataFrame(C4_DOCS, "doc_id long, text string")
    assert "Exchange" not in plans.formatted_plan(c4_line_filter(docs))
    assert "Exchange" not in plans.formatted_plan(redact_pii(docs))
    assert "EvalPython" not in plans.formatted_plan(c4_line_filter(docs))


def test_redact_pii_counts_are_staged(spark):
    """A span masked by an earlier category is never re-counted by a
    later one: a phone-shaped email local part reports one email and
    ZERO phones (the phone was never redacted — it no longer exists by
    the time the phone pass runs)."""
    docs = spark.createDataFrame(
        [(1, "reach me: 555-123-4567@corp.com")], "doc_id long, text string")
    r = redact_pii(docs).collect()[0]
    assert r["n_emails"] == 1
    assert r["n_phones"] == 0
    assert EMAIL_TOKEN in r["text_redacted"]
    assert PHONE_TOKEN not in r["text_redacted"]
