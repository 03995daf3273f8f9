"""C4-style line-level cleaning and PII redaction for the documents table.

Two more standard curation passes, both pure Catalyst (array lambdas +
regexp over the text column — no explode, no shuffle, no Python), so at
100 TB they run entirely inside whole-stage codegen on the scan:

* ``c4_line_filter`` — the line/page heuristics of C4 (Raffel et al.
  2020, JMLR 21(140), §2.2): keep only lines that end in terminal
  punctuation and have >= ``min_words`` words, drop lines mentioning
  javascript, then drop whole pages that are left with fewer than
  ``min_sentences`` sentences, contain a curly brace, the phrase "lorem
  ipsum", or any caller-supplied blocklist word.  (C4 used the public
  "List of Dirty, Naughty, Obscene..." blocklist; pass it in — the repo
  ships no word list.)
* ``redact_pii`` — masks emails, IPv4 addresses, and phone numbers with
  ``|||EMAIL|||``-style placeholder tokens (the Dolma convention) and
  reports per-category match counts for audit.  Patterns are
  intentionally conservative (RE2-compatible, no lookaround) so the
  DuckDB oracle replays them verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# terminal punctuation per C4: period, exclamation, question, end quote
_EOL_RE = r'[.!?"]\s*$'
_SENTENCE_RE = r"[.!?]"

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(\d{1,3}\.)(\d{1,3}\.)(\d{1,3}\.)\d{1,3}\b"
PHONE_RE = r"(\+\d{1,3}[-. ])?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"

EMAIL_TOKEN = "|||EMAIL|||"
IP_TOKEN = "|||IP|||"
PHONE_TOKEN = "|||PHONE|||"


def _keep_line(line: Column, min_words: int) -> Column:
    t = F.trim(line)
    return (t.rlike(_EOL_RE)
            & (F.size(F.split(t, r"\s+")) >= min_words)
            & ~F.lower(t).contains("javascript"))


def c4_line_filter(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", min_words: int = 5,
                   min_sentences: int = 3,
                   blocklist: list | None = None,
                   out_col: str = "text_clean") -> DataFrame:
    """Apply C4's line filters, reassemble the page, then apply C4's
    page filters; pages that fail are dropped from the result.

    Returns (id, ``out_col``, n_lines, n_kept_lines, n_sentences).
    Sentence count is the terminal-punctuation occurrence count of the
    cleaned page — the cheap proxy for C4's sentence splitter (the
    filter only needs a >= threshold, not exact sentence bounds).

    Per Raffel et al. §2.2 the page-level content gates (curly brace,
    "lorem ipsum", blocklist) evaluate the ORIGINAL page, not the
    line-filtered remainder — a page whose disqualifying content sits
    only on lines the line filter removed is still dropped.
    Only the sentence-count gate reads the cleaned page (it counts what
    the page is left with).

    Everything is array/regexp Catalyst expressions over the row: zero
    exchanges — the whole pass pipelines on the parquet scan, and at
    cluster scale the dropped pages never reach downstream shuffles.
    """
    lines = F.split(F.col(text_col), "\n")
    kept = F.filter(lines, lambda l: _keep_line(l, min_words))
    cleaned = F.concat_ws("\n", kept)
    n_sent = F.regexp_count(F.col(out_col), F.lit(_SENTENCE_RE))
    low = F.col("__low_orig")
    page_ok = ((F.col("n_sentences") >= min_sentences)
               & ~low.contains("{") & ~low.contains("}")
               & ~low.contains("lorem ipsum"))
    for w in (blocklist or []):
        page_ok = page_ok & ~low.contains(w.lower())
    return (docs.select(F.col(id_col).alias("doc_id"),
                        cleaned.alias(out_col),
                        F.size(lines).alias("n_lines"),
                        F.size(kept).alias("n_kept_lines"),
                        F.lower(F.col(text_col)).alias("__low_orig"))
            .withColumn("n_sentences", n_sent)
            .where(page_ok)
            .drop("__low_orig"))


def redact_pii(docs: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               out_col: str = "text_redacted") -> DataFrame:
    """Mask emails, IPv4s, and NANP-style phone numbers with placeholder
    tokens; emit per-category counts so redaction rates are auditable.

    Order matters and is fixed: emails first (an address can embed
    digit runs), then IPs, then phones — each pattern runs over the
    previous stage's output, and each COUNT is measured on that same
    staged input, so a span a prior pattern already masked can never be
    counted again under a later category (e.g. the digit run inside a
    masked email never reports a phantom phone).  Counts therefore sum
    to the number of replacements actually performed.
    """
    after_email = F.regexp_replace(F.col(text_col), EMAIL_RE, EMAIL_TOKEN)
    after_ip = F.regexp_replace(after_email, IPV4_RE, IP_TOKEN)
    red = F.regexp_replace(after_ip, PHONE_RE, PHONE_TOKEN)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        red.alias(out_col),
        F.regexp_count(F.col(text_col), F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(after_email, F.lit(IPV4_RE)).alias("n_ips"),
        F.regexp_count(after_ip, F.lit(PHONE_RE)).alias("n_phones"))
