"""Text-analysis operators for training-data pipelines (documents table).

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen) — no Python UDFs: token counting, quality scoring,
language-ID scoring and document fingerprinting compile to Catalyst
expressions, so they pushdown/prune/codegen like any other column work and
scale to 100 TB of text without leaving the JVM.

Every operator here has a DuckDB-oracle twin in ``__spark_entry__`` —
deliberately expressed with portable ANSI constructs so the driver's
correctness gate can replay it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# whitespace-collapsed, lowercased text — the normalization every text op
# shares (exact-dedup key, fingerprints, token stats)
def norm_text(col) -> Column:
    return F.regexp_replace(F.trim(F.lower(col)), r"\s+", " ")


def token_count(col) -> Column:
    """Whitespace tokenization; BPE-ish subword proxy is cheap_token_count."""
    return F.size(F.split(F.trim(col), r"\s+"))


def cheap_token_count(col) -> Column:
    """BPE-ish token-count estimate without a tokenizer model: words +
    punctuation runs + ceil(chars/4) blend — the standard serving-side
    heuristic; deterministic and JVM-only."""
    words = token_count(col)
    puncts = F.size(F.split(col, r"[\.,;:!\?]")) - F.lit(1)
    return F.greatest(words + puncts, F.ceil(F.length(col) / F.lit(4)).cast("int"))


# GPT-2-flavoured pre-tokenizer pattern (simplified, ASCII): contraction
# suffixes, letter runs, short digit runs, single non-space symbols — the
# shape real BPE pre-tokenization splits on.  Deliberately portable
# between Java regex (Spark regexp_count) and RE2 (DuckDB
# regexp_extract_all): alternation order and greedy bounded quantifiers
# behave identically for this pattern under both engines' leftmost-first
# matching.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]{1,3}|[^A-Za-z0-9\s]"


def regex_token_count(col) -> Column:
    """True regex tokenizer count (BPE pre-tokenization granularity) —
    one JVM regexp_count, no UDF, no model."""
    return F.regexp_count(col, F.lit(BPE_TOKEN_RE)).cast("long")


def quality_score(col) -> Column:
    """Length/punctuation/diversity quality heuristic in [0,1] (rounded to 4
    decimals for oracle-stable comparison)."""
    n_chars = F.length(col)
    n_tokens = token_count(col)
    avg_word = n_chars / F.greatest(n_tokens, F.lit(1))
    len_score = F.least(n_chars / F.lit(400.0), F.lit(1.0))
    word_score = F.when((avg_word >= 3) & (avg_word <= 10), F.lit(1.0)) \
        .otherwise(F.lit(0.5))
    alpha_ratio = (F.length(F.regexp_replace(col, r"[^A-Za-z ]", "")) /
                   F.greatest(n_chars, F.lit(1)))
    return F.round((len_score * 0.4 + word_score * 0.3 + alpha_ratio * 0.3), 4)


LANG_MARKERS = {
    "en": (" the ", " and "),
    "fr": (" le ", " et "),
    "de": (" der ", " und "),
    "es": (" el ", " los "),
    "zh": (" de ", " shi "),
}


def _occurrences(col, marker: str) -> Column:
    return ((F.length(col) - F.length(F.replace(col, F.lit(marker), F.lit(""))))
            / F.lit(len(marker))).cast("int")


def lang_scores(col) -> dict[str, Column]:
    """Marker-word occurrence votes per language (n-gram-heuristic stand-in;
    SQL-portable so the oracle can replay the exact same arithmetic)."""
    padded = F.concat(F.lit(" "), norm_text(col), F.lit(" "))
    return {lang: sum((_occurrences(padded, m) for m in markers), F.lit(0))
            for lang, markers in LANG_MARKERS.items()}


def lang_guess(col) -> Column:
    """argmax of lang_scores; earlier language (lexicographic) wins ties —
    the oracle SQL replays the identical chained-CASE arithmetic."""
    scores = lang_scores(col)
    langs = sorted(scores)
    expr = F.lit(langs[0])
    best_score = scores[langs[0]]
    for lang in langs[1:]:
        is_better = scores[lang] > best_score
        expr = F.when(is_better, F.lit(lang)).otherwise(expr)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return expr


def fingerprint64(col) -> Column:
    """64-bit-ish stable document fingerprint: first 15 hex digits of the
    md5 of normalized text, as bigint (positive, < 2^60).  md5 is identical
    across Spark/DuckDB, making the fingerprint oracle-checkable."""
    return F.conv(F.substring(F.md5(norm_text(col)), 1, 15), 16, 10) \
        .cast("bigint")


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    col = F.col(text_col)
    return (df
            .withColumn("n_tokens", token_count(col))
            .withColumn("n_tokens_bpeish", cheap_token_count(col))
            .withColumn("quality", quality_score(col))
            .withColumn("lang_guess", lang_guess(col))
            .withColumn("fingerprint", fingerprint64(col)))
