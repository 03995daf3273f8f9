"""Benchmark decontamination — flag training documents that overlap an
evaluation set by shared word n-grams.

The standard leakage check for training-data curation (the GPT-3 paper,
Brown et al. 2020 App. C, used 13-gram overlap; Llama and The Pile used
the same construction with n in 10..13): a document is contaminated if
any of its word n-grams also appears in any benchmark document.

Spark-first shape (10^10-doc corpus vs a ~10^6-doc benchmark suite):

* Both sides shingle with the SAME normalization (``text.norm_text``) so
  membership is exact string equality on the n-gram.
* Benchmark n-grams are DISTINCT'd first — the membership test needs the
  set, not multiplicities — then the corpus side is a **left_semi join**
  on the hashed n-gram: only (doc_id, gram_hash) pairs shuffle, never
  text, and the semi join short-circuits per key.  A ~10^6-doc benchmark
  yields ~10^8-10^9 distinct grams — too big to broadcast reliably, so
  the default is a shuffle semi join on the 8-byte hash; pass
  ``broadcast_benchmark=True`` when the benchmark side is known small.
* ``xxhash64(gram)`` carries the join (8 bytes/row instead of ~80-char
  strings).  Hash collisions can only create false *positives* (a clean
  doc flagged), never false negatives — the conservative direction for
  decontamination; exact-string mode (``hash_grams=False``) exists for
  verification and for the DuckDB-replayed tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from kit_spark.functions.text import norm_text


def _doc_ngrams(df: DataFrame, n: int, text_col: str,
                id_col: str | None) -> DataFrame:
    """(id?, gram) word n-grams of the normalized text, one row each."""
    norm = norm_text(F.col(text_col))
    toks = F.split(norm, " ")
    grams = F.when(
        F.size(toks) >= n,
        F.expr(f"transform(sequence(0, size(__toks) - {n}), "
               f"  i -> concat_ws(' ', slice(__toks, i + 1, {n})))"),
    ).otherwise(F.array().cast("array<string>"))
    cols = [F.col(id_col)] if id_col else []
    return (df.withColumn("__toks", toks)
            .select(*cols, grams.alias("__g"))
            .select(*cols, F.explode("__g").alias("gram")))


def contaminated_doc_ids(docs: DataFrame, benchmark: DataFrame,
                         n: int = 13, text_col: str = "text",
                         id_col: str = "doc_id",
                         bench_text_col: str = "text",
                         hash_grams: bool = True,
                         broadcast_benchmark: bool = False) -> DataFrame:
    """(doc_id) rows for every document sharing at least one word n-gram
    with the benchmark set.  Drop them with a left_anti join."""
    doc_grams = _doc_ngrams(docs, n, text_col, id_col).distinct()
    bench_grams = _doc_ngrams(benchmark, n, bench_text_col, None).distinct()
    if hash_grams:
        doc_grams = doc_grams.select(id_col,
                                     F.xxhash64("gram").alias("gram"))
        bench_grams = bench_grams.select(F.xxhash64("gram").alias("gram"))
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    return (doc_grams.join(bench_grams, "gram", "left_semi")
            .select(id_col).distinct())


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 13,
                  **kwargs) -> DataFrame:
    """The kept corpus: ``docs`` minus every contaminated document."""
    flagged = contaminated_doc_ids(docs, benchmark, n=n, **kwargs)
    id_col = kwargs.get("id_col", "doc_id")
    return docs.join(flagged, id_col, "left_anti")
