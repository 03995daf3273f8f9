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
                id_col: str | None, with_pos: bool = False) -> DataFrame:
    """(id?, [pos, n,] gram) word n-grams of the normalized text.

    ``pos`` is the 0-based token offset of the gram's first word —
    carried only when ``with_pos`` so the audit variant can report the
    first offending gram without a second explode."""
    norm = norm_text(F.col(text_col))
    toks = F.split(norm, " ")
    grams = F.when(
        F.size(toks) >= n,
        F.expr(f"transform(sequence(0, size(__toks) - {n}), "
               f"  i -> concat_ws(' ', slice(__toks, i + 1, {n})))"),
    ).otherwise(F.array().cast("array<string>"))
    cols = [F.col(id_col)] if id_col else []
    out = (df.withColumn("__toks", toks)
           .select(*cols, grams.alias("__g")))
    if not with_pos:
        return out.select(*cols, F.explode("__g").alias("gram"))
    return (out.select(*cols, F.posexplode("__g").alias("pos", "gram"))
            .withColumn("n", F.lit(n)))


def _sizes(ns, n: int) -> list[int]:
    """Materialize the gram-size list once (``ns`` may be a one-shot
    iterator, and both the docs and benchmark sides consume it)."""
    sizes = list(ns) if ns is not None else [n]
    if not sizes:
        raise ValueError("ns must contain at least one gram size")
    return sizes


def _union_ns(df: DataFrame, sizes: list[int], text_col: str,
              id_col: str | None, with_pos: bool = False) -> DataFrame:
    """Union the gram generations for every n in ``sizes`` BEFORE any
    distinct — the multi-n sweep costs one shuffle, not len(sizes)."""
    out = None
    for n in sizes:
        g = _doc_ngrams(df, n, text_col, id_col, with_pos=with_pos)
        out = g if out is None else out.unionByName(g)
    return out


def contaminated_doc_ids(docs: DataFrame, benchmark: DataFrame,
                         n: int = 13, text_col: str = "text",
                         id_col: str = "doc_id",
                         bench_text_col: str = "text",
                         hash_grams: bool = True,
                         broadcast_benchmark: bool = False,
                         ns=None) -> DataFrame:
    """(doc_id) rows for every document sharing at least one word n-gram
    with the benchmark set.  Drop them with a left_anti join.

    ``ns`` (iterable of gram sizes, e.g. ``range(10, 14)``) sweeps
    several n in ONE job: gram generations are unioned before the
    distinct, so the sweep still costs a single shuffle.  When
    ``hash_grams`` (the scale default) the xxhash64 projection happens
    BEFORE the distinct, so the distinct shuffle moves 8-byte longs,
    never gram text — collisions there only merge grams, which can only
    over-flag (the conservative direction)."""
    sizes = _sizes(ns, n)
    doc_grams = _union_ns(docs, sizes, text_col, id_col)
    bench_grams = _union_ns(benchmark, sizes, bench_text_col, None)
    if hash_grams:
        doc_grams = doc_grams.select(id_col,
                                     F.xxhash64("gram").alias("gram"))
        bench_grams = bench_grams.select(F.xxhash64("gram").alias("gram"))
    doc_grams = doc_grams.distinct()
    bench_grams = bench_grams.distinct()
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    return (doc_grams.join(bench_grams, "gram", "left_semi")
            .select(id_col).distinct())


def contamination_stats(docs: DataFrame, benchmark: DataFrame,
                        n: int = 13, text_col: str = "text",
                        id_col: str = "doc_id",
                        bench_text_col: str = "text",
                        hash_grams: bool = True,
                        broadcast_benchmark: bool = False,
                        ns=None) -> DataFrame:
    """Per-contaminated-doc audit: ``(doc_id, n_matched_grams,
    first_gram_pos, first_gram_n, first_gram)``.

    Same scale shape as :func:`contaminated_doc_ids` — with
    ``hash_grams`` (the scale default) the shuffle carries
    ``(doc_id, pos, n, xxhash64)`` longs, never gram text; the first
    offending gram's TEXT is reconstructed afterwards by slicing the
    original document at the recorded (pos, n), so only one row per
    contaminated doc ever materializes a gram string.
    ``hash_grams=False`` is the exact-string mode (same escape hatch as
    :func:`contaminated_doc_ids`) for localizing a suspected hash
    collision — a phantom match that exact mode does not reproduce."""
    sizes = _sizes(ns, n)
    key = (lambda c: F.xxhash64(c)) if hash_grams else F.col
    doc_grams = _union_ns(docs, sizes, text_col, id_col, with_pos=True) \
        .select(id_col, "pos", "n", key("gram").alias("gram"))
    bench_grams = _union_ns(benchmark, sizes, bench_text_col, None) \
        .select(key("gram").alias("gram")).distinct()
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)
    matched = doc_grams.join(bench_grams, "gram", "left_semi")
    stats = matched.groupBy(id_col).agg(
        F.count_distinct("gram").alias("n_matched_grams"),
        F.min(F.struct("pos", "n")).alias("__first"))
    stats = stats.select(
        id_col, "n_matched_grams",
        F.col("__first.pos").alias("first_gram_pos"),
        F.col("__first.n").alias("first_gram_n"))
    # reconstruct the offending gram text from the source doc — an inner
    # join against the (small) contaminated set, then a direct slice
    toks = F.split(norm_text(F.col(text_col)), " ")
    return (docs.select(id_col, text_col).join(stats, id_col)
            .select(id_col, "n_matched_grams", "first_gram_pos",
                    "first_gram_n",
                    F.concat_ws(
                        " ",
                        F.slice(toks, F.col("first_gram_pos") + F.lit(1),
                                F.col("first_gram_n"))).alias("first_gram")))


def decontaminate(docs: DataFrame, benchmark: DataFrame, n: int = 13,
                  **kwargs) -> DataFrame:
    """The kept corpus: ``docs`` minus every contaminated document."""
    flagged = contaminated_doc_ids(docs, benchmark, n=n, **kwargs)
    id_col = kwargs.get("id_col", "doc_id")
    return docs.join(flagged, id_col, "left_anti")
