"""Deduplication operators for training-data pipelines (documents table).

Four families, all expressed shuffle-consciously:

* **exact** — hash-groupBy on the normalized text (one shuffle; map-side
  partial agg folds duplicates before the exchange).
* **MinHash + LSH** — shingle -> per-shingle md5 -> per-doc min over k
  salted hashes (the lexicographic min of md5 hex *is* a valid min-hash
  under the md5 permutation, and is portable to the DuckDB oracle) ->
  band -> bucket self-join on band only (never all-pairs).
* **SimHash** — per-token 64-bit hash, bitwise majority vote folded with
  JVM-side bitwise aggregates (no UDF).
* **n-gram Jaccard** — exact verification on *candidate pairs only*
  (token-level inverted-index join), the standard verify stage after LSH.

At 100 TB the only all-to-all operations are groupBys on
normalized-text/band/token keys — never a cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import norm_text

# --- exact -------------------------------------------------------------------


def exact_dedup_groups(docs: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Groups of byte-identical (after normalization) documents:
    (keep_id = min doc_id, n_dups)."""
    return (docs.groupBy(norm_text(F.col(text_col)).alias("norm"))
            .agg(F.min(id_col).alias("keep_id"),
                 F.count("*").alias("n_dups"))
            .where(F.col("n_dups") > 1)
            .select("keep_id", "n_dups"))


# --- shingles / minhash ------------------------------------------------------


def shingles(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             n: int = 3) -> DataFrame:
    """Word n-gram shingles, exploded: (doc_id, shingle).  Pure Catalyst:
    split -> sequence -> transform(slice) -> explode."""
    words = F.split(norm_text(F.col(text_col)), " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
    )
    return docs.select(F.col(id_col).alias("doc_id"),
                       F.explode(sh).alias("shingle"))


def minhash_signatures(docs: DataFrame, k: int = 8, n: int = 3,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(doc_id, h0..h{k-1}) — h_i = min(md5(shingle || '#i')) as hex string.

    The min over a cryptographic-hash permutation is the classic MinHash
    estimator; using the hex string keeps it engine-portable (same md5,
    same lexicographic order everywhere).
    """
    sh = shingles(docs, id_col, text_col, n)
    aggs = [F.min(F.md5(F.concat(F.col("shingle"), F.lit(f"#{i}"))))
            .alias(f"h{i}") for i in range(k)]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(signatures: DataFrame, k: int = 8,
                        rows_per_band: int = 2) -> DataFrame:
    """Band the signature (band_j = md5 of its rows' concat) and self-join on
    (band_index, band_value): only same-bucket docs ever meet (a, b, a<b)."""
    n_bands = k // rows_per_band
    bands = F.array(*[
        F.struct(
            F.lit(j).alias("band"),
            F.md5(F.concat_ws("|", *[F.col(f"h{j * rows_per_band + r}")
                                     for r in range(rows_per_band)]))
            .alias("val"))
        for j in range(n_bands)
    ])
    exploded = (signatures.select("doc_id", F.explode(bands).alias("b"))
                .select("doc_id", F.col("b.band").alias("band"),
                        F.col("b.val").alias("val")))
    left = exploded.alias("l")
    right = exploded.alias("r")
    return (left.join(right, ["band", "val"])
            .where(F.col("l.doc_id") < F.col("r.doc_id"))
            .select(F.col("l.doc_id").alias("a"),
                    F.col("r.doc_id").alias("b"))
            .distinct())


# --- simhash -----------------------------------------------------------------


def simhash64(docs: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """64-bit SimHash per document with JVM-side bit-vote aggregation:
    explode tokens -> xxhash64 -> per-bit +-1 votes summed -> sign bits."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(norm_text(F.col(text_col)), " ")).alias("tok"))
    hashed = toks.withColumn("h", F.xxhash64("tok"))
    votes = [F.sum(F.when(F.shiftright(F.col("h"), bit).bitwiseAND(F.lit(1))
                          == 1, 1).otherwise(-1)).alias(f"v{bit}")
             for bit in range(64)]
    voted = hashed.groupBy("doc_id").agg(*votes)
    sim = None
    for bit in range(64):
        term = F.when(F.col(f"v{bit}") > 0,
                      F.shiftleft(F.lit(1).cast("long"), bit)).otherwise(0)
        sim = term if sim is None else sim.bitwiseOR(term)
    return voted.select("doc_id", sim.alias("simhash"))


def simhash_near_pairs(sim: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs by SimHash: block on 4 x 16-bit sub-bands (a pair
    within Hamming distance 3 shares at least one exact 16-bit band), then
    verify the true distance with bit_count — never all-pairs."""
    banded = sim.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band"),
                     F.shiftright("simhash", i * 16)
                     .bitwiseAND(F.lit(0xFFFF)).alias("val"))
            for i in range(4)])).alias("b")) \
        .select("doc_id", "simhash", "b.band", "b.val")
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (l.join(r, ["band", "val"])
             .where(F.col("l.doc_id") < F.col("r.doc_id"))
             .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"),
                     F.bit_count(F.col("l.simhash").bitwiseXOR(
                         F.col("r.simhash"))).alias("hamming"))
             .distinct())
    return pairs.where(F.col("hamming") <= max_hamming)


# --- n-gram jaccard verify ---------------------------------------------------


def ngram_jaccard_pairs(docs: DataFrame, pairs: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        n: int = 3) -> DataFrame:
    """Exact Jaccard over n-gram shingle sets for given candidate (a, b)
    pairs: inverted-index join on the shingle, |A ∩ B| by count, Jaccard by
    inclusion-exclusion — no per-row set objects, no UDF."""
    sh = shingles(docs, id_col, text_col, n).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a_sh = sh.withColumnRenamed("doc_id", "a")
    b_sh = sh.withColumnRenamed("doc_id", "b")
    inter = (pairs.join(a_sh, "a").join(b_sh, ["b", "shingle"])
             .groupBy("a", "b").agg(F.count("*").alias("n_common")))
    return (inter
            .join(sizes.withColumnRenamed("doc_id", "a")
                  .withColumnRenamed("n_sh", "na"), "a")
            .join(sizes.withColumnRenamed("doc_id", "b")
                  .withColumnRenamed("n_sh", "nb"), "b")
            .select("a", "b",
                    F.round(F.col("n_common") /
                            (F.col("na") + F.col("nb") - F.col("n_common")), 4)
                    .alias("jaccard")))
