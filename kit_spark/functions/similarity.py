"""Similarity search over embedding columns (embeddings table).

* Brute-force cosine top-k: the exactness baseline.  Queries are a *small*
  set broadcast against the full corpus; dot products run JVM-side via
  ``zip_with`` + ``aggregate`` (no Python), so the scan parallelizes over
  corpus partitions and the only shuffle is the final per-query top-k
  (window over query_id — bounded by k, never by corpus size).
* Random-hyperplane LSH bucketing: the scale path.  Hyperplane components
  are derived from md5 (portable to the DuckDB oracle), the 2^p buckets
  shard the corpus so queries only scan their own bucket (and neighbors if
  probing).  Embedding-cosine near-dup = same-bucket pairs above a
  threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def adaptive_planes(n_corpus: int) -> int:
    """Corpus-adaptive hyperplane count for :func:`ann_topk` — the
    module's own planes~log2(corpus) guidance as a formula: buckets of
    ~64 vectors (planes = floor(log2 n) - 6), clamped to [2, 26].

    Integer-exact on purpose: ``n.bit_length() - 1 == floor(log2 n)``
    matches DuckDB's ``length(bin(n)) - 1`` bit for bit, so the catalog
    oracle can derive the SAME value inside SQL with no float-boundary
    risk (the catalog's r3 fixed planes=8 read recall@10 = 0.08 on the
    2k-vector bench corpus vs 0.56 at the adaptive value 4)."""
    return max(2, min(26, n_corpus.bit_length() - 7))


def adaptive_ncells(n_corpus: int) -> int:
    """Corpus-adaptive IVF cell count: the standard n_cells ~ sqrt(N)
    sizing, integer-exact (``math.isqrt`` == DuckDB
    ``floor(sqrt(n::DOUBLE))`` — IEEE sqrt is correctly rounded, so
    perfect squares are exact on both sides), floored at 4."""
    import math

    return max(4, math.isqrt(n_corpus))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a, b):
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(query_id, neighbor_id, rank, cos) — exact top-k per query.

    ``queries`` must be small (broadcast side).  cos is rounded to 4
    decimals and ties break on neighbor_id so ranking is
    engine-independent.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).alias("cvec"))
    scored = (c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
              .withColumn("cos", F.round(
                  cosine(F.col("qvec").cast("array<double>"),
                         F.col("cvec").cast("array<double>")), 4)))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                          F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos"))


def hyperplane(plane: int, dims: int):
    """Deterministic pseudo-random +-1 hyperplane from md5 — the same
    construction is replayed in the oracle SQL."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dims - 1)),
        lambda d: F.when(
            F.substring(F.md5(F.concat(F.lit(f"{plane}:"),
                                       d.cast("string"))), 1, 1)
            .rlike("[0-7]"), F.lit(1.0)).otherwise(F.lit(-1.0)))


def lsh_buckets(vectors: DataFrame, planes: int = 8, dims: int = 64,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(vec_id, bucket): sign-bit concatenation over `planes` hyperplanes."""
    bucket = F.lit(0).cast("long")
    vec = F.col(vec_col).cast("array<double>")
    for p in range(planes):
        bit = F.when(_dot(vec, hyperplane(p, dims)) >= 0,
                     F.shiftleft(F.lit(1).cast("long"), p)).otherwise(0)
        bucket = bucket.bitwiseOR(bit)
    return vectors.select(F.col(id_col).alias("vec_id"),
                          bucket.alias("bucket"))


def ann_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             planes: int = 8, dims: int = 64, multiprobe: bool = True,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate nearest neighbors — the scale path next to the exact
    :func:`cosine_topk` baseline.

    The corpus is sharded into 2^planes hyperplane-LSH buckets; each query
    scans only its own bucket plus (``multiprobe``) the ``planes`` buckets
    at Hamming distance 1 — the standard multiprobe trick that recovers
    most neighbors lost to a single flipped sign bit while still touching
    ~(planes+1)/2^planes of the corpus.  At 10^10 vectors the per-query
    candidate set is corpus/2^planes * (planes+1) instead of the full
    corpus; ``planes`` scales with log2(corpus) exactly as for
    :func:`embedding_near_dup_pairs`.

    Exactness: candidates only — the cosine scoring and ranking on the
    candidate set are exact, so results match brute force whenever the
    true neighbor co-buckets (demonstrated per-query in the catalog's
    oracle entry, which replays the whole construction in DuckDB).
    """
    cb = lsh_buckets(corpus, planes, dims, id_col, vec_col)
    qb = (lsh_buckets(queries, planes, dims, id_col, vec_col)
          .withColumnRenamed("vec_id", "query_id")
          .withColumnRenamed("bucket", "qbucket"))
    probes = [F.col("qbucket")]
    if multiprobe:
        probes += [F.col("qbucket").bitwiseXOR(F.lit(1 << i).cast("long"))
                   for i in range(planes)]
    qprobe = qb.select("query_id", F.explode(F.array(*probes)).alias("bucket"))
    cand = (qprobe.join(cb, "bucket")
            .where(F.col("query_id") != F.col("vec_id"))
            .select("query_id", F.col("vec_id").alias("neighbor_id"))
            .distinct())
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    scored = (cand.join(F.broadcast(q), "query_id").join(c, "neighbor_id")
              .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 4)))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                          F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos"))


def ivf_centroids(corpus: DataFrame, n_cells: int = 16,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Deterministic coarse quantizer for the IVF index: the ``n_cells``
    corpus vectors with the smallest md5(vec_id) serve as cell centroids.

    md5-seeded selection is a portable stand-in for k-means (the operator
    shape downstream — assignment, probing, in-cell ranking — is identical
    whichever way centroids were trained), and it lets the DuckDB oracle
    replay the whole index build.  The selection is a distributed
    sort-limit (TakeOrderedAndProject), never a global single-partition
    window."""
    return (corpus
            .orderBy(F.md5(F.col(id_col).cast("string").cast("binary")),
                     F.col(id_col))
            .limit(n_cells)
            .select(F.col(id_col).alias("cell_id"),
                    F.col(vec_col).cast("array<double>").alias("centroid")))


def ivf_assign(vectors: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(vec_id, cell_id): nearest centroid by cosine (ties -> lowest cell).

    Centroids are broadcast (n_cells rows); the N x n_cells scoring is
    embarrassingly parallel over corpus partitions and the only shuffle is
    the per-vector argmax window, partitioned by vec_id."""
    scored = (vectors
              .select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).cast("array<double>").alias("v"))
              .join(F.broadcast(centroids))
              .withColumn("sim", F.round(cosine(F.col("v"),
                                                F.col("centroid")), 6)))
    w = W.partitionBy("vec_id").orderBy(F.col("sim").desc(),
                                        F.col("cell_id").asc())
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1).select("vec_id", "cell_id"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
             n_cells: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """IVF approximate nearest neighbors — the second scale path beside the
    hyperplane-LSH :func:`ann_topk` (coarse-quantizer sharding instead of
    sign-bit sharding, the FAISS IVF-flat architecture as dataflow).

    The corpus is inverted-listed into ``n_cells`` cells; each query scans
    only its ``nprobe`` nearest cells, so per-query candidate volume is
    ~corpus * nprobe / n_cells.  n_cells scales with sqrt(corpus) at the
    10^10 design point (the standard IVF sizing), and the per-cell
    inverted lists are exactly a partitioned table — cell_id is the
    natural bucketing/partition column at scale.  Scoring and ranking on
    the candidate set are exact."""
    cents = ivf_centroids(corpus, n_cells, id_col, vec_col)
    assign = ivf_assign(corpus, cents, id_col, vec_col)
    qscored = (queries
               .select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
               .join(F.broadcast(cents))
               .withColumn("sim", F.round(cosine(F.col("qv"),
                                                 F.col("centroid")), 6)))
    wq = W.partitionBy("query_id").orderBy(F.col("sim").desc(),
                                           F.col("cell_id").asc())
    qprobe = (qscored.withColumn("rn", F.row_number().over(wq))
              .where(F.col("rn") <= nprobe).select("query_id", "cell_id"))
    cand = (qprobe.join(assign, "cell_id")
            .where(F.col("query_id") != F.col("vec_id"))
            .select("query_id", F.col("vec_id").alias("neighbor_id")))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      F.col(vec_col).cast("array<double>").alias("cv"))
    scored = (cand.join(F.broadcast(q), "query_id").join(c, "neighbor_id")
              .withColumn("cos", F.round(cosine(F.col("qv"), F.col("cv")), 4)))
    w = W.partitionBy("query_id").orderBy(F.col("cos").desc(),
                                          F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank", "cos"))


def embedding_near_dup_pairs(vectors: DataFrame, threshold: float = 0.97,
                             planes: int = 8, dims: int = 64,
                             bands: int = 2, id_col: str = "vec_id",
                             vec_col: str = "embedding") -> DataFrame:
    """Embedding-cosine near-duplicates: LSH-bucket, verify cosine only
    within buckets (a<b), keep pairs above threshold.

    The sign bits are split into ``bands`` sub-tables and candidates match
    on ANY band (the standard LSH OR-construction): a near-dup pair only
    escapes if *every* band has a flipped plane, so recall rises
    exponentially with bands while candidate volume stays bucket-bounded.

    Shuffle shape: the band self-join and the candidate ``distinct`` carry
    only (band, val, id) — the float vectors never ride through the join
    shuffle and are never compared for equality; they are joined back onto
    the already-deduped (a, b) id pairs for the cosine verify.

    Sizing ``planes``: each band has 2^(planes/bands) buckets, so expected
    bucket size is corpus/2^(planes/bands) — planes must grow with
    log2(corpus) to keep in-bucket verification bounded (e.g. 10^10 vectors
    at <=1k per bucket needs ~24 planes per band).  The default 8/2 fits
    the sandbox corpus; production callers pass planes from config."""
    per_band = planes // bands
    bucket_cols = []
    vec = F.col(vec_col).cast("array<double>")
    for band in range(bands):
        bucket = F.lit(0).cast("long")
        for p in range(band * per_band, (band + 1) * per_band):
            bit = F.when(_dot(vec, hyperplane(p, dims)) >= 0,
                         F.shiftleft(F.lit(1).cast("long"),
                                     p - band * per_band)).otherwise(0)
            bucket = bucket.bitwiseOR(bit)
        bucket_cols.append(F.struct(F.lit(band).alias("band"),
                                    bucket.alias("val")))
    banded = (vectors.select(F.col(id_col),
                             F.explode(F.array(*bucket_cols)).alias("bk"))
              .select(id_col, "bk.band", "bk.val"))
    l = banded.select("band", "val", F.col(id_col).alias("a"))
    r = banded.select("band", "val", F.col(id_col).alias("b"))
    cand = (l.join(r, ["band", "val"]).where(F.col("a") < F.col("b"))
            .select("a", "b").distinct())
    va = vectors.select(F.col(id_col).alias("a"), vec.alias("va"))
    vb = vectors.select(F.col(id_col).alias("b"), vec.alias("vb"))
    return (cand.join(va, "a").join(vb, "b")
            .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 4))
            .where(F.col("cos") >= threshold)
            .select("a", "b", "cos"))
