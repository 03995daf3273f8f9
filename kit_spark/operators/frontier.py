"""Frontier dataflow operators: admission/dedup (D2), priority (D3),
politeness (D4), deterministic sequencing (D9).

Scale notes (the design point is a 10^10-row frontier on a 1000-executor
cluster; sandbox tests only shrink the data, not the plan shape):

* Admission dedups with ``groupBy(url_canon).max(priority)`` (map-side
  partial agg) followed by a **left_anti** join against ``url_seen`` —
  both shuffle on ``url_canon``, and url_seen is written bucketed by
  ``xxhash64(url_canon)`` so the anti-join co-locates (see
  sources/tables.py).  A Bloom prefilter (functions/bloom.py) prunes the
  anti-join probe side; exactness always comes from the anti-join.
* Politeness is a per-host top-k.  A naive window over ``host_key`` puts a
  mega-host (10^8 URLs, Zipf head) in one task; we use the standard
  two-phase exact top-k: rank within (host, salt) — S-way parallel —
  keep local rank <= budget, then re-rank the <= S*budget survivors per
  host.  Result is exactly the global per-host top-budget by the total
  order (-priority, url_canon).
* The round's global sequence avoids the single-partition window: range
  repartition on the order key, local row_number per partition, plus
  per-partition offsets (a tiny driver-side cumulative sum) — a global
  sort's plan shape, linearly scalable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from kit_spark.functions.canon import with_canon


def admit_candidates(candidates: DataFrame, url_seen: DataFrame | None,
                     url_col: str = "url", priority_col: str = "priority",
                     bloom_table: DataFrame | None = None,
                     bloom_shards: int = 16) -> DataFrame:
    """Canonicalize raw candidates, dedup within the batch by max priority,
    drop anything already seen.  Returns (url_canon, host_key, match_path,
    priority) — the oracle's ``admit_batch`` (crawler.py) exactly.

    With ``bloom_table`` (functions/bloom.py, built over *canonical* URLs),
    rows the Bloom filter clears skip the anti-join probe entirely — only
    'maybe-seen' rows shuffle into the exact left_anti join, so probe
    volume drops to (true dups + false positives).
    """
    canon = with_canon(candidates, url_col)
    canon = canon.where(F.col("url_canon").isNotNull())
    deduped = (canon.groupBy("url_canon")
               .agg(F.max(priority_col).alias("priority"),
                    F.first("host_key").alias("host_key"),
                    F.first("match_path").alias("match_path")))
    if url_seen is None:
        return deduped
    if bloom_table is not None:
        from kit_spark.functions.bloom import might_contain

        probed = might_contain(deduped, bloom_table, url_col="url_canon",
                               shards=bloom_shards)
        fresh = probed.where(~F.col("might_be_seen")).drop("might_be_seen")
        maybe = (probed.where(F.col("might_be_seen")).drop("might_be_seen")
                 .join(url_seen.select("url_canon"), "url_canon", "left_anti"))
        return fresh.unionByName(maybe)
    return deduped.join(url_seen.select("url_canon"), "url_canon", "left_anti")


def politeness_schedule(pending: DataFrame, round_seconds: float,
                        default_delay: float, salt_buckets: int = 8) -> DataFrame:
    """D3+D4: exact per-host top-`budget` selection by (-priority, url_canon).

    Expects columns: url_canon, host_key, priority, crawl_delay (nullable,
    from the robots cache).  Returns the selected rows with ``host_rank``.
    budget = max(1, floor(round_seconds / delay)) — delay <= 0 or null
    falls back to default_delay (oracle contract).
    """
    delay = F.when(F.col("crawl_delay").isNull() | (F.col("crawl_delay") <= 0),
                   F.lit(default_delay)).otherwise(F.col("crawl_delay"))
    with_budget = pending.withColumn(
        "host_budget",
        F.greatest(F.lit(1), F.floor(F.lit(round_seconds) / delay)))

    order = [F.col("priority").desc(), F.col("url_canon").asc()]
    # phase A: S-way parallel pre-top-k within (host, salt)
    salted = with_budget.withColumn(
        "salt", F.pmod(F.xxhash64("url_canon"), F.lit(salt_buckets)))
    w_salt = W.partitionBy("host_key", "salt").orderBy(*order)
    survivors = (salted.withColumn("salt_rank", F.row_number().over(w_salt))
                 .where(F.col("salt_rank") <= F.col("host_budget"))
                 .drop("salt", "salt_rank"))
    # phase B: exact rank over the <= S*budget survivors per host
    w_host = W.partitionBy("host_key").orderBy(*order)
    return (survivors.withColumn("host_rank", F.row_number().over(w_host))
            .where(F.col("host_rank") <= F.col("host_budget"))
            .drop("host_budget"))


def global_sequence(df: DataFrame, order_cols: list, seq_col: str = "seq",
                    partitions: int | None = None) -> DataFrame:
    """Scalable deterministic 0-based sequence by a total order.

    Range-repartitions on the order key, ranks locally per partition, and
    adds driver-computed partition offsets (#partitions values — tiny) —
    no single-partition window at any scale.
    """
    spark = df.sparkSession
    if partitions is None:
        partitions = max(2, spark.sparkContext.defaultParallelism)
    ranged = (df.repartitionByRange(partitions, *order_cols)
              .withColumn("__pid", F.spark_partition_id()))
    local_w = W.partitionBy("__pid").orderBy(*order_cols)
    local = ranged.withColumn("__local", F.row_number().over(local_w))
    counts = {row["__pid"]: row["n"] for row in
              local.groupBy("__pid").agg(F.count("*").alias("n")).collect()}
    offsets, running = {}, 0
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]
    offset_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "__pid int, __off long")
    return (local.join(F.broadcast(offset_df), "__pid")
            .withColumn(seq_col, (F.col("__off") + F.col("__local") - 1)
                        .cast("long"))
            .drop("__pid", "__local", "__off"))


def sequence_schedule(selected: DataFrame) -> DataFrame:
    """D9: the round's emission order — seq over (-priority, host_key,
    url_canon), the oracle's exact sort key."""
    return global_sequence(
        selected,
        [F.col("priority").desc(), F.col("host_key").asc(),
         F.col("url_canon").asc()],
    )
