"""Partitioned cuckoo filter — the URL-seen fast path's second variant (D2).

Same sharding/probing shape as functions/bloom.py, different filter: a
(bucket, 4-slot, 16-bit-fingerprint) cuckoo table per shard.  Compared to
the Bloom shards it supports *deletion* (recrawl invalidation: un-seeing a
URL when its robots/sitemap entry expires) and slightly better lookup
locality; like the Bloom, it only PRUNES — `might_contain == false` is
definitive, positives go through the exact anti-join (SURVEY.md §7.4
risk 5: the fingerprint is not the full key, so exactness still requires
the join).

Construction: standard partial-key cuckoo hashing (Fan et al., CoNLL'14 —
public algorithm): i1 = H(x), i2 = i1 xor H(fp(x)); insertion evicts along
the xor-path with a bounded kick limit.  Hashing reuses the pandas SipHash
+ splitmix64 mix from the Bloom module so both filters are build-once
probe-anywhere across executors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from kit_spark.functions.bloom import _hash1, _hash2, make_shard_udf

CUCKOO_SCHEMA = T.StructType([
    T.StructField("shard", T.IntegerType(), False),
    T.StructField("n_buckets", T.LongType(), False),
    T.StructField("table", T.BinaryType(), False),  # n_buckets x 4 uint16
    T.StructField("n_inserted", T.LongType(), False),
    T.StructField("n_failed", T.LongType(), False),
])

_SLOTS = 4
_MAX_KICKS = 200


def _fingerprints(values: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """(fp uint16 nonzero, bucket-index hash uint64)."""
    h1 = _hash1(values)
    fp = ((h1 >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.uint16)
    fp = np.where(fp == 0, np.uint16(1), fp)  # 0 marks an empty slot
    return fp, h1


def _alt_bucket(idx: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    mix = _hash2(fp.astype(np.uint64))
    return (idx ^ (mix % np.uint64(n_buckets))) % np.uint64(n_buckets)


def build_cuckoo(urls: DataFrame, url_col: str = "url_canon",
                 shards: int = 16, load_factor: float = 0.84,
                 min_buckets: int = 1 << 12) -> DataFrame:
    """Build the sharded cuckoo table from a seen-URL DataFrame."""
    shard_udf = make_shard_udf(shards)
    sharded = urls.select(F.col(url_col).alias("u"),
                          shard_udf(F.col(url_col)).alias("shard"))
    counts = {r["shard"]: r["n"]
              for r in sharded.groupBy("shard").agg(F.count("*").alias("n"))
              .collect()}

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(pdf["shard"].iloc[0])
        n = max(counts.get(shard, 1), 1)
        n_buckets = max(min_buckets,
                        1 << int(np.ceil(np.log2(n / (_SLOTS * load_factor)
                                                 + 1))))
        table = np.zeros((n_buckets, _SLOTS), dtype=np.uint16)
        fp, h1 = _fingerprints(pdf["u"])
        idx = (h1 % np.uint64(n_buckets)).astype(np.uint64)
        rng_state = np.uint64(0x9E3779B97F4A7C15)
        failed = 0
        for k in range(len(fp)):
            f, i = fp[k], idx[k]
            placed = False
            for _kick in range(_MAX_KICKS):
                row = table[int(i)]
                free = np.nonzero(row == 0)[0]
                if len(free):
                    row[free[0]] = f
                    placed = True
                    break
                alt = _alt_bucket(np.array([i], dtype=np.uint64),
                                  np.array([f], dtype=np.uint16),
                                  n_buckets)[0]
                if not np.any(table[int(alt)] == 0) and _kick == 0:
                    pass  # fall through to eviction below
                row2 = table[int(alt)]
                free2 = np.nonzero(row2 == 0)[0]
                if len(free2):
                    row2[free2[0]] = f
                    placed = True
                    break
                # evict a deterministic slot from the alt bucket
                rng_state = (rng_state * np.uint64(6364136223846793005)
                             + np.uint64(1442695040888963407))
                slot = int(rng_state >> np.uint64(61)) % _SLOTS
                f, row2[slot] = row2[slot], f
                i = alt
            if not placed:
                failed += 1  # caller treats the filter as lossy-insert:
                # a failed insert means might_contain can yield a false
                # negative for that key, so build() must be sized to keep
                # failed == 0 (asserted in tests; load factor 0.84)
        return pd.DataFrame({
            "shard": [shard], "n_buckets": [n_buckets],
            "table": [table.tobytes()], "n_inserted": [len(fp) - failed],
            "n_failed": [failed],
        })

    return sharded.groupBy("shard").applyInPandas(build, CUCKOO_SCHEMA)


def cuckoo_might_contain(candidates: DataFrame, cuckoo_table: DataFrame,
                         url_col: str = "url_canon",
                         shards: int = 16) -> DataFrame:
    """Append boolean ``might_be_seen``; False is definitive iff the build
    reported n_failed == 0 for every shard."""
    shard_udf = make_shard_udf(shards)
    with_shard = candidates.withColumn("shard", shard_udf(F.col(url_col)))
    joined = with_shard.join(F.broadcast(cuckoo_table), "shard", "left")

    @F.pandas_udf(T.BooleanType())
    def probe(urls: pd.Series, n_buckets: pd.Series,
              table: pd.Series) -> pd.Series:
        out = np.ones(len(urls), dtype=bool)
        frame = pd.DataFrame({"u": urls, "nb": n_buckets, "t": table})
        missing = frame["t"].isna()
        out[missing.to_numpy()] = False
        for t_bytes, group in frame[~missing].groupby("t", sort=False):
            nb = int(group["nb"].iloc[0])
            table_arr = np.frombuffer(t_bytes, dtype=np.uint16) \
                .reshape(nb, _SLOTS)
            fp, h1 = _fingerprints(group["u"])
            i1 = (h1 % np.uint64(nb)).astype(np.uint64)
            i2 = _alt_bucket(i1, fp, nb)
            hit = (table_arr[i1.astype(np.int64)] == fp[:, None]).any(axis=1)
            hit |= (table_arr[i2.astype(np.int64)] == fp[:, None]).any(axis=1)
            out[frame.index.get_indexer(group.index)] = hit
        return pd.Series(out)

    return (joined.withColumn("might_be_seen",
                              probe(F.col(url_col), F.col("n_buckets"),
                                    F.col("table")))
            .drop("shard", "n_buckets", "table", "n_inserted", "n_failed"))
