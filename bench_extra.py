#!/usr/bin/env python
"""Optimization-round measurement harness (guide §1) — bench.py is FROZEN
for the driver's capture, so the per-query isolation work lives here.

Modes:

* ``time``  — run each named query (default: the 12 headline + 3
  production legs) through the noop sink N times in one warmed session
  and print per-query samples + min.  Same session config, warmup and
  methodology as bench.py's run_headline, so numbers are comparable.
* ``plans`` — write ``.explain('formatted')`` for each named query to
  ``--out/<name>_<suffix>.txt`` (the judge-facing plan evidence in
  plans/r06/).

Usage:
    python bench_extra.py time  [--repeats 3] [--names a,b,...]
    python bench_extra.py plans --out plans/r06 --suffix before
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

HEADLINE = [
    "q1_pricing_summary",
    "revenue_by_nation",
    "top3_customers_per_segment",
    "orders_running_window",
    "events_sessionize",
    "url_canonicalize",
    "politeness_schedule",
    "robots_gate",
    "docs_minhash_signature",
    "docs_lsh_pairs",
    "emb_cosine_topk",
    "frontier_round",
]
PRODUCTION = ["docs_minhash_production", "docs_lsh_pairs_production",
              "docs_pack_blocks_bench"]


def _production_df(spark, sf_dir: str, name: str, cores: int):
    """The three bench.py production legs, reproduced as DataFrames."""
    from kit_spark.functions import dedup as DD
    from kit_spark.functions.packing import pack_sequences

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .repartition(cores)
    if name == "docs_minhash_production":
        return DD.minhash_signatures(docs, k=8, n=3, method="xxhash64")
    if name == "docs_lsh_pairs_production":
        sig = DD.minhash_signatures(docs, k=8, n=3, method="xxhash64")
        return DD.lsh_candidate_pairs(sig, k=8, rows_per_band=2,
                                      max_bucket=100_000)
    if name == "docs_pack_blocks_bench":
        return pack_sequences(docs, 2048)
    raise KeyError(name)


def build_session(cores: int):
    from kit_spark.functions.canon import with_canon
    from kit_spark.session import get_spark

    spark = get_spark("kit_spark_bench_extra", cores=cores,
                      shuffle_partitions=max(cores, 8))
    spark.range(1000).selectExpr("sum(id)").collect()
    warm = spark.range(0, cores * 512, numPartitions=cores * 2).selectExpr(
        "concat('https://h', id % 64, '.example.com/i/', id) AS url")
    with_canon(warm, "url").count()
    return spark


def _build(spark, sf_dir: str, name: str, cores: int):
    from kit_spark import lifecycle
    from kit_spark.queries import QUERIES

    if name in QUERIES:
        return QUERIES[name](spark, sf_dir)
    lifecycle.release()
    return _production_df(spark, sf_dir, name, cores)


def ann_clustered_recall(spark, n: int = 2000, clusters: int = 20,
                         dims: int = 64, n_queries: int = 50) -> dict:
    """recall@10 of the approximate similarity paths on a corpus WITH
    cluster structure (planted Gaussian clusters, sigma 0.15 around unit
    Gaussian centers) — the complement of bench.py's near-iid worst-case
    corpus (VERDICT r5 #7): here neighbors are real, so the number
    measures the operator instead of the noise floor."""
    import numpy as np
    from pyspark.sql import functions as F

    from kit_spark.functions import similarity as SIM

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(clusters, dims))
    assign = rng.integers(0, clusters, size=n)
    vecs = centers[assign] + 0.15 * rng.normal(size=(n, dims))
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>")
    queries = emb.where(F.col("vec_id") < n_queries)
    exact = SIM.cosine_topk(emb, queries, k=10) \
        .select("query_id", "neighbor_id").cache()
    denom = exact.count()

    def recall(approx) -> float:
        hits = exact.join(approx.select("query_id", "neighbor_id"),
                          ["query_id", "neighbor_id"]).count()
        return round(hits / denom, 3)

    planes = SIM.adaptive_planes(n)
    ncells = SIM.adaptive_ncells(n)
    out = {
        "n_corpus": n, "clusters": clusters, "k": 10,
        "n_query_results": denom,
        f"lsh_adaptive_p{planes}": recall(
            SIM.ann_topk(emb, queries, k=10, planes=planes)),
        f"ivf_adaptive_c{ncells}_p8": recall(
            SIM.ivf_topk(emb, queries, k=10, n_cells=ncells, nprobe=8)),
        "note": ("planted-Gaussian-cluster corpus: structured complement "
                 "of bench.py's near-iid worst case"),
    }
    exact.unpersist()
    return out


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("mode", choices=["time", "plans", "ann"])
    parser.add_argument("--names", default=None,
                        help="comma-separated query names (default: headline"
                             " + production legs)")
    parser.add_argument("--repeats", type=int, default=3)
    parser.add_argument("--out", default="plans/r06")
    parser.add_argument("--suffix", default="before")
    args = parser.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 8
    names = (args.names.split(",") if args.names
             else HEADLINE + PRODUCTION)

    from kit_spark import lifecycle

    spark = build_session(cores)
    if args.mode == "ann":
        print(json.dumps({"ann_recall_clustered":
                          ann_clustered_recall(spark)}))
        spark.stop()
        return
    if args.mode == "plans":
        os.makedirs(args.out, exist_ok=True)
        for name in names:
            df = _build(spark, sf_dir, name, cores)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
            with open(path, "w") as fh:
                fh.write(buf.getvalue())
            print("wrote", path)
        lifecycle.release()
        spark.stop()
        return

    out: dict = {}
    for name in names:
        samples = []
        for i in range(args.repeats):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.perf_counter()
            _build(spark, sf_dir, name, cores) \
                .write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        out[name] = {"min": min(samples), "samples": samples}
        print(json.dumps({name: out[name]}), flush=True)
    lifecycle.release()
    total_min = sum(v["min"] for k, v in out.items() if k in HEADLINE)
    print(json.dumps({"headline_sum_of_mins": round(total_min, 3),
                      "queries": out, "sf_dir": sf_dir, "cores": cores}))
    spark.stop()


if __name__ == "__main__":
    main()
