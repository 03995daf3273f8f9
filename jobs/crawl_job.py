#!/usr/bin/env python
"""spark-submit entry point for the crawl engine (BASELINE.json launch mode).

    spark-submit --py-files kit_spark.zip jobs/crawl_job.py \
        --workdir /tmp/crawl_run --seed-count 240 --max-rounds 10

Runs a full checkpoint/resumable crawl over a deterministic synthetic web
(no external data): synthesizes the image+caption table distributedly,
builds the robots/sitemap/link fixtures, then drives crawl rounds.  Re-run
with the same --workdir to resume after a kill.  ``python jobs/crawl_job.py``
works too (builds its own local session and ships the package itself).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--workdir", required=True,
                        help="snapshot-store root (resume by reusing it)")
    parser.add_argument("--seed-count", type=int, default=240,
                        help="synthetic web size (total pages)")
    parser.add_argument("--hosts", type=int, default=8)
    parser.add_argument("--max-rounds", type=int, default=20)
    parser.add_argument("--round-seconds", type=float, default=60.0)
    parser.add_argument("--default-delay", type=float, default=10.0)
    parser.add_argument("--use-bloom", action="store_true")
    parser.add_argument("--cores", type=int, default=None)
    args = parser.parse_args()

    from kit_spark.crawl import CrawlDriver, SparkCrawlConfig
    from kit_spark.functions.images import IMAGES_SCHEMA
    from kit_spark.pyfiles import ensure_shipped
    from kit_spark.session import get_spark
    from kit_spark.sources.synth import synth_web
    from kit_spark.sources.tables import snapshot_store

    spark = get_spark("kit_spark_crawl", cores=args.cores)
    ensure_shipped(spark)

    fx = synth_web(seed=42, n_hosts=args.hosts, total_pages=args.seed_count)
    cols = [f.name for f in IMAGES_SCHEMA.fields]
    images = spark.createDataFrame(
        [tuple(r[c] for c in cols) for r in fx.image_rows()], IMAGES_SCHEMA)
    robots_docs = spark.createDataFrame(
        [(h, a, b) for h, (a, b) in fx.web.robots.items()],
        "host_key string, access_state string, body binary")
    sitemap_docs = spark.createDataFrame(
        list(fx.web.sitemap_bodies.items()) or [("", "")],
        "sitemap_url string, body string")
    links = spark.createDataFrame(
        [(s, d) for s, ds in fx.web.links.items() for d in ds] or [("", "")],
        "src_url string, dst_url string")

    config = SparkCrawlConfig(round_seconds=args.round_seconds,
                              default_delay=args.default_delay,
                              max_rounds=args.max_rounds,
                              use_bloom=args.use_bloom)
    store = snapshot_store(spark, args.workdir)  # Iceberg when jar present
    driver = CrawlDriver(spark, store, images, robots_docs, sitemap_docs,
                         links, config)
    result = driver.run(seeds=fx.seeds)

    schedule = driver.schedule_df()
    metrics = driver.table("metrics").orderBy("round").collect()
    summary = {
        "rounds": result["rounds"],
        "scheduled_total": schedule.count(),
        "url_seen": driver.table("url_seen").count(),
        "per_round": [
            {k: row[k] for k in ("round", "candidates_in", "admitted",
                                 "denied", "scheduled", "fetched_ok",
                                 "fetch_failed", "bytes")}
            for row in metrics
        ],
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
