#!/usr/bin/env python
"""Test the cache-carryover hypothesis for frontier_round's r3-vs-r5 warm
gap (BENCH/frontier_ab_r5.json): r3's global_sequence left `local` in a
bare never-released persist, so Spark's CacheManager substitutes it into
run 2+'s logically-equal plans — warm runs skip the whole upstream
(canon UDF, gate, politeness).  r5's lifecycle release removes exactly
that carryover.

Per tree: run1 (cold), run2 (warm, leak intact), then
spark.catalog.clearCache() + run3 (warm, caches gone).
Prediction if the hypothesis holds: r3 run3 >> r3 run2, while r5
run3 ~= run2 (its release already drops everything each entry).

Usage: python BENCH/probe_cache_leak.py
Writes: BENCH/cache_leak_probe_r5.json
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

LEG = r"""
import json, sys, time
sys.path.insert(0, {tree!r})
from kit_spark.queries import QUERIES
from kit_spark.session import get_spark
from kit_spark.functions.canon import with_canon

spark = get_spark("probe_cache", cores=32, shuffle_partitions=32)
spark.range(1000).selectExpr("sum(id)").collect()
warm = spark.range(0, 32 * 512, numPartitions=64).selectExpr(
    "concat('https://h', id % 64, '.example.com/i/', id) AS url")
with_canon(warm, "url").count()

def one():
    t0 = time.perf_counter()
    QUERIES["frontier_round"](spark, {sf!r}).write.format("noop") \
        .mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)

r1 = one()
r2 = one()
spark.catalog.clearCache()
r3_ = one()
n_cached = len([t for t in spark.sparkContext._jsc.sc().getRDDStorageInfo()])
print(json.dumps({{"cold": r1, "warm_leak": r2,
                   "warm_cleared": r3_, "rdds_cached_after": n_cached}}))
spark.stop()
"""


def run_leg(tree: str, sf_dir: str) -> dict:
    proc = subprocess.run(
        [sys.executable, "-c", LEG.format(tree=tree, sf=sf_dir)],
        capture_output=True, text=True, cwd=tree, timeout=900)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-800:])
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    r3 = os.environ.get("KIT_AB_R3_TREE", "/tmp/r3tree")
    out = {}
    for name, tree in (("r5", REPO), ("r3", r3), ("r5b", REPO), ("r3b", r3)):
        out[name] = run_leg(tree, sf_dir)
        print(name, json.dumps(out[name]), flush=True)
    with open(os.path.join(HERE, "cache_leak_probe_r5.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")


if __name__ == "__main__":
    main()
