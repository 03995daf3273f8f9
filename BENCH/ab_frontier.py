#!/usr/bin/env python
"""Interleaved same-window A/B of the `frontier_round` catalog query
between two repo trees (r5 HEAD vs the r3 tree at e4d065b).

Motivation (VERDICT r4 "What's wrong" #2): frontier_round read ~4.7 s in
the judge's clean r3 window but ~7.2 s warm-best in every r4 window; the
one dataflow change on that path is the cumsum unification
(global_sequence -> functions/packing.global_excl_cumsum).  Both r4
readings came from congested windows, so regression vs window noise
could not be separated from the record.  This script settles it the way
the r2 spread A/B did: ALTERNATE the two trees in one session window
(A B A B ...), each leg a fresh subprocess Spark session with the same
warmup as bench.py, reporting cold + warm timings per leg.  Any window
drift hits both trees symmetrically; the paired per-iteration deltas are
the signal.

Usage:  python BENCH/ab_frontier.py [iters]   (default 4)
Writes: BENCH/frontier_ab_r5.json
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

LEG = r"""
import json, sys, time
sys.path.insert(0, {tree!r})
from kit_spark.queries import QUERIES
from kit_spark.session import get_spark
from kit_spark.functions.canon import with_canon

spark = get_spark("ab_frontier", cores=32, shuffle_partitions=32)
spark.range(1000).selectExpr("sum(id)").collect()
warm = spark.range(0, 32 * 512, numPartitions=64).selectExpr(
    "concat('https://h', id % 64, '.example.com/i/', id) AS url")
with_canon(warm, "url").count()
times = []
for _ in range(3):
    t0 = time.perf_counter()
    QUERIES["frontier_round"](spark, {sf!r}).write.format("noop") \
        .mode("overwrite").save()
    times.append(round(time.perf_counter() - t0, 3))
print(json.dumps({{"times": times}}))
spark.stop()
"""


def run_leg(tree: str, sf_dir: str) -> list[float]:
    proc = subprocess.run(
        [sys.executable, "-c", LEG.format(tree=tree, sf=sf_dir)],
        capture_output=True, text=True, cwd=tree, timeout=900)
    if proc.returncode != 0:
        raise RuntimeError(proc.stderr[-800:])
    return json.loads(proc.stdout.strip().splitlines()[-1])["times"]


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    r3 = os.environ.get("KIT_AB_R3_TREE", "/tmp/r3tree")
    legs = []
    for i in range(iters):
        t0 = time.perf_counter()
        a = run_leg(REPO, sf_dir)     # r5 HEAD
        b = run_leg(r3, sf_dir)       # r3 tree
        legs.append({"iter": i, "r5": a, "r3": b,
                     "r5_warm": min(a[1:]), "r3_warm": min(b[1:]),
                     "pair_wall": round(time.perf_counter() - t0, 1)})
        print(json.dumps(legs[-1]), flush=True)
    r5w = [p["r5_warm"] for p in legs]
    r3w = [p["r3_warm"] for p in legs]
    deltas = [round(a - b, 3) for a, b in zip(r5w, r3w)]
    out = {
        "query": "frontier_round", "sf_dir": sf_dir, "iters": iters,
        "design": "interleaved fresh-session pairs, warm = min of runs 2-3",
        "r5_warm_best": min(r5w), "r3_warm_best": min(r3w),
        "r5_warm_median": statistics.median(r5w),
        "r3_warm_median": statistics.median(r3w),
        "paired_deltas_r5_minus_r3": deltas,
        "median_delta": statistics.median(deltas),
        "legs": legs,
    }
    with open(os.path.join(HERE, "frontier_ab_r5.json"), "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
