#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line for the driver.

Headline queries run at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS]; the frontier-throughput job and the N-vs-4N
core scaling proxy (BASELINE.md) run as subprocesses with their own
sessions (a JVM cannot change its master).

Output: {"metric": ..., "value": total_sec, "unit": "sec",
         "queries": {name: sec, ...}, "sf": ...,
         "frontier": {...}, "scaling": {...}}

Env knobs: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
KIT_BENCH_SCALING=0 to skip the two-size scaling runs,
KIT_BENCH_SCALE_URLS to resize the frontier job (default 1,500,000).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
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


def run_headline(sf_dir: str, cores: int) -> dict:
    from kit_spark.queries import QUERIES
    from kit_spark.session import get_spark

    spark = get_spark("kit_spark_bench", cores=cores,
                      shuffle_partitions=max(cores, 8))
    # warm the session + python workers once so per-query times are job time
    spark.range(1000).selectExpr("sum(id)").collect()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
    spark.stop()
    return timings


def run_scaling(n_urls: int, cores_hi: int, runs: int = 2,
                mode: str = "round") -> dict | None:
    """Best-of-`runs` per core count (minimum elapsed = least host
    interference; this sandbox shares a noisy hypervisor)."""
    cores_lo = max(2, cores_hi // 4)
    results = {}
    for cores in (cores_lo, cores_hi):
        best = None
        # pin the process tree to exactly `cores` CPUs: local[N] alone lets
        # JVM GC/shuffle/python workers spill onto the remaining CPUs, which
        # would flatter the small-"cluster" number and understate scaling
        pin = ([ "taskset", "-c", f"0-{cores - 1}" ]
               if shutil.which("taskset") else [])
        for _ in range(runs):
            proc = subprocess.run(
                pin + [sys.executable, "-m", "kit_spark.bench_scaling",
                       str(cores), str(n_urls), mode],
                capture_output=True, text=True, cwd=REPO, timeout=900)
            if proc.returncode != 0:
                return {"error": proc.stderr.strip()[-400:]}
            out = json.loads(proc.stdout.strip().splitlines()[-1])
            if best is None or out["elapsed_sec"] < best["elapsed_sec"]:
                best = out
        results[cores] = best
    lo, hi = results[cores_lo], results[cores_hi]
    ratio = hi["urls_per_sec"] / lo["urls_per_sec"]
    ideal = cores_hi / cores_lo
    return {
        "cores_n": cores_lo, "cores_4n": cores_hi, "n_urls": n_urls,
        "throughput_n": lo["urls_per_sec"], "throughput_4n": hi["urls_per_sec"],
        "elapsed_n": lo["elapsed_sec"], "elapsed_4n": hi["elapsed_sec"],
        "speedup": round(ratio, 3),
        "efficiency": round(ratio / ideal, 3),
        "method": ("best-of-%d per core count, CPU-pinned process trees, "
                   "same input (strong scaling)") % runs,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 8
    sf = sf_dir.rstrip("/").split("sf")[-1]

    t_total = time.perf_counter()
    timings = run_headline(sf_dir, cores)

    result = {
        "metric": ("headline query wall-clock at sf%s; frontier throughput "
                   "and N-vs-4N-core scaling in 'frontier'/'scaling'" % sf),
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cores": cores,
    }

    if os.environ.get("KIT_BENCH_SCALING", "1") != "0":
        n_urls = int(os.environ.get("KIT_BENCH_SCALE_URLS", "400000"))
        scaling = run_scaling(n_urls, cores)
        if scaling and "error" not in scaling:
            result["frontier"] = {
                "n_urls": scaling["n_urls"],
                "urls_per_sec": scaling["throughput_4n"],
            }
        result["scaling"] = scaling
        # compute-only control: per-executor compute scaling with no
        # per-round fixed costs (the asymptotic large-round efficiency)
        result["scaling_compute"] = run_scaling(
            max(50_000, n_urls // 3), cores, runs=1, mode="compute")
    result["total_wall_sec"] = round(time.perf_counter() - t_total, 1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
