"""The batch crawl-round driver (D2-D9) — DataFrame mirror of the oracle.

Each round is one dataflow over snapshot tables (sources/tables.py; Iceberg
on a real cluster), mirroring ``kit_py.crawler.crawl`` step for step so the
distributed schedule equals the single-threaded reference *exactly*
(tests/test_crawl_e2e.py asserts (round, seq, url_canon) equality and final
URL-seen set equality):

1. admit candidates: canonicalize (D1) -> batch-dedup by max priority ->
   left_anti vs url_seen (D2) with optional sharded-Bloom prefilter
2. resolve robots for new hosts (S1-S4 compile UDF), expand their sitemaps
   depth<=1 (S5-S9/D6) into next-round candidates
3. gate new frontier entries (D5: host-key join + first-match UDF);
   robots never change mid-crawl, so gating once at admission is
   equivalent to the oracle's per-round re-gate
4. politeness + priority schedule (D3/D4 two-phase salted top-k) and the
   deterministic global sequence (D9)
5. simulated fetch against the image table + per-row invariant (D7)
6. discovered links -> next-round candidates

Checkpoint/resume (D8): every table commits a new immutable snapshot per
round; ``driver_state`` — written last — maps each state table to the
snapshot the next round must read.  A crash mid-commit leaves orphan
snapshots but a consistent driver_state, so the round replays
deterministically and idempotently.  ``lineage`` records (round, table,
snapshot, rows) per commit; ``metrics`` aggregates per round (byte counts
via length(bytes) — the countio S15 analog).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

from kit_spark import lifecycle
from kit_spark.functions.bloom import build_bloom, merge_bloom
from kit_spark.functions.robots_udfs import (ROBOTS_CACHE_SCHEMA,
                                             gate_allowed,
                                             gate_allowed_relational,
                                             make_compile_udf)
from kit_spark.kit_py.crawler import PRIORITY_LINK, PRIORITY_SEED
from kit_spark.operators.fetch import fetch_and_verify
from kit_spark.operators.frontier import (admit_candidates,
                                          politeness_schedule,
                                          sequence_schedule)
from kit_spark.operators.sitemap_expand import expand_sitemaps_df
from kit_spark.sources.tables import SnapshotStore, bucketed_by_url

CANDIDATE_SCHEMA = "url string, priority double"
FRONTIER_SCHEMA = ("url_canon string, host_key string, match_path string, "
                   "priority double")
SEEN_SCHEMA = "url_canon string"
SCHEDULE_SCHEMA = ("round int, seq long, url_canon string, host_key string, "
                   "priority double")
FETCH_SCHEMA = ("round int, seq long, url_canon string, image_id string, "
                "fetch_ok boolean, psnr_db double, caption_ok boolean, "
                "fetched_bytes long")
METRICS_SCHEMA = ("round int, candidates_in long, admitted long, denied long, "
                  "hosts_new long, scheduled long, fetched_ok long, "
                  "fetch_failed long, bytes long")
LINEAGE_SCHEMA = "round int, table string, snapshot string, rows long"

STATE_TABLES = ("candidates", "frontier", "url_seen", "robots_cache",
                "schedule", "fetch_log", "metrics", "lineage",
                "url_seen_bloom")


@dataclass
class SparkCrawlConfig:
    user_agent: str = "kitbot"
    round_seconds: float = 60.0
    default_delay: float = 10.0
    max_rounds: int = 50
    optimal: bool = True
    relational_gate: bool = True  # zero-Python Catalyst gate (paths are
    # canonical in the driver, its contract); False = Arrow-UDF gate
    salt_buckets: int = 8
    skew_threshold: int = 500_000  # pending-per-host above which to salt
    seen_buckets: int = 16
    use_bloom: bool = False  # prefilter before the exact anti-join
    broadcast_fixture_tables: bool = True  # sandbox-size fixtures only


class CrawlDriver:
    """Round-loop driver over a SnapshotStore.

    ``robots_docs``: (host_key, access_state, body binary) —
    ``sitemap_docs``: (sitemap_url, body string) —
    ``links``: (src_url, dst_url) — ``images``: BASELINE.json:15 table.
    """

    def __init__(self, spark: SparkSession, store: SnapshotStore,
                 images: DataFrame, robots_docs: DataFrame,
                 sitemap_docs: DataFrame, links: DataFrame,
                 config: SparkCrawlConfig | None = None) -> None:
        self.spark = spark
        self.store = store
        self.images = images
        self.robots_docs = robots_docs
        self.sitemap_docs = sitemap_docs
        self.links = links
        self.config = config or SparkCrawlConfig()
        self._compile_udf = make_compile_udf(self.config.user_agent,
                                             self.config.optimal)
        self._snapshots: dict[str, str] = {}
        self._counts: dict[str, int] = {}

    # -- state helpers -------------------------------------------------------

    def _empty(self, schema) -> DataFrame:
        return self.spark.createDataFrame([], schema)

    def _read_state(self, name: str, schema) -> DataFrame:
        snap = self._snapshots.get(name)
        if snap is None:
            return self._empty(schema)
        return self.store.read(name, snap)

    def start(self, seeds: list[str]) -> None:
        """Initialize state from a seed list (fresh crawl)."""
        seed_df = self.spark.createDataFrame(
            [(s, PRIORITY_SEED) for s in seeds], CANDIDATE_SCHEMA)
        snap = self.store.write("candidates", seed_df)
        self._write_driver_state(0, {"candidates": snap},
                                 {"candidates": len(seeds)})

    def _write_driver_state(self, round_no: int, snapshots: dict,
                            counts: dict) -> None:
        rows = [(round_no, t, s, int(counts.get(t, -1)))
                for t, s in snapshots.items()]
        self.store.write("driver_state", self.spark.createDataFrame(
            rows or [(round_no, "__none__", "", -1)],
            "round int, table string, snapshot string, rows long"))

    def _load_driver_state(self) -> int:
        state = self.store.read_or_none("driver_state")
        if state is None:
            raise RuntimeError("no crawl state to resume; call start()")
        rows = state.collect()
        self._snapshots = {r["table"]: r["snapshot"] for r in rows
                           if r["table"] != "__none__"}
        # committed row counts ride along in driver_state, so a round
        # starts with ZERO Spark jobs spent on re-counting its inputs
        self._counts = {r["table"]: r["rows"] for r in rows
                        if r["table"] != "__none__"}
        return rows[0]["round"]

    def run(self, seeds: list[str] | None = None) -> dict:
        """Run rounds until the frontier drains or max_rounds; resumable
        from the last committed round after a crash/kill."""
        if seeds is not None and not self.store.exists("driver_state"):
            self.start(seeds)
        round_no = self._load_driver_state()
        while round_no < self.config.max_rounds:
            if not self._run_round(round_no):
                break
            round_no = self._load_driver_state()
        return {"rounds": round_no}

    # -- one round -----------------------------------------------------------

    def _run_round(self, round_no: int) -> bool:
        cfg = self.config
        lineage: list = []
        candidates = self._read_state("candidates", CANDIDATE_SCHEMA)
        frontier = self._read_state("frontier", FRONTIER_SCHEMA)
        url_seen = self._read_state("url_seen", SEEN_SCHEMA)
        robots_cache = self._read_state("robots_cache", ROBOTS_CACHE_SCHEMA)

        # committed counts from driver_state — no recount jobs
        n_candidates = max(self._counts.get("candidates", 0), 0)
        n_frontier = max(self._counts.get("frontier", 0), 0)
        n_seen_prev = max(self._counts.get("url_seen", 0), 0)
        n_robots_prev = max(self._counts.get("robots_cache", 0), 0)
        n_schedule_prev = max(self._counts.get("schedule", 0), 0)
        if n_candidates == 0 and n_frontier == 0:
            return False

        # 1. admission (D1/D2): canon + batch dedup + bloom-pruned anti-join
        bloom = (self._read_state("url_seen_bloom", None)
                 if cfg.use_bloom and "url_seen_bloom" in self._snapshots
                 else None)
        admitted = admit_candidates(candidates, url_seen, bloom_table=bloom,
                                    bloom_shards=cfg.seen_buckets).cache()

        # 2. robots for new hosts (S1-S4) + sitemap expansion (D6)
        new_hosts = (admitted.select("host_key").distinct()
                     .join(robots_cache.select("host_key"), "host_key",
                           "left_anti"))
        docs = (F.broadcast(self.robots_docs) if cfg.broadcast_fixture_tables
                else self.robots_docs)
        robots_new = (new_hosts.join(docs, "host_key", "left")
                      .withColumn("access_state",
                                  F.coalesce("access_state",
                                             F.lit("unavailable")))
                      .withColumn("__r", self._compile_udf(
                          F.col("access_state"), F.col("body")))
                      .select("host_key", "access_state",
                              F.col("__r.user_agent").alias("user_agent"),
                              F.col("__r.always").alias("always"),
                              F.col("__r.rules").alias("rules"),
                              F.col("__r.crawl_delay").alias("crawl_delay"),
                              F.col("__r.sitemaps").alias("sitemaps"))
                      ).cache()
        robots_cache = robots_cache.unionByName(robots_new)

        sitemap_cand = expand_sitemaps_df(
            robots_new,
            F.broadcast(self.sitemap_docs) if cfg.broadcast_fixture_tables
            else self.sitemap_docs,
        ).select("url", "priority")

        # 3. gate the newly admitted entries (D5)
        gate = (gate_allowed_relational if cfg.relational_gate
                else gate_allowed)
        gated = gate(admitted.join(
            robots_cache.select("host_key", "always", "rules"),
            "host_key", "left"))
        allowed = gated.where(F.col("allowed")).select(
            "url_canon", "host_key", "match_path", "priority")

        pending = frontier.unionByName(allowed).persist()

        # 4. schedule (D3/D4/D9)
        delays = robots_cache.select("host_key", "crawl_delay")
        with_delay = pending.join(delays, "host_key", "left")
        selected = politeness_schedule(with_delay, cfg.round_seconds,
                                       cfg.default_delay, cfg.salt_buckets,
                                       skew_threshold=cfg.skew_threshold)
        schedule_rows = sequence_schedule(selected).select(
            F.lit(round_no).alias("round"), F.col("seq"),
            "url_canon", "host_key", "priority").cache()

        # 5. fetch + verify (D7)
        fetch_log = fetch_and_verify(
            schedule_rows, self.images,
            broadcast_images=cfg.broadcast_fixture_tables)

        # 6. discovered links -> next candidates
        links = (F.broadcast(self.links) if cfg.broadcast_fixture_tables
                 else self.links)
        link_cand = (schedule_rows
                     .join(links, schedule_rows.url_canon == links.src_url)
                     .select(F.col("dst_url").alias("url"),
                             F.lit(PRIORITY_LINK).alias("priority")))
        next_candidates = sitemap_cand.unionByName(link_cand)

        # -- commit snapshots (D8): all tables, then driver_state last ------
        # Every commit is exactly ONE Spark job: the row count (and any
        # extra metrics) ride along as an Observation on the write itself.
        # Monotonically growing tables commit as APPEND deltas (snapshot =
        # this round's rows + parent pointer): per-round write cost is
        # O(delta), not O(total) — a full rewrite per round would dominate
        # the round at the 10^10-row design point.  `counts` tracks chain
        # totals so driver_state keeps whole-table row counts.
        snaps: dict[str, str] = {}
        counts: dict[str, int] = {}
        extra_metrics: dict[str, dict] = {}

        def commit(name: str, df: DataFrame, extra: list | None = None,
                   delta: bool = False, meta: dict | None = None) -> int:
            obs = Observation()
            observed = df.observe(obs, F.count(F.lit(1)).alias("rows"),
                                  *(extra or []))
            if delta:
                # chain from the PINNED snapshot (what driver_state says is
                # committed), never the pointer: replaying a torn round must
                # bypass the orphan delta the crash left behind
                snaps[name] = self.store.append(
                    name, observed, meta=meta,
                    parent=self._snapshots.get(name))
            else:
                snaps[name] = self.store.write(name, observed, meta=meta)
            got = obs.get
            n = int(got["rows"])
            counts[name] = n + (self._counts.get(name, 0) if delta else 0)
            extra_metrics[name] = got
            lineage.append((round_no, name, snaps[name], counts[name]))
            return n

        # wave 0: the schedule commit alone — it materializes the cached
        # schedule_rows/pending/admitted chain every other commit reads
        n_scheduled = commit("schedule", schedule_rows, delta=True)

        # wave 1: the remaining per-round table commits are mutually
        # independent Spark jobs over warm caches; submit them from
        # threads so their stage-scheduling latencies overlap instead of
        # adding up — this fixed cost, not compute, dominated small rounds
        wave1 = [
            ("url_seen", dict(df=bucketed_by_url(
                admitted.select("url_canon"), cfg.seen_buckets),
                delta=True)),
            ("robots_cache", dict(df=robots_new, delta=True)),
            ("frontier", dict(df=pending.join(
                schedule_rows.select("url_canon"), "url_canon",
                "left_anti"))),
            ("candidates", dict(df=next_candidates)),
            ("fetch_log", dict(df=fetch_log.select(
                "round", "seq", "url_canon", "image_id", "fetch_ok",
                "psnr_db", "caption_ok", "fetched_bytes"),
                extra=[
                    F.sum(F.when(F.col("fetch_ok"), 1).otherwise(0))
                    .alias("ok"),
                    F.sum(F.when(~F.col("fetch_ok"), 1).otherwise(0))
                    .alias("bad"),
                    F.sum("fetched_bytes").alias("bytes"),
                ], delta=True)),
        ]
        with ThreadPoolExecutor(max_workers=len(wave1)) as pool:
            futures = [pool.submit(commit, name, **kw) for name, kw in wave1]
            results = [f.result() for f in futures]
        n_admitted = results[0]
        n_hosts_new = results[1]
        # |pending| = n_frontier + n_allowed and frontier' = pending - sched
        n_allowed = counts["frontier"] + n_scheduled - n_frontier
        n_denied = n_admitted - n_allowed

        if cfg.use_bloom:
            # rebuild at 2x only when the seen set outgrew the capacity
            # (scalable-Bloom amortization); otherwise merge the delta —
            # never re-hash the whole seen set every round
            prev_snap = self._snapshots.get("url_seen_bloom")
            prev_cap = int(self.store.meta("url_seen_bloom", prev_snap)
                           .get("capacity", 0)) if prev_snap else 0
            if prev_snap and counts["url_seen"] <= prev_cap:
                bloom_df = merge_bloom(
                    self.store.read("url_seen_bloom", prev_snap),
                    admitted.select("url_canon"), prev_cap,
                    shards=cfg.seen_buckets)
                cap = prev_cap
            else:
                cap = max(2 * counts["url_seen"], 1 << 14)
                bloom_df = build_bloom(
                    self.store.read("url_seen", snaps["url_seen"]),
                    shards=cfg.seen_buckets, capacity=cap)
            commit("url_seen_bloom", bloom_df, meta={"capacity": cap})
        fetched = extra_metrics["fetch_log"]
        metrics_row = [(round_no, n_candidates, n_admitted, n_denied,
                        n_hosts_new, n_scheduled,
                        int(fetched["ok"] or 0), int(fetched["bad"] or 0),
                        int(fetched["bytes"] or 0))]
        commit("metrics", self.spark.createDataFrame(metrics_row,
                                                     METRICS_SCHEMA),
               delta=True)
        lineage.sort()  # wave-1 threads append in completion order
        commit("lineage", self.spark.createDataFrame(lineage,
                                                     LINEAGE_SCHEMA),
               delta=True)
        self._write_driver_state(round_no + 1, snaps, counts)

        admitted.unpersist()
        pending.unpersist()
        robots_new.unpersist()
        schedule_rows.unpersist()
        # caches operators registered on the shared lifecycle this round
        # (global_sequence's ranked partials) die with the round too
        lifecycle.release()
        return bool(n_scheduled or n_admitted or counts["candidates"])

    # -- result accessors ----------------------------------------------------

    def schedule_df(self) -> DataFrame:
        self._load_driver_state()
        return self._read_state("schedule", SCHEDULE_SCHEMA)

    def table(self, name: str) -> DataFrame:
        self._load_driver_state()
        if name not in self._snapshots:
            raise KeyError(f"no committed snapshot for table {name!r}")
        return self.store.read(name, self._snapshots[name])
