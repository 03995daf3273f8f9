"""Single-threaded reference crawler — the crawl-ordering oracle (D9).

The reference (spire-rs/kit) supplies the *semantic core* of a crawler —
which URLs may be fetched (robots.txt, exclusion/) and where new URLs come
from (sitemaps, inclusion/) — but not a scheduler.  BASELINE.json's north
rule requires the distributed engine to match "the reference's crawl
ordering and URL-seen set under the same seed list and politeness budget".
This module *is* that reference ordering: a deterministic, single-threaded
crawler built directly on the kit_py semantic kernels.  The Spark engine
(``kit_spark.crawl``) implements the identical contract with DataFrames and
must reproduce its output exactly (tests/test_crawl_e2e.py).

Scheduling contract (all ties broken by a total order — no wall clock, no
randomness):

* Round-based.  A URL enters the frontier once (URL-seen set, D2) with a
  priority (seeds 1.0, sitemap entries their <priority> else 0.5, discovered
  links 0.3).
* Per round, per host: delay = robots crawl_delay else default_delay;
  budget = max(1, floor(round_seconds / delay)) fetches (politeness, D4).
  Hosts whose robots gate (D5) denies a URL drop it (status 'denied'); it
  stays in the URL-seen set.
* Within a host, candidates rank by (-priority, url_canon); the top `budget`
  are scheduled this round, the rest stay pending (D3 priority queue).
* The round's schedule is ordered by (-priority, host_key, url_canon) and
  sequenced 0..n-1 (D9 determinism).
* Fetching a URL discovers its outgoing links (next round's candidates).
  Newly seen hosts contribute robots sitemaps, expanded depth<=1 (S9/D6)
  into candidates for the next round.
* Robots fetches are infrastructure and do not consume the politeness
  budget (one robots fetch per host, cached, S1-S4/RFC 9309 semantics).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from .robots import Robots
from .sitemaps import expand_sitemaps
from .urls import parse_url, url_host_key

PRIORITY_SEED = 1.0
PRIORITY_SITEMAP_DEFAULT = 0.5
PRIORITY_LINK = 0.3


@dataclass
class CrawlConfig:
    user_agent: str = "kitbot"
    round_seconds: float = 60.0
    default_delay: float = 10.0
    max_rounds: int = 50
    optimal: bool = True  # robots 'optimal' collapse feature


@dataclass
class SyntheticWeb:
    """A fully deterministic web: robots + sitemaps + link graph.

    ``robots`` maps host_key ('scheme://host:port') to (access_state, body
    bytes or None); ``sitemap_bodies`` maps canonical sitemap URL to body
    text; ``links`` maps canonical page URL to raw outgoing link strings.
    """

    robots: dict[str, tuple[str, Optional[bytes]]] = field(default_factory=dict)
    sitemap_bodies: dict[str, str] = field(default_factory=dict)
    links: dict[str, list[str]] = field(default_factory=dict)

    def fetch_robots(self, host_key: str) -> tuple[str, Optional[bytes]]:
        return self.robots.get(host_key, ("unavailable", None))

    def fetch_sitemap(self, url_canon: str) -> Optional[str]:
        return self.sitemap_bodies.get(url_canon)


@dataclass
class ScheduledFetch:
    round: int
    seq: int
    url_canon: str
    host_key: str
    priority: float


@dataclass
class CrawlResult:
    schedule: list[ScheduledFetch]
    url_seen: set[str]
    denied: set[str]
    robots_cache: dict[str, Robots]
    rounds: int


def crawl(seeds: list[str], web: SyntheticWeb, config: CrawlConfig) -> CrawlResult:
    seen: set[str] = set()
    denied: set[str] = set()
    robots_cache: dict[str, Robots] = {}
    schedule: list[ScheduledFetch] = []
    # pending frontier: url_canon -> (host_key, priority)
    pending: dict[str, tuple[str, float]] = {}

    def admit_batch(candidates: list[tuple[str, float]]) -> None:
        """Canonicalize, dedup within the batch by MAX priority (order-free,
        so the distributed groupBy-max reproduces it exactly), then admit
        anything not yet seen (D2)."""
        best: dict[str, float] = {}
        for raw_url, priority in candidates:
            parsed = parse_url(raw_url)
            if parsed is None or parsed.scheme not in ("http", "https"):
                continue
            canon = parsed.canonical()
            prev = best.get(canon)
            if prev is None or priority > prev:
                best[canon] = priority
        for canon, priority in best.items():
            if canon in seen:
                continue  # D2: each canonical URL scheduled at most once
            host = url_host_key(canon)
            if host is None:
                continue
            seen.add(canon)
            pending[canon] = (host, priority)

    admit_batch([(seed, PRIORITY_SEED) for seed in seeds])

    rounds = 0
    next_candidates: list[tuple[str, float]] = []
    while (pending or next_candidates) and rounds < config.max_rounds:
        admit_batch(next_candidates)
        next_candidates = []
        if not pending:
            break

        # --- robots resolution for new hosts (S1-S4, D5) --------------------
        new_hosts = sorted({h for (h, _) in pending.values()} - set(robots_cache))
        for host in new_hosts:
            access, body = web.fetch_robots(host)
            robots = Robots.from_access(access, body, config.user_agent,
                                        optimal=config.optimal)
            robots_cache[host] = robots
            if robots.sitemaps:
                entries, _ = expand_sitemaps(robots.sitemaps, web.fetch_sitemap)
                for entry in entries:
                    pri = entry["priority"]
                    next_candidates.append(
                        (entry["loc"],
                         PRIORITY_SITEMAP_DEFAULT if pri is None else pri)
                    )

        # --- robots gate (P9/P10 via compiled rulesets) ---------------------
        eligible: dict[str, tuple[str, float]] = {}
        for canon, (host, pri) in pending.items():
            parsed = parse_url(canon)
            if robots_cache[host].is_allowed(parsed.match_path()):
                eligible[canon] = (host, pri)
            else:
                denied.add(canon)
        pending = eligible

        # --- politeness + priority schedule (D3/D4) -------------------------
        by_host: dict[str, list[tuple[str, float]]] = {}
        for canon, (host, pri) in pending.items():
            by_host.setdefault(host, []).append((canon, pri))

        chosen: list[tuple[str, str, float]] = []
        for host, items in by_host.items():
            delay = robots_cache[host].crawl_delay
            if delay is None or delay <= 0:
                delay = config.default_delay
            budget = max(1, int(config.round_seconds // delay))
            items.sort(key=lambda item: (-item[1], item[0]))
            for canon, pri in items[:budget]:
                chosen.append((canon, host, pri))

        chosen.sort(key=lambda item: (-item[2], item[1], item[0]))
        for seq, (canon, host, pri) in enumerate(chosen):
            schedule.append(ScheduledFetch(rounds, seq, canon, host, pri))
            del pending[canon]
            for raw in web.links.get(canon, ()):  # D6: discovered links
                next_candidates.append((raw, PRIORITY_LINK))

        rounds += 1
        if not chosen and not next_candidates and pending:
            break  # every pending host is budget-starved? cannot happen (budget>=1)

    return CrawlResult(schedule=schedule, url_seen=seen, denied=denied,
                       robots_cache=robots_cache, rounds=rounds)
