"""Invariant tests for the single-threaded oracle crawler (D9 contract)."""

import math

from kit_spark.kit_py.crawler import CrawlConfig, crawl
from kit_spark.kit_py.urls import parse_url
from kit_spark.sources.synth import synth_web


def run(seed=42, **kw):
    fx = synth_web(seed=seed)
    cfg = CrawlConfig(round_seconds=60.0, default_delay=10.0, max_rounds=30, **kw)
    return fx, cfg, crawl(fx.seeds, fx.web, cfg)


def test_deterministic():
    _, _, r1 = run()
    _, _, r2 = run()
    assert [(s.round, s.seq, s.url_canon) for s in r1.schedule] == \
           [(s.round, s.seq, s.url_canon) for s in r2.schedule]
    assert r1.url_seen == r2.url_seen


def test_schedule_is_unique_and_within_seen():
    _, _, r = run()
    urls = [s.url_canon for s in r.schedule]
    assert len(urls) == len(set(urls))  # D2: scheduled at most once
    assert set(urls) <= r.url_seen
    assert r.denied.isdisjoint(urls)  # denied never scheduled


def test_robots_gate_blocks_private():
    _, _, r = run()
    for s in r.schedule:
        assert "/private/" not in s.url_canon or \
            r.robots_cache[s.host_key].is_allowed(parse_url(s.url_canon).match_path())
    # every unreachable-robots host is fully denied (RFC 9309 §2.3.1.4)
    for host, robots in r.robots_cache.items():
        if robots.is_always() is False:
            assert all(s.host_key != host for s in r.schedule)


def test_politeness_budget_respected():
    fx, cfg, r = run()
    per_round_host: dict = {}
    for s in r.schedule:
        per_round_host.setdefault((s.round, s.host_key), []).append(s)
    for (rnd, host), fetches in per_round_host.items():
        delay = r.robots_cache[host].crawl_delay or cfg.default_delay
        budget = max(1, int(cfg.round_seconds // delay))
        assert len(fetches) <= budget, (rnd, host)


def test_seq_ordering_contract():
    _, _, r = run()
    by_round: dict = {}
    for s in r.schedule:
        by_round.setdefault(s.round, []).append(s)
    for rnd, items in by_round.items():
        assert [s.seq for s in items] == list(range(len(items)))
        keys = [(-s.priority, s.host_key, s.url_canon) for s in items]
        assert keys == sorted(keys)


def test_priorities_ordered_within_round_zero():
    _, _, r = run()
    round0 = [s for s in r.schedule if s.round == 0]
    assert round0, "round 0 must schedule seeds"
    assert all(math.isclose(s.priority, 1.0) for s in round0[:1])
