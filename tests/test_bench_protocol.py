"""run_scaling's pairing/stopping protocol, driven with fake legs — the
rules are outcome-INDEPENDENT (ADVICE r3): resampling may be triggered
only by congestion evidence (total-time drift between pairs, or a raw
host probe under 0.75), never by the engine's own efficiency reading."""

import bench


def _leg(elapsed, n_urls=600_000):
    return {"elapsed_sec": elapsed, "urls_per_sec": round(n_urls / elapsed, 1)}


def _run(monkeypatch, legs, probes, **kw):
    """legs: [(lo_elapsed, hi_elapsed), ...]; probes: host_eff per pair."""
    it_legs = iter([e for pair in legs for e in pair])
    it_probes = iter(probes)
    monkeypatch.setattr(
        bench, "_scaling_leg",
        lambda cores, n, mode, timeout_cap=None: _leg(next(it_legs)))
    monkeypatch.setattr(bench, "host_parallel_capacity",
                        lambda lo, hi: {"efficiency": next(it_probes)})
    # protocol tests are budget-neutral unless a test sets budget_s:
    # the stopping rules under test are drift/probe, not wall budget
    # (the effective budget is min(env, budget_s), so lift both)
    monkeypatch.setenv("KIT_BENCH_SCALE_BUDGET", "100000")
    kw.setdefault("budget_s", 100_000)
    return bench.run_scaling(600_000, 8, **kw)


def test_two_clean_pairs_stop(monkeypatch):
    r = _run(monkeypatch, [(640, 180), (650, 182)], [0.9, 0.92])
    assert len(r["pairs"]) == 2
    assert r["efficiency"] == r["pairs"][0]["efficiency"]  # min-total pair


def test_total_drift_triggers_third_pair(monkeypatch):
    # totals 820 vs 873 drift 6.5% > 5% -> third pair measured; and a
    # LOW efficiency alone (pair 2's 0.885-ish vs pair 1) never triggers
    r = _run(monkeypatch, [(640, 180), (683, 190), (645, 181)],
             [0.9, 0.92, 0.95])
    assert len(r["pairs"]) == 3


def test_low_engine_efficiency_alone_never_resamples(monkeypatch):
    # both pairs tight + clean probes but engine efficiency ~0.5:
    # outcome-independence demands NO extra pair
    r = _run(monkeypatch, [(640, 320), (642, 322)], [0.95, 0.96])
    assert len(r["pairs"]) == 2
    assert r["efficiency"] < 0.6


def test_congested_probe_triggers_extra_pair(monkeypatch):
    r = _run(monkeypatch, [(640, 180), (641, 181), (642, 180)],
             [0.5, 0.9, 0.91])
    assert len(r["pairs"]) == 3


def test_single_pair_with_clean_probe_stops(monkeypatch):
    r = _run(monkeypatch, [(640, 180)], [0.9], pairs=1, max_pairs=2)
    assert len(r["pairs"]) == 1


def test_single_pair_congested_probe_takes_its_extra(monkeypatch):
    r = _run(monkeypatch, [(640, 180), (650, 182)], [0.6, 0.9],
             pairs=1, max_pairs=2)
    assert len(r["pairs"]) == 2


def test_hard_cap_one_pair(monkeypatch):
    # biground: pairs=1, max_pairs=1 is absolute regardless of the probe
    r = _run(monkeypatch, [(640, 180)], [0.4], pairs=1, max_pairs=1)
    assert len(r["pairs"]) == 1


def test_budget_stops_before_unaffordable_pair(monkeypatch):
    # a congested probe WANTS a third pair, but the last pair's own cost
    # says it won't fit the remaining wall budget -> stop at two and
    # report what was measured (the driver capture must never time out)
    r = _run(monkeypatch, [(640, 180), (650, 182)], [0.5, 0.9],
             budget_s=2000)
    assert len(r["pairs"]) == 2
