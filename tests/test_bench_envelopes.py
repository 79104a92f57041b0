"""Per-query bench budgets (VERDICT r3 item 5): BENCH_ENVELOPES.json is
the recorded performance contract — 1.5× the idle per-query timing —
and bench.py self-reports ``envelope_violations`` against it, so a
machine-noise wiggle is distinguishable from a real regression without
eyeballing BENCH history.

These tests pin the envelope file's integrity and its agreement with
the bench harness + recorded history; the timings themselves are
checked by bench.py at run time (and recorded per round in
BENCH_r{N}.json).
"""

import glob
import json
import os

import bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _envelopes():
    with open(os.path.join(REPO, "BENCH_ENVELOPES.json")) as f:
        return json.load(f)


def test_envelopes_cover_every_headline_query():
    env = _envelopes()
    assert set(env["queries"]) == set(bench.HEADLINE)
    assert env["sf"] == 0.1


def test_envelopes_are_sane():
    for q, e in _envelopes()["queries"].items():
        assert e["idle_sec"] > 0, q
        assert e["budget_sec"] >= e["idle_sec"] * 1.49, q


def test_latest_recorded_bench_within_envelopes():
    """The newest BENCH_r*.json must fit the budgets (the r5 idle
    numbers seeded them, so this is a tripwire for FUTURE rounds: a
    regressed query turns this red on the next recorded run).

    Mirrors bench.py's violation rule: timings normalize by the run's
    recorded ``calibration.host_factor`` before comparing to budget, so
    a contended-fleet-host round (r4's failure mode) can't manufacture
    violations; a run with no recorded calibration compares raw.
    """
    env = _envelopes()
    env_cpus = (env.get("calibration") or {}).get("cpus", 32)
    rounds = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    # Budgets were recorded at the calibration core count: the driver
    # also records low-core scaling runs (BENCH_r{N}_c8.json, new in
    # r9) whose raw timings are NOT comparable to 32-core budgets.
    rounds = [
        p
        for p in rounds
        if json.load(open(p)).get("cpus", env_cpus) == env_cpus
    ]
    assert rounds, "driver records BENCH_r{N}.json per round"
    with open(rounds[-1]) as f:
        rec = json.load(f)
    parsed = rec.get("parsed") or {}
    if parsed.get("sf") != env["sf"]:
        return  # budgets only compare at the recorded sf
    host_factor = (parsed.get("calibration") or {}).get("host_factor", 1.0)
    assert host_factor >= 1.0
    over = {
        q: (round(t / host_factor, 3), env["queries"][q]["budget_sec"])
        for q, t in parsed.get("queries", {}).items()
        if q in env["queries"]
        and t / host_factor > env["queries"][q]["budget_sec"]
    }
    assert not over, f"queries over budget (normalized): {over}"


def test_host_factor_uses_cleanest_window():
    # r8 shape: clean before, contaminated after -> factor from the
    # clean sample (timings min-merge across the same attempts)
    attempts = [{"before_sec": 1.50, "after_sec": 3.83}]
    assert bench._host_factor(attempts, 1.65, True) == 1.0
    # sustained contention inflates every sample -> factor rises
    attempts = [
        {"before_sec": 3.3, "after_sec": 3.4},
        {"before_sec": 3.2, "after_sec": 3.5},
    ]
    assert bench._host_factor(attempts, 1.65, True) == round(3.2 / 1.65, 3)
    # failed probes (-1.0) are ignored; no usable sample -> 1.0
    assert bench._host_factor([{"before_sec": -1.0, "after_sec": -1.0}], 1.65, True) == 1.0
    assert bench._host_factor(attempts, 1.65, False) == 1.0


def test_contended_judges_worse_sample():
    # the BENCH_r08 failure mode: one-sided mid-run contamination must
    # flag contended (old min()-based verdict said false)
    last = {"before_sec": 1.50, "after_sec": 3.83}
    assert bench._is_contended(last, 1.65, True, 1.3) is True
    assert bench._is_contended({"before_sec": 1.6, "after_sec": 1.7}, 1.65, True, 1.3) is False
    # cpus-mismatched reference never judges
    assert bench._is_contended(last, 1.65, False, 1.3) is False
