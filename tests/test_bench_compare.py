"""Unit tests for the bench regression gate (scripts/bench_compare.py),
mirroring the reference's CI rule tests (benchmarks/ci/parse_critcmp.py)."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

SCRIPT = str(Path(__file__).resolve().parent.parent / "scripts" / "bench_compare.py")


def _write(tmp_path, name, queries):
    p = tmp_path / name
    p.write_text(json.dumps({"metric": "total_query_wall_sec", "queries": queries}))
    return str(p)


def _run(old, new, *extra):
    proc = subprocess.run(
        [sys.executable, SCRIPT, old, new, *extra],
        capture_output=True, text=True,
    )
    verdict = json.loads(proc.stdout.strip().splitlines()[-1])
    return proc.returncode, verdict


def test_gate_passes_within_threshold(tmp_path):
    old = _write(tmp_path, "old.json", {"q1": 1.0, "q2": 2.0})
    new = _write(tmp_path, "new.json", {"q1": 1.1, "q2": 2.2})
    rc, verdict = _run(old, new)
    assert rc == 0 and verdict["pass"] is True


def test_gate_fails_on_regression(tmp_path):
    old = _write(tmp_path, "old.json", {"q1": 1.0, "q2": 2.0})
    new = _write(tmp_path, "new.json", {"q1": 1.0, "q2": 2.5})
    rc, verdict = _run(old, new)
    assert rc == 1
    assert [r["query"] for r in verdict["regressions"]] == ["q2"]


def test_gate_exempts_named_composition_changes(tmp_path):
    old = _write(tmp_path, "old.json", {"q1": 1.0, "q2": 2.0})
    new = _write(tmp_path, "new.json", {"q1": 1.0, "q2": 6.0})
    rc, verdict = _run(old, new, "--exempt", "q2")
    assert rc == 0 and verdict["pass"] is True


def test_gate_noise_floor_ignores_tiny_queries(tmp_path):
    old = _write(tmp_path, "old.json", {"q1": 0.10})
    new = _write(tmp_path, "new.json", {"q1": 0.20})  # 2x but sub-floor
    rc, verdict = _run(old, new)
    assert rc == 0 and verdict["pass"] is True


def test_gate_accepts_driver_wrapped_bench_json(tmp_path):
    old = _write(tmp_path, "old.json", {"q1": 1.0})
    p = tmp_path / "wrapped.json"
    p.write_text(json.dumps({"n": 8, "parsed": {"queries": {"q1": 1.05}}}))
    rc, verdict = _run(old, str(p))
    assert rc == 0 and verdict["pass"] is True


def test_gate_reports_new_and_dropped_queries(tmp_path):
    old = _write(tmp_path, "old.json", {"q1": 1.0, "gone": 1.0})
    new = _write(tmp_path, "new.json", {"q1": 1.0, "fresh": 9.0})
    rc, verdict = _run(old, new)
    assert rc == 0  # additions/removals are reported, never regressions


# -- noise-robustness (r9): spread recorded by bench.py gates the gate ----


def _write_spread(tmp_path, name, queries, spread):
    p = tmp_path / name
    p.write_text(json.dumps(
        {"metric": "total_query_wall_sec", "queries": queries, "spread": spread}
    ))
    return str(p)


def test_gate_refuses_verdict_when_new_spread_exceeds_margin(tmp_path):
    old = _write(tmp_path, "old.json", {"q1": 1.0, "q2": 2.0})
    new = _write_spread(tmp_path, "new.json", {"q1": 1.0, "q2": 2.5}, 0.22)
    proc = subprocess.run(
        [sys.executable, SCRIPT, old, new], capture_output=True, text=True
    )
    verdict = json.loads(proc.stdout.strip().splitlines()[-1])
    assert proc.returncode == 3
    assert verdict["pass"] is None and verdict["unreliable"] is True
    assert "UNRELIABLE" in proc.stdout


def test_gate_refuses_verdict_when_old_spread_exceeds_margin(tmp_path):
    old = _write_spread(tmp_path, "old.json", {"q1": 1.0}, 0.30)
    new = _write_spread(tmp_path, "new.json", {"q1": 1.0}, 0.02)
    rc, verdict = _run(old, new)
    assert rc == 3 and verdict["pass"] is None


def test_gate_verdicts_normally_when_spread_within_margin(tmp_path):
    old = _write_spread(tmp_path, "old.json", {"q1": 1.0, "q2": 2.0}, 0.05)
    new = _write_spread(tmp_path, "new.json", {"q1": 1.0, "q2": 2.5}, 0.08)
    rc, verdict = _run(old, new)
    assert rc == 1  # real regression still fails when measurement is tight
    assert verdict["pass"] is False
    assert verdict["new_spread"] == 0.08


def test_gate_treats_missing_spread_as_legacy_single_run(tmp_path):
    # pre-r9 artifacts carry no spread; the gate must still verdict
    old = _write(tmp_path, "old.json", {"q1": 1.0})
    new = _write(tmp_path, "new.json", {"q1": 1.05})
    rc, verdict = _run(old, new)
    assert rc == 0 and verdict["pass"] is True and verdict["new_spread"] is None


def test_gate_prefers_min_spread_over_total_spread(tmp_path):
    """A co-tenant can blow ONE pass up without moving the min: the gate
    trusts min_spread (replication of the compared estimator) when the
    artifact carries it, not the coarser max-min spread."""
    old = _write(tmp_path, "old.json", {"q1": 1.0})
    p = tmp_path / "new.json"
    p.write_text(json.dumps({
        "metric": "total_query_wall_sec", "queries": {"q1": 1.05},
        "runs": [80.0, 51.2, 50.9], "spread": 0.57, "min_spread": 0.006,
    }))
    rc, verdict = _run(old, str(p))
    assert rc == 0 and verdict["pass"] is True  # min replicated -> verdict

    p.write_text(json.dumps({
        "metric": "total_query_wall_sec", "queries": {"q1": 1.05},
        "runs": [80.0, 70.0, 50.9], "spread": 0.57, "min_spread": 0.375,
    }))
    rc, verdict = _run(old, str(p))
    assert rc == 3 and verdict["pass"] is None  # min NOT replicated


# -- bench.py adaptive pass loop (self-healing, round 11) --------------------
# BENCH_r10 was refused by the gate at min_spread 22.6% (passes 82/67/164 s
# on a loaded box); bench.py now runs bounded extra passes until the min
# replicates, recording `passes` honestly. The loop is SparkSession-free.


def _fake_passes(totals):
    """run_pass stub yielding one-query passes with the given totals."""
    it = iter(totals)

    def run_pass():
        return {"q1": next(it)}

    return run_pass


def test_adaptive_stops_at_default_when_min_replicates():
    import bench

    detail, totals = bench.run_adaptive_passes(
        _fake_passes([10.0, 10.2, 10.1]), passes=3, margin=0.15, max_passes=7
    )
    assert totals == [10.0, 10.2, 10.1]  # 3 passes, no extras
    assert bench.min_spread_of(totals) <= 0.15
    assert detail["q1"] == [10.0, 10.2, 10.1]


def test_adaptive_heals_noisy_run_with_extra_passes():
    import bench

    # the BENCH_r10 shape: loaded box, min not replicated after 3 passes;
    # the 4th pass lands near the min and heals the artifact
    detail, totals = bench.run_adaptive_passes(
        _fake_passes([82.0, 67.0, 164.0, 68.0]), passes=3, margin=0.15, max_passes=7
    )
    assert len(totals) == 4  # exactly one extra pass
    assert bench.min_spread_of(totals) <= 0.15  # (68-67)/67 ~ 1.5%
    assert min(detail["q1"]) == 67.0  # the reported min is the true floor


def test_adaptive_gives_up_at_cap_and_records_honestly():
    import bench

    # hopeless box: totals never replicate; the loop must stop at the cap
    # and leave min_spread OVER the margin so bench_compare still refuses
    detail, totals = bench.run_adaptive_passes(
        _fake_passes([50.0, 70.0, 90.0, 110.0, 130.0, 150.0, 170.0, 190.0]),
        passes=3,
        margin=0.15,
        max_passes=7,
    )
    assert len(totals) == 7  # capped
    assert bench.min_spread_of(totals) > 0.15  # honest: still unreliable
