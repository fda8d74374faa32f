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
    # passes 4 and 5 land near the min and heal the artifact (the
    # optional-stopping guard requires the dip to persist for TWO
    # consecutive evaluations, so one lucky pass is not enough)
    detail, totals = bench.run_adaptive_passes(
        _fake_passes([82.0, 67.0, 164.0, 68.0, 68.5]),
        passes=3, margin=0.15, max_passes=7,
    )
    assert len(totals) == 5  # two extra passes: dip must persist
    assert bench.min_spread_of(totals) <= 0.15  # (68-67)/67 ~ 1.5%
    assert min(detail["q1"]) == 67.0  # the reported min is the true floor


def test_adaptive_optional_stopping_guard_rejects_single_lucky_dip():
    """ADVICE r11: with repeated evaluation the two smallest order
    statistics converge by chance; a single dip under margin must NOT
    stop the loop. Pass 4 dips (50.0 vs min 49.0 -> 2%), pass 5 blows
    back up (streak resets), passes 6-7 must still run."""
    import bench

    seq = [49.0, 80.0, 95.0, 50.0, 120.0, 49.5, 49.8]
    detail, totals = bench.run_adaptive_passes(
        _fake_passes(seq), passes=3, margin=0.15, max_passes=7
    )
    assert len(totals) == 7  # pass-4 dip alone didn't stop it
    assert bench.min_spread_of(totals) <= 0.15  # healed by 6+7


def test_adaptive_clean_run_still_costs_exactly_the_initial_passes():
    """The guard applies only to the extra-pass regime: a clean 3-pass
    run (fixed-N, no stopping decision) stays 3 passes."""
    import bench

    _, totals = bench.run_adaptive_passes(
        _fake_passes([10.0, 10.1, 10.05]), passes=3, margin=0.15, max_passes=7
    )
    assert totals == [10.0, 10.1, 10.05]


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


# -- oracle-floor drift normalization (round 12) ------------------------------
# The engine-free DuckDB oracle drifted 39.0 -> 57.5 s across judge sessions,
# flunking untouched queries on absolute seconds. When both artifacts carry a
# co-measured oracle floor, the gate scales the old side by the measured box
# drift and gates on the engine/oracle ratio-of-ratios.


def _write_oracle(tmp_path, name, queries, *, min_spread=0.01,
                  oracle_floor=None, oracle_min_spread=0.01, eoo=None):
    doc = {
        "metric": "total_query_wall_sec",
        "queries": queries,
        "min_spread": min_spread,
    }
    if oracle_floor is not None:
        doc["oracle_floor_sec"] = oracle_floor
        doc["oracle_min_spread"] = oracle_min_spread
        doc["engine_over_oracle"] = eoo or round(
            sum(queries.values()) / oracle_floor, 4
        )
    p = tmp_path / name
    p.write_text(json.dumps(doc))
    return str(p)


def test_gate_prefers_oracle_ratio_when_both_artifacts_carry_it(tmp_path):
    """The r9->r11 false-fail shape: identical code, box 1.5x slower on the
    new day. Absolute compare would flag every query; the drift-scaled
    compare must pass."""
    old = _write_oracle(tmp_path, "old.json", {"q1": 1.0, "q2": 2.0},
                        oracle_floor=40.0)
    new = _write_oracle(tmp_path, "new.json", {"q1": 1.5, "q2": 3.0},
                        oracle_floor=60.0)  # box 1.5x slower, engine too
    rc, verdict = _run(old, new)
    assert verdict["mode"] == "oracle_ratio"
    assert verdict["box_drift"] == 1.5
    assert rc == 0 and verdict["pass"] is True
    assert verdict["regressions"] == []
    assert verdict["ratio_of_ratios"] == 1.0


def test_gate_oracle_ratio_still_catches_real_regressions(tmp_path):
    """Box got FASTER (drift 0.8x) but one query regressed 2x in real
    terms — drift scaling must expose it, not excuse it."""
    old = _write_oracle(tmp_path, "old.json", {"q1": 1.0, "q2": 2.0},
                        oracle_floor=50.0)
    new = _write_oracle(tmp_path, "new.json", {"q1": 0.8, "q2": 3.2},
                        oracle_floor=40.0)  # q2: 3.2 / (2.0*0.8) = 2.0x
    rc, verdict = _run(old, new)
    assert verdict["mode"] == "oracle_ratio"
    assert rc == 1 and verdict["pass"] is False
    assert [r["query"] for r in verdict["regressions"]] == ["q2"]


def test_gate_falls_back_to_absolute_when_one_side_is_legacy(tmp_path):
    """Pre-r12 artifacts carry no oracle floor; the gate must still
    verdict (absolute mode), exactly as before."""
    old = _write(tmp_path, "old.json", {"q1": 1.0})
    new = _write_oracle(tmp_path, "new.json", {"q1": 1.05}, oracle_floor=40.0)
    rc, verdict = _run(old, new)
    assert verdict["mode"] == "absolute"
    assert rc == 0 and verdict["pass"] is True


def test_gate_refuses_verdict_when_oracle_floor_is_noisy(tmp_path):
    """Both sides carry oracle data but one oracle floor did not
    replicate: drift normalization is untrustworthy and the absolute
    compare is the drift-hostage signal it replaces -> refuse."""
    old = _write_oracle(tmp_path, "old.json", {"q1": 1.0},
                        oracle_floor=40.0, oracle_min_spread=0.02)
    new = _write_oracle(tmp_path, "new.json", {"q1": 1.05},
                        oracle_floor=60.0, oracle_min_spread=0.30)
    rc, verdict = _run(old, new)
    assert rc == 3
    assert verdict["pass"] is None and verdict["oracle_unreliable"] is True


def test_gate_engine_noise_refusal_survives_oracle_mode(tmp_path):
    """A clean oracle floor cannot launder a noisy ENGINE measurement:
    the min_spread refusal still applies in oracle_ratio mode."""
    old = _write_oracle(tmp_path, "old.json", {"q1": 1.0},
                        oracle_floor=40.0)
    new = _write_oracle(tmp_path, "new.json", {"q1": 1.05},
                        min_spread=0.40, oracle_floor=41.0)
    rc, verdict = _run(old, new)
    assert rc == 3 and verdict["pass"] is None
