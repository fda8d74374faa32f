#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line on stdout:
    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "runs": [t1, t2, t3],
     "spread": 0.06, "min_spread": 0.02, "passes": 3, "sf": 0.1}

Noise protocol (mirrors the intent of the reference's critcmp baseline
comparison, benchmarks/ci/parse_critcmp.py:27-31, which compares
statistically-settled criterion estimates rather than single runs):

* one full UNTIMED warm-up pass over every query (JVM classloading,
  parquet footer caches, codegen, and — critically — the lazy per-process
  Delta fixture builds, which would otherwise land entirely in the first
  timed pass and read as a 3x phantom spread),
* N full passes over the whole registry (default 3,
  $SPARK_GRAFT_BENCH_PASSES to override),
* ``queries`` holds the per-query MIN across passes (the least-noise
  estimator for wall-clock floor),
* ``value`` is the sum of those mins,
* ``runs`` is each pass's total, ``spread`` = (max-min)/min of those
  totals, and ``min_spread`` = (second_min-min)/min — the replication
  quality of the MIN estimator the gate actually compares. A co-tenant
  can blow one pass up (observed 80/58/51 s on identical code) without
  moving the min; min_spread stays honest about whether the min itself
  is reproduced. scripts/bench_compare.py refuses to pass/fail a round
  whose recorded min_spread (spread for legacy artifacts) exceeds the
  gate margin — a gate whose measurement noise exceeds its margin gates
  nothing.
* SELF-HEALING (round 11, after BENCH_r10 was refused as UNRELIABLE at
  min_spread 22.6%): when min_spread still exceeds the gate margin
  (default 0.15 = the compare threshold's margin,
  $SPARK_GRAFT_BENCH_MARGIN) after the initial passes, run bounded EXTRA
  passes (default cap 7 total, $SPARK_GRAFT_BENCH_MAX_PASSES) until the
  min replicates; ``passes`` records honestly how many it took. If even
  the cap doesn't replicate the min, the artifact still records the
  over-margin min_spread and bench_compare keeps refusing to verdict —
  extra passes repair the signal, they never fake it.
* OPTIONAL-STOPPING GUARD (round 12, ADVICE r11): in the extra-pass
  regime the stopping statistic is re-evaluated after every added
  sample, so stopping the FIRST time min_spread dips under margin
  selects for lucky dips (the two smallest order statistics of a noisy
  sequence eventually converge by chance). The loop now requires the
  dip to PERSIST across two consecutive evaluations before stopping.
  The initial fixed-N passes are exempt — no stopping decision is made
  there, so a clean 3-pass run still costs exactly 3 passes.
* ORACLE FLOOR (round 12): cross-round comparisons of absolute seconds
  are hostage to box drift — the DuckDB oracle itself (identical SQL,
  identical parquet, zero engine code) measured 39.0 / 44.6 / 57.5 s
  across three judge sessions. So bench.py now times the DuckDB oracle
  twins (``oracle_sql()``) in the SAME run with the same pass protocol
  and records ``oracle_floor_sec`` (sum of per-query mins),
  ``oracle_min_spread``, ``oracle_passes``, and ``engine_over_oracle``
  (= value / oracle_floor_sec) — a box-speed-normalized ratio that
  scripts/bench_compare.py prefers over absolute totals when both
  artifacts carry it. Mirrors the reference's relative-not-absolute
  gating (benchmarks/ci/parse_critcmp.py:27-31 compares against a
  co-measured baseline, never a stored absolute). Disable with
  $SPARK_GRAFT_BENCH_ORACLE=0 for quick engine-only iteration.

Per-query per-pass detail lands in bench/last_run_detail.json for triage;
stdout stays a single driver-parseable line.

Execution is forced with the `noop` datasource sink (full pipeline runs,
nothing is collected to the driver).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

#: gate margin the adaptive pass loop targets — matches bench_compare's
#: default regression threshold (1.15) margin
GATE_MARGIN = 0.15
#: hard cap on total passes; keeps one bench run's wall-clock bounded even
#: on a hopelessly loaded box
MAX_PASSES = 7


def spread_of(run_totals: list[float]) -> float:
    """(max-min)/min over pass totals — the coarse whole-run noise."""
    lo = min(run_totals)
    return round((max(run_totals) - lo) / lo, 4) if lo > 0 else 0.0


def min_spread_of(run_totals: list[float]) -> float:
    """(second_min-min)/min — replication quality of the MIN estimator."""
    ordered = sorted(run_totals)
    if len(ordered) < 2 or ordered[0] <= 0:
        return 0.0
    return round((ordered[1] - ordered[0]) / ordered[0], 4)


def run_adaptive_passes(
    run_pass,
    passes: int = 3,
    margin: float = GATE_MARGIN,
    max_passes: int = MAX_PASSES,
    confirm: int = 2,
) -> tuple[dict[str, list[float]], list[float]]:
    """Run ``passes`` full passes, then bounded extras until the min
    replicates (min_spread <= margin) or ``max_passes`` is reached.

    ``run_pass()`` executes ONE full pass and returns {query: seconds}.
    Returns (per-query timings across all passes, per-pass totals).
    Pure pass-loop policy — SparkSession-free so the adaptive path is
    unit-testable (tests/test_bench_compare.py).

    Optional-stopping guard (ADVICE r11): min_spread over ALL totals is
    monotone-ish — once any two historical samples agree it stays low, so
    stopping the first time it dips selects for lucky coincidences. In
    the extra-pass regime the loop instead stops only when the LAST
    ``confirm`` passes each land within margin of the overall min: the
    floor must replicate in consecutive recent samples. The initial
    fixed-N block makes no stopping decision (single evaluation, no
    optional-stopping bias), so a clean run still costs exactly
    ``passes`` passes."""
    detail: dict[str, list[float]] = {}
    totals: list[float] = []

    def one() -> None:
        res = run_pass()
        for name, t in res.items():
            detail.setdefault(name, []).append(t)
        totals.append(round(sum(res.values()), 2))

    def recent_ok() -> bool:
        lo = min(totals)
        recent = totals[-confirm:]
        return len(recent) >= confirm and lo > 0 and max(recent) <= lo * (
            1 + margin
        )

    for _ in range(max(1, passes)):
        one()
    if min_spread_of(totals) <= margin:
        return detail, totals
    while len(totals) < max_passes and not recent_ok():
        one()
    return detail, totals


def _force(df) -> None:
    """Fully execute a DataFrame without driver-side materialization."""
    df.write.format("noop").mode("overwrite").save()


def time_oracle_passes(
    sf_dir: str,
    names,
    passes: int = 3,
    margin: float = GATE_MARGIN,
    max_passes: int = 5,
) -> tuple[dict[str, list[float]], list[float]]:
    """Time the DuckDB oracle twins of ``names`` at ``sf_dir`` with the
    same warm-up + adaptive-pass protocol as the engine measurement.

    The oracle is the box-speed invariant: identical SQL over identical
    parquet with zero engine code, so its floor moves only when the BOX
    moves. Co-measuring it lets bench_compare separate code regressions
    from measurement-day drift (VERDICT r11 'What's wrong #1')."""
    import duckdb

    from delta_kernel_rs_spark.queries import oracle_sql
    from delta_kernel_rs_spark.queries.tables import TABLE_NAMES

    oracles = oracle_sql()
    todo = [(n, oracles[n]) for n in names if n in oracles]
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    def one_pass() -> dict[str, float]:
        res: dict[str, float] = {}
        for name, sql in todo:
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            res[name] = round(time.perf_counter() - t0, 4)
        return res

    one_pass()  # warm-up: OS page cache + duckdb's own caches
    return run_adaptive_passes(
        one_pass, passes=passes, margin=margin, max_passes=max_passes
    )


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
    margin = float(os.environ.get("SPARK_GRAFT_BENCH_MARGIN", str(GATE_MARGIN)))
    max_passes = max(
        passes, int(os.environ.get("SPARK_GRAFT_BENCH_MAX_PASSES", str(MAX_PASSES)))
    )
    sf = None
    tail = Path(sf_dir).name
    if tail.startswith("sf"):
        try:
            sf = float(tail[2:])
        except ValueError:
            sf = None

    from delta_kernel_rs_spark.queries import queries
    from delta_kernel_rs_spark.session import get_spark

    spark = get_spark(app_name="dkrs-bench")
    registry = queries()

    # Warm-up: JVM classloading, parquet footer caches, codegen, and the
    # lazy per-process Delta fixture builds — a FULL pass, so the timed
    # passes measure queries, not one-time setup.
    for fn in registry.values():
        _force(fn(spark, sf_dir))

    def one_pass() -> dict[str, float]:
        res: dict[str, float] = {}
        for name, fn in registry.items():
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            res[name] = round(time.perf_counter() - t0, 4)
        return res

    detail, run_totals = run_adaptive_passes(
        one_pass, passes=passes, margin=margin, max_passes=max_passes
    )
    n_passes = len(run_totals)
    timings = {name: min(ts) for name, ts in detail.items()}
    spread = spread_of(run_totals)
    min_spread = min_spread_of(run_totals)

    # Co-measured DuckDB oracle floor — the box-drift invariant.
    oracle_detail: dict[str, list[float]] = {}
    oracle_totals: list[float] = []
    if os.environ.get("SPARK_GRAFT_BENCH_ORACLE", "1") != "0":
        try:
            oracle_detail, oracle_totals = time_oracle_passes(
                sf_dir, list(registry), passes=passes, margin=margin
            )
        except Exception as exc:  # noqa: BLE001 — oracle floor is additive signal
            print(f"oracle floor skipped: {type(exc).__name__}: {exc}",
                  file=sys.stderr)

    try:
        detail_dir = Path(_REPO) / "bench"
        detail_dir.mkdir(exist_ok=True)
        (detail_dir / "last_run_detail.json").write_text(
            json.dumps(
                {"sf": sf, "passes": n_passes, "run_totals": run_totals,
                 "spread": spread, "min_spread": min_spread,
                 "per_query_runs": detail,
                 "oracle_run_totals": oracle_totals,
                 "oracle_per_query_runs": oracle_detail},
                indent=1,
            )
        )
    except OSError:
        pass  # detail file is best-effort; the stdout line is the artifact

    out = {
        "metric": "total_query_wall_sec",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        # 2-decimal per-query values keep the whole line inside the
        # driver's 2000-char record window (r5's 4-decimal line lost its
        # head to truncation)
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "runs": run_totals,
        "spread": spread,
        "min_spread": min_spread,
        "passes": n_passes,
        "sf": sf if sf is not None else sf_dir,
    }
    if oracle_totals:
        oracle_floor = round(
            sum(min(ts) for ts in oracle_detail.values()), 2
        )
        out["oracle_floor_sec"] = oracle_floor
        out["oracle_min_spread"] = min_spread_of(oracle_totals)
        out["oracle_passes"] = len(oracle_totals)
        if oracle_floor > 0:
            out["engine_over_oracle"] = round(out["value"] / oracle_floor, 4)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
