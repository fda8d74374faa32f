#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line on stdout:
    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "runs": [t1, t2, t3],
     "spread": 0.06, "passes": 3, "sf": 0.1}

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


def _force(df) -> None:
    """Fully execute a DataFrame without driver-side materialization."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3")))
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

    detail: dict[str, list[float]] = {name: [] for name in registry}
    for _ in range(passes):
        for name, fn in registry.items():
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            detail[name].append(round(time.perf_counter() - t0, 4))

    timings = {name: min(ts) for name, ts in detail.items()}
    run_totals = [
        round(sum(detail[name][p] for name in registry), 2) for p in range(passes)
    ]
    spread = (
        round((max(run_totals) - min(run_totals)) / min(run_totals), 4)
        if min(run_totals) > 0
        else 0.0
    )
    ordered = sorted(run_totals)
    min_spread = (
        round((ordered[1] - ordered[0]) / ordered[0], 4)
        if len(ordered) > 1 and ordered[0] > 0
        else 0.0
    )

    try:
        detail_dir = Path(_REPO) / "bench"
        detail_dir.mkdir(exist_ok=True)
        (detail_dir / "last_run_detail.json").write_text(
            json.dumps(
                {"sf": sf, "passes": passes, "run_totals": run_totals,
                 "spread": spread, "min_spread": min_spread,
                 "per_query_runs": detail},
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
        "passes": passes,
        "sf": sf if sf is not None else sf_dir,
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
