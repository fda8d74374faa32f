#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR.

Prints exactly ONE JSON line on stdout:
    {"metric": "total_query_wall_sec", "value": N, "unit": "sec",
     "queries": {"q01_...": sec, ...}, "sf": 0.1}

Execution is forced with the `noop` datasource sink (full pipeline runs,
nothing is collected to the driver), after one warm-up pass of the first
query so JVM/session fixed costs don't pollute per-query numbers.
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

    # Warm-up: JVM classloading, parquet footer caches, codegen.
    first = next(iter(registry.values()))
    _force(first(spark, sf_dir))

    timings: dict[str, float] = {}
    for _ in range(2):  # two passes; keep min — strips GC/compile noise
        for name, fn in registry.items():
            t0 = time.perf_counter()
            _force(fn(spark, sf_dir))
            dt = round(time.perf_counter() - t0, 4)
            timings[name] = min(timings.get(name, dt), dt)

    out = {
        "metric": "total_query_wall_sec",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        # 2-decimal per-query values keep the whole line inside the
        # driver's 2000-char record window (r5's 4-decimal line lost its
        # head to truncation)
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "sf": sf if sf is not None else sf_dir,
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
