#!/usr/bin/env python
"""Time a subset of registered queries in isolation (guide §1).

Usage:
    python3 scripts/bench_one.py q01_pricing_summary d07_delta_cdf \
        [--sf /root/testdata/sf0.1] [--passes 3] [--explain DIR]

Same methodology as bench.py (one untimed warm-up pass, then N timed
passes, noop sink, per-query MIN), but only over the named queries, so a
single query can be iterated on without paying for the whole registry.
With --explain DIR, writes each query's ``explain('formatted')`` to
DIR/<name>.txt (the plan artifacts the judge reads under plans/r12/).

This is a development tool; the official artifact stays bench.py's JSON
line.
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import time
from contextlib import redirect_stdout
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--explain", default=None,
                    help="directory to write explain('formatted') files")
    args = ap.parse_args()

    from delta_kernel_rs_spark.queries import queries
    from delta_kernel_rs_spark.session import get_spark

    spark = get_spark(app_name="dkrs-bench-one")
    registry = queries()
    missing = [n for n in args.names if n not in registry]
    if missing:
        sys.exit(f"unknown queries: {missing}")
    todo = {n: registry[n] for n in args.names}

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warm-up (fixture builds, codegen, page cache)
    for name, fn in todo.items():
        spark.sparkContext.setJobDescription(f"warmup {name}")
        force(fn(spark, args.sf))

    if args.explain:
        out_dir = Path(args.explain)
        out_dir.mkdir(parents=True, exist_ok=True)
        for name, fn in todo.items():
            buf = io.StringIO()
            with redirect_stdout(buf):
                fn(spark, args.sf).explain("formatted")
            (out_dir / f"{name}.txt").write_text(buf.getvalue())

    if args.passes <= 0:  # plan-capture-only mode
        return
    detail: dict[str, list[float]] = {n: [] for n in todo}
    for _ in range(args.passes):
        for name, fn in todo.items():
            spark.sparkContext.setJobDescription(f"timed {name}")
            t0 = time.perf_counter()
            force(fn(spark, args.sf))
            detail[name].append(round(time.perf_counter() - t0, 3))
    result = {
        "sf": args.sf,
        "mins": {n: min(ts) for n, ts in detail.items()},
        "all": detail,
    }
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
