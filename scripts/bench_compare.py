#!/usr/bin/env python
"""Per-query bench regression gate.

Mirrors the reference's CI rule (benchmarks/ci/parse_critcmp.py:27-31,
run-benchmarks.sh): a benchmark that regresses more than 1.15x vs the
previous round FAILS the round. Usage:

    python scripts/bench_compare.py BENCH_r07.json BENCH_r08.json \
        [--threshold 1.15] [--exempt q02_foo,p11_bar] [--min-sec 0.3]

- `--exempt` names queries whose composition changed this round (new
  oracle-checked arms = more work by design), matching the reference's
  practice of resetting a benchmark's baseline when the workload changes.
- `--min-sec` ignores ratio noise on sub-300ms queries where JVM/GC
  jitter dominates (the reference compares criterion means, which have
  confidence intervals; wall-clock one-shots need an absolute floor).

Exit code 0 = pass, 1 = regression found, 2 = bad input.
Prints a per-query table plus a one-line JSON verdict for the round log.
"""

from __future__ import annotations

import argparse
import json
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    parsed = doc.get("parsed") or doc  # accept raw bench line or driver wrapper
    q = parsed.get("queries")
    if not isinstance(q, dict) or not q:
        raise ValueError(f"{path}: no 'queries' dict found")
    return {k: float(v) for k, v in q.items()}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("old", help="previous round BENCH json")
    ap.add_argument("new", help="current round BENCH json")
    ap.add_argument("--threshold", type=float, default=1.15)
    ap.add_argument("--exempt", default="", help="comma-separated query names")
    ap.add_argument(
        "--min-sec",
        type=float,
        default=0.3,
        help="skip ratio check when BOTH timings are under this (noise floor)",
    )
    args = ap.parse_args()

    try:
        old = load_queries(args.old)
        new = load_queries(args.new)
    except (OSError, ValueError, json.JSONDecodeError) as e:
        print(f"error: {e}", file=sys.stderr)
        return 2

    exempt = {s.strip() for s in args.exempt.split(",") if s.strip()}
    regressions: list[tuple[str, float, float, float]] = []
    rows: list[str] = []
    for name in sorted(set(old) | set(new)):
        if name not in old:
            rows.append(f"  NEW      {name:44s}          -> {new[name]:6.2f}s")
            continue
        if name not in new:
            rows.append(f"  DROPPED  {name:44s} {old[name]:6.2f}s ->")
            continue
        o, n = old[name], new[name]
        ratio = n / o if o > 0 else float("inf")
        flag = ""
        if name in exempt:
            flag = "exempt"
        elif o < args.min_sec and n < args.min_sec:
            flag = "noise-floor" if ratio > args.threshold else ""
        elif ratio > args.threshold:
            flag = f"REGRESSION {ratio:.2f}x"
            regressions.append((name, o, n, ratio))
        rows.append(
            f"  {ratio:5.2f}x  {name:44s} {o:6.2f}s -> {n:6.2f}s  {flag}"
        )
    print("\n".join(rows))

    tot_old, tot_new = sum(old.values()), sum(new.values())
    verdict = {
        "old_total_sec": round(tot_old, 2),
        "new_total_sec": round(tot_new, 2),
        "total_ratio": round(tot_new / tot_old, 3) if tot_old else None,
        "threshold": args.threshold,
        "regressions": [
            {"query": q, "old": o, "new": n, "ratio": round(r, 3)}
            for q, o, n, r in regressions
        ],
        "pass": not regressions,
    }
    print(json.dumps(verdict))
    return 0 if not regressions else 1


if __name__ == "__main__":
    sys.exit(main())
