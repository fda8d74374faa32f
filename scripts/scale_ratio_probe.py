"""Core-scaling sanity probe for the in-row rewrites (VERDICT r12 #9).

At sf0.1 the seven flagged queries (8↔32-core ratio <= 0.84) are fixed-
overhead bound; this probe re-measures them on a 10x synthetic corpus
(20k docs/vecs, the bench_scale fixture generator) so the per-row
compute dominates and the core ratio is meaningful.

Usage:
    SPARK_GRAFT_CPUS=32 python scripts/scale_ratio_probe.py /tmp/fix20k
    SPARK_GRAFT_CPUS=8  python scripts/scale_ratio_probe.py /tmp/fix20k

Prints one JSON line {query: min_sec} for the invoked core count.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_N", "20000"))

FLAGGED = [
    "p17_top_bigrams",
    "p23_tfidf_top_terms",
    "p26_decontamination",
    "p30_duplicated_spans",
    "p31_semantic_dedup",
    "p32_unigram_outliers",
    "p18_neardup_clusters",
]


def main() -> None:
    fx = sys.argv[1]
    from delta_kernel_rs_spark.corpus import write_scale_fixture
    from delta_kernel_rs_spark.queries import queries
    from delta_kernel_rs_spark.session import get_spark

    if not os.path.exists(f"{fx}/documents.parquet"):
        write_scale_fixture(fx, n_docs=N_DOCS, n_vecs=N_DOCS, seed=11)
    spark = get_spark("scale-ratio-probe")
    registry = queries()

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for name in FLAGGED:
        fn = registry[name]
        force(fn(spark, fx))  # warm-up
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            force(fn(spark, fx))
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"[scale-ratio] {name} = {out[name]}", file=sys.stderr, flush=True)
    print(json.dumps({"cpus": os.environ.get("SPARK_GRAFT_CPUS"), "n_docs": N_DOCS, "mins": out}))


if __name__ == "__main__":
    main()
