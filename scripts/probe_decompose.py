"""Phase decomposition probes for the r13 optimization targets.

Times the build phase (driver-side plan construction incl. metadata
collects) and the execution phase (noop sink) separately, and for d07
times each arm in isolation. Usage:

    python scripts/probe_decompose.py d07|p05|p31 [passes]

Same warm-up + min-of-N methodology as bench_one; run on a quiet box.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF = "/root/testdata/sf0.1"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(label, fn, passes=4):
    best = None
    for _ in range(passes):
        t0 = time.time()
        fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:48s} {best:7.3f}s")
    return best


def probe_d07(spark, passes):
    from pyspark.sql import functions as F

    from delta_kernel_rs_spark.queries.delta_queries import (
        COLS,
        _arm,
        _fixture,
    )
    from delta_kernel_rs_spark.sources.cdf import (
        changes_by_row_tracking,
        net_changes,
    )

    timed("fixture(cdf) lookup", lambda: _fixture(spark, SF, "cdf"), passes)
    t = _fixture(spark, SF, "cdf")
    timed("changes(0) BUILD only", lambda: t.changes(0), passes)
    ch = t.changes(0)
    timed("rows arm exec", lambda: noop(
        ch.select(*COLS, "_change_type", "_commit_version")), passes)
    timed("net arm exec", lambda: noop(
        net_changes(t.changes(0), key_columns=COLS)), passes)
    rtc = _fixture(spark, SF, "rtc")
    timed("lineage BUILD", lambda: changes_by_row_tracking(
        spark, rtc.path, base_version=0), passes)
    timed("lineage exec", lambda: noop(
        changes_by_row_tracking(spark, rtc.path, base_version=0)), passes)

    def full():
        from delta_kernel_rs_spark.queries.delta_queries import d07_delta_cdf
        noop(d07_delta_cdf(spark, SF))

    timed("full d07 (build+exec)", full, passes)


def probe_p05(spark, passes):
    from pyspark.sql import functions as F

    from delta_kernel_rs_spark.operators.similarity import (
        cosine_topk,
        ivf_topk,
        ivf_topk_quantized,
        srp_topk,
    )
    from delta_kernel_rs_spark.queries.pipeline_queries import load_table

    emb = load_table(spark, SF, "embeddings")
    timed("brute arm", lambda: noop(
        cosine_topk(emb, emb.filter(F.col("vec_id") < 8), k=5)), passes)
    timed("ivf arm", lambda: noop(ivf_topk(emb, n_centroids=16, k=5)), passes)
    timed("ivfq arm", lambda: noop(
        ivf_topk_quantized(emb, n_centroids=16, k=5)), passes)
    timed("srp arm", lambda: noop(
        srp_topk(emb, emb.filter(F.col("vec_id") < 8), n_planes=8, k=5)), passes)

    def full():
        from delta_kernel_rs_spark.queries.pipeline_queries import (
            p05_embedding_topk,
        )
        noop(p05_embedding_topk(spark, SF))

    timed("full p05", full, passes)


def probe_p31(spark, passes):
    from pyspark.sql import functions as F

    from delta_kernel_rs_spark.operators.similarity import (
        _kmeans_update,
        _with_norm2,
        _assign_literal_centroids,
        kmeans_clusters,
        semantic_dedup,
    )
    from delta_kernel_rs_spark.operators.parallel import ensure_min_parallelism
    from delta_kernel_rs_spark.queries.pipeline_queries import load_table

    df = load_table(spark, SF, "embeddings").withColumnRenamed(
        "embedding", "embedding"
    )
    id_col, vec_col = "vec_id", "embedding"

    def seeds():
        return sorted(
            (r[0], list(r[1]))
            for r in df.filter(F.col(id_col) < 8).select(id_col, vec_col).collect()
        )

    timed("seeds collect", seeds, passes)
    cents = seeds()
    vecs = _with_norm2(ensure_min_parallelism(df), vec_col, 64)
    timed("assign iter0 exec (noop)", lambda: noop(
        _assign_literal_centroids(vecs, cents, id_col, vec_col)), passes)
    timed("update collect", lambda: _kmeans_update(
        _assign_literal_centroids(vecs, cents, id_col, vec_col), vec_col
    ).collect(), passes)
    timed("kmeans_clusters full exec", lambda: noop(kmeans_clusters(
        df, n_centroids=8, n_iters=2, id_col=id_col, vec_col=vec_col, dims=64
    )), passes)
    timed("semantic_dedup full", lambda: noop(semantic_dedup(
        df, n_centroids=8, n_iters=2, threshold=0.4,
        id_col=id_col, vec_col=vec_col, dims=64,
    )), passes)


def main():
    which = sys.argv[1]
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    import os

    os.environ.setdefault("SPARK_GRAFT_SF_DIR", SF)
    from delta_kernel_rs_spark.session import get_spark

    spark = get_spark("probe-decompose", cpus="32")
    # one untimed warm-up via the full query
    import __spark_entry__ as e

    name = {"d07": "d07_delta_cdf", "p05": "p05_embedding_topk",
            "p31": "p31_semantic_dedup"}[which]
    noop(e.queries()[name](spark, SF))
    {"d07": probe_d07, "p05": probe_p05, "p31": probe_p31}[which](spark, passes)


if __name__ == "__main__":
    main()
