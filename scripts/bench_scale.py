#!/usr/bin/env python
"""Two-point scale-growth proof for the heavy pipeline operators.

The driver bench measures p02/p04/p05/p18/p24/p28 at one scale (sf0.1);
nothing there pins their GROWTH RATE. This harness generates the
deterministic linear-by-construction corpus (delta_kernel_rs_spark/
corpus.py), runs each heavy operator at 1x and 10x, and records

* wall-clock growth (bounded: a linear-data operator growing more than
  ``WALL_RATIO_MAX`` x on 10x rows is super-linear — candidate-pair
  explosion, convergence stall, or a shuffle gone quadratic), and
* the CANDIDATE-COUNT growth — candidate pairs / posting entries /
  scored pairs, the real scale signal: deterministic, noise-free, and
  the first thing to explode when a bucketing scheme breaks.

Posture per the reference's mem-test/tests/dhat_large_table_log.rs:
bound the SHAPE, not the constant. Exact small-scale counts are pinned
in tests/test_pipeline.py; this script is the big-n artifact
(bench/scale_growth.json + one JSON line on stdout).

Knobs: SPARK_GRAFT_SCALE_N (default 2000 docs at 1x),
SPARK_GRAFT_SCALE_FACTOR (default 10).
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

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

#: 10x rows may legitimately cost ~10x work plus shuffle overhead; 20x is
#: the "this is no longer linear" alarm from the round-11 brief.
WALL_RATIO_MAX = 20.0
#: linear counts on 10x rows grow ~10x (group-boundary jitter aside)
COUNT_RATIO_MAX = 13.0


# ---------------------------------------------------------------------------
# candidate-count probes — rebuilt from the operators' own building blocks
# so the counted frame IS the frame the operator joins on
# ---------------------------------------------------------------------------


def minhash_candidate_pairs(docs: DataFrame) -> int:
    """Distinct LSH band-bucket candidate pairs (the frame
    neardup_pairs_minhash verifies with exact Jaccard)."""
    from delta_kernel_rs_spark.operators.dedup import (
        minhash_band_signatures,
        with_word_shingles,
    )

    sets_df = with_word_shingles(docs, text_col="text", k=3).select(
        "doc_id", "shingles"
    )
    bands = minhash_band_signatures(sets_df, id_col="doc_id")
    left, right = bands.alias("l"), bands.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.band") == F.col("r.band"),
                F.col("l.band_sig") == F.col("r.band_sig"),
                F.col("l.doc_id") < F.col("r.doc_id"),
            ],
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
        .count()
    )


def jaccard_candidate_pairs(docs: DataFrame, k: int = 2) -> int:
    """Distinct in-block pairs sharing >= 1 word k-gram — the posting
    self-join frame under jaccard_pairs_exact's count method."""
    from delta_kernel_rs_spark.operators.dedup import with_word_shingles

    grams = (
        with_word_shingles(docs, text_col="text", k=k)
        .select("doc_id", "lang", F.explode("shingles").alias("g"))
        .distinct()
    )
    a, b = grams.alias("a"), grams.alias("b")
    return (
        a.join(
            b,
            on=[
                F.col("a.g") == F.col("b.g"),
                F.col("a.lang") == F.col("b.lang"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .distinct()
        .count()
    )


def winnowing_posting_stats(
    docs: DataFrame, k: int = 4, w: int = 4, max_df: int = 50
) -> tuple[int, int]:
    """(df-capped posting entries, candidate pairs) under
    winnowing_passage_pairs' inverted-index join."""
    from delta_kernel_rs_spark.operators.dedup import winnowing_fingerprints

    posting = (
        winnowing_fingerprints(docs, k=k, w=w)
        .select("doc_id", F.explode("fps").alias("h"))
    )
    rare = (
        posting.groupBy("h")
        .agg(F.count(F.lit(1)).alias("df_h"))
        .filter(F.col("df_h") <= max_df)
        .select("h")
    )
    kept = posting.join(rare, "h").persist()
    n_postings = kept.count()
    a, b = kept.alias("a"), kept.alias("b")
    n_pairs = (
        a.join(
            b,
            on=[
                F.col("a.h") == F.col("b.h"),
                F.col("a.doc_id") < F.col("b.doc_id"),
            ],
        )
        .select(F.col("a.doc_id").alias("x"), F.col("b.doc_id").alias("y"))
        .distinct()
        .count()
    )
    kept.unpersist()
    return n_postings, n_pairs


def substring_hit_stats(docs: DataFrame, k: int = 8) -> tuple[int, int]:
    """(duplicated-gram hit positions, merged output spans) under
    duplicated_token_spans — group-private vocabularies make duplicated
    grams group-local, so both counts grow linearly with the corpus.
    The hit frame is rebuilt from the operator's own gram construction
    so the counted frame IS the frame the operator windows over."""
    from delta_kernel_rs_spark.operators.dedup import (
        duplicated_token_spans,
        word_kgram_positions,
    )

    pos_grams = word_kgram_positions(docs, k=k)
    dup = (
        pos_grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .filter(F.col("n_occ") >= 2)
        .select("g")
    )
    n_hits = pos_grams.join(dup, "g").count()
    n_spans = duplicated_token_spans(docs, k=k).count()
    return n_hits, n_spans


def ivf_scored_pairs(emb: DataFrame, n_centroids: int) -> int:
    """(query, neighbor) pairs the IVF probe actually scores — with nlist
    scaled with the corpus (the honest IVF scale knob), per-query bucket
    size stays ~constant and this count grows with the QUERY set, not the
    corpus."""
    from delta_kernel_rs_spark.operators.similarity import ivf_assign

    centroids = emb.filter(F.col("vec_id") < n_centroids)
    assigned = ivf_assign(emb, centroids)
    queries = assigned.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "centroid_id"
    )
    bucket = assigned.select(F.col("vec_id").alias("neighbor_id"), "centroid_id")
    return (
        queries.join(bucket, on="centroid_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .count()
    )


def _force(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def _load(spark, fx_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{fx_dir}/{name}.parquet")


def measure_scale_point(spark, fx_dir: str, n_docs: int) -> dict:
    """Time each heavy operator once (after a warm-up pass) and collect
    its candidate counts at one corpus size."""
    from delta_kernel_rs_spark.operators.cluster import neardup_clusters
    from delta_kernel_rs_spark.operators.dedup import (
        duplicated_token_spans,
        jaccard_pairs_exact,
        neardup_pairs_minhash,
        winnowing_passage_pairs,
    )
    from delta_kernel_rs_spark.operators.packing import pack_documents
    from delta_kernel_rs_spark.operators.similarity import ivf_topk

    docs = _load(spark, fx_dir, "documents")
    emb = _load(spark, fx_dir, "embeddings")
    n_centroids = max(16, n_docs // 125)  # nlist scales with the corpus
    n_shards = max(8, n_docs // 250)  # per-shard packing stays constant

    ops = {
        "p02_minhash": lambda: neardup_pairs_minhash(docs, k=3, threshold=0.8),
        "p04_jaccard": lambda: jaccard_pairs_exact(
            docs, k=2, threshold=0.5, block_cols=["lang"]
        ),
        "p05_ivf": lambda: ivf_topk(emb, n_centroids=n_centroids, k=5),
        "p18_clusters": lambda: neardup_clusters(
            neardup_pairs_minhash(docs, k=3, threshold=0.8)
        ),
        "p24_packing": lambda: pack_documents(
            docs, capacity=256, n_shards=n_shards
        ),
        "p28_winnowing": lambda: winnowing_passage_pairs(
            docs, k=4, w=4, min_shared=2, max_df=50
        ),
        "p30_substring": lambda: duplicated_token_spans(docs, k=8),
    }
    walls: dict[str, float] = {}
    for name, build in ops.items():
        print(f"[bench_scale] n={n_docs} warm {name}", file=sys.stderr, flush=True)
        _force(build())  # warm-up: codegen + shuffles + caches
        t0 = time.perf_counter()
        _force(build())
        walls[name] = round(time.perf_counter() - t0, 3)
        print(
            f"[bench_scale] n={n_docs} {name} = {walls[name]}s",
            file=sys.stderr,
            flush=True,
        )

    print(f"[bench_scale] n={n_docs} counting probes", file=sys.stderr, flush=True)
    postings, win_pairs = winnowing_posting_stats(docs)
    sub_hits, sub_spans = substring_hit_stats(docs)
    counts = {
        "minhash_candidate_pairs": minhash_candidate_pairs(docs),
        "jaccard_candidate_pairs": jaccard_candidate_pairs(docs),
        "winnowing_postings": postings,
        "winnowing_candidate_pairs": win_pairs,
        "ivf_scored_pairs": ivf_scored_pairs(emb, n_centroids),
        "substring_hit_positions": sub_hits,
        "substring_spans": sub_spans,
        "neardup_edges": neardup_pairs_minhash(docs, k=3, threshold=0.8).count(),
        "packed_rows": pack_documents(docs, capacity=256, n_shards=n_shards).count(),
    }
    return {"n_docs": n_docs, "walls": walls, "counts": counts}


def main() -> int:
    import tempfile

    from delta_kernel_rs_spark.corpus import write_scale_fixture
    from delta_kernel_rs_spark.session import get_spark

    n1 = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2000"))
    factor = int(os.environ.get("SPARK_GRAFT_SCALE_FACTOR", "10"))
    spark = get_spark(app_name="dkrs-bench-scale")

    points = []
    with tempfile.TemporaryDirectory() as tmp:
        for scale in (1, factor):
            n = n1 * scale
            fx = f"{tmp}/x{scale}"
            write_scale_fixture(fx, n_docs=n, n_vecs=n, seed=11)
            points.append(measure_scale_point(spark, fx, n))

    lo, hi = points
    growth = {}
    ok = True
    for op, w1 in lo["walls"].items():
        w2 = hi["walls"][op]
        ratio = round(w2 / w1, 2) if w1 > 0 else None
        passed = ratio is None or ratio <= WALL_RATIO_MAX
        ok &= passed
        growth[op] = {"wall_1x": w1, f"wall_{factor}x": w2, "wall_ratio": ratio,
                      "pass": passed}
    for metric, c1 in lo["counts"].items():
        c2 = hi["counts"][metric]
        ratio = round(c2 / c1, 2) if c1 else None
        passed = ratio is None or ratio <= COUNT_RATIO_MAX * factor / 10
        ok &= passed
        growth[metric] = {"count_1x": c1, f"count_{factor}x": c2,
                          "count_ratio": ratio, "pass": passed}

    doc = {
        "metric": "scale_growth",
        "n_1x": lo["n_docs"],
        "factor": factor,
        "wall_ratio_max": WALL_RATIO_MAX,
        "count_ratio_max": COUNT_RATIO_MAX * factor / 10,
        "growth": growth,
        "pass": ok,
    }
    out_dir = Path(_REPO) / "bench"
    out_dir.mkdir(exist_ok=True)
    (out_dir / "scale_growth.json").write_text(json.dumps(doc, indent=1))
    print(json.dumps(doc, separators=(",", ":")))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
