"""Same-JVM alternating A/B probes for the r13 re-checks (VERDICT #5).

p17: bigram array materialize_column barrier (current) vs inline explode
     (the r11 shape).
p26: count(*) n_hits (current) vs countDistinct (the r11 shape).

Usage: python scripts/probe_ab_r13.py p17|p26 [pairs]
Alternates A/B within one JVM, min-of-pairs reported per variant.
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


def run_pairs(spark, variants, pairs):
    times = {name: [] for name, _ in variants}
    # warm-up both
    for name, fn in variants:
        noop(fn())
    for i in range(pairs):
        for name, fn in variants:
            spark.sparkContext.setJobDescription(f"{name} pass {i}")
            t0 = time.perf_counter()
            noop(fn())
            times[name].append(round(time.perf_counter() - t0, 3))
    for name, ts in times.items():
        print(f"{name:12s} min={min(ts):.3f} all={ts}")


def p17(spark, pairs):
    from pyspark.sql import functions as F

    from delta_kernel_rs_spark.operators.parallel import (
        ensure_min_parallelism,
        materialize_column,
    )
    from delta_kernel_rs_spark.queries.pipeline_queries import load_table

    ws = "split(text, ' ')"
    zip_expr = F.expr(
        f"zip_with(slice({ws}, 1, size({ws}) - 1), "
        f"slice({ws}, 2, size({ws}) - 1), "
        f"(a, b) -> concat(a, ' ', b))"
    )

    def top20(bigrams):
        return (
            bigrams.groupBy("bigram")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("bigram"))
            .limit(20)
        )

    def variant_mat():
        df = ensure_min_parallelism(load_table(spark, SF, "documents"))
        bg = materialize_column(df.select("text"), zip_expr, "__bg").select(
            F.explode(F.col("__bg")).alias("bigram")
        )
        return top20(bg)

    def variant_inline():
        df = ensure_min_parallelism(load_table(spark, SF, "documents"))
        bg = df.select("text").select(F.explode(zip_expr).alias("bigram"))
        return top20(bg)

    run_pairs(spark, [("mat(cur)", variant_mat), ("inline(r11)", variant_inline)], pairs)


def p26(spark, pairs):
    from pyspark.sql import functions as F

    from delta_kernel_rs_spark.operators.dedup import decontaminate_against
    from delta_kernel_rs_spark.queries.pipeline_queries import load_table

    def variant_count():
        docs = load_table(spark, SF, "documents")
        return decontaminate_against(
            docs.filter("doc_id % 10 != 0"), docs.filter("doc_id % 10 = 0"), n=8
        )

    # variant B: the r11 countDistinct form, inline replica
    def variant_distinct():
        from delta_kernel_rs_spark.operators.dedup import (
            ensure_min_parallelism,
        )
        from delta_kernel_rs_spark.operators.parallel import materialize_column

        docs = load_table(spark, SF, "documents")
        train = docs.filter("doc_id % 10 != 0")
        ev = docs.filter("doc_id % 10 = 0")

        def grams(df):
            ws = F.split(F.col("text"), " ")
            base = materialize_column(
                ensure_min_parallelism(df).filter(F.size(ws) >= 8), ws, "__ws"
            )
            g = F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("__ws") - 7),
                    lambda i: F.concat_ws(" ", F.slice("__ws", i, 8)),
                )
            )
            base = materialize_column(base, g, "__g")
            return base.select(F.col("doc_id"), F.explode(F.col("__g")).alias("gram"))

        eval_grams = grams(ev).select("gram").distinct()
        return (
            grams(train)
            .join(eval_grams, "gram")
            .groupBy("doc_id")
            .agg(
                F.countDistinct("gram").alias("n_hits"),
                F.min("gram").alias("first_gram"),
            )
        )

    run_pairs(
        spark,
        [("count(cur)", variant_count), ("cdist(r11)", variant_distinct)],
        pairs,
    )




def p02(spark, pairs):
    """Current Arrow banding vs the r12 JVM-shingle banding, same JVM."""
    from pyspark.sql import functions as F

    from delta_kernel_rs_spark.operators import dedup as dd
    from delta_kernel_rs_spark.queries.pipeline_queries import load_table

    def build(bands_fn):
        docs_raw = load_table(spark, SF, "documents")
        docs = dd.with_word_shingles(docs_raw, text_col="text", k=3)
        sets_df = docs.select(
            F.col("doc_id"), "shingles", F.size("shingles").alias("n_sh")
        )
        bands = bands_fn(docs_raw, sets_df)
        buckets = (
            bands.groupBy("band", "band_sig")
            .agg(F.sort_array(F.collect_list("doc_id")).alias("ids"))
            .filter(F.size("ids") >= 2)
        )
        from delta_kernel_rs_spark.operators.parallel import (
            materialize_column as _mat,
        )

        cands = (
            _mat(
                buckets,
                F.expr(
                    "flatten(transform(ids, (a, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "b -> struct(a AS doc_a, b AS doc_b))))"
                ),
                "__pairs",
            )
            .select(F.explode(F.col("__pairs")).alias("p"))
            .select("p.doc_a", "p.doc_b")
            .distinct()
        )
        inter = F.size(
            F.array_intersect(F.col("sa.shingles"), F.col("sb.shingles"))
        )
        j1 = cands.hint("shuffle_hash").join(
            sets_df.alias("sa"), F.col("doc_a") == F.col("sa.doc_id")
        )
        return (
            j1.hint("shuffle_hash")
            .join(sets_df.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
            .select(
                "doc_a",
                "doc_b",
                (inter.cast("double") / (F.col("sa.n_sh") + F.col("sb.n_sh") - inter)).alias("jaccard"),
            )
            .filter(F.col("jaccard") >= 0.8)
        )

    def arrow_bands(docs_raw, sets_df):
        return dd.minhash_band_rows_from_text(
            docs_raw, id_col="doc_id", text_col="text", k=3
        )

    def jvm_bands(docs_raw, sets_df):
        return dd.minhash_band_signatures(sets_df, id_col="doc_id")

    run_pairs(
        spark,
        [("arrow(cur)", lambda: build(arrow_bands)),
         ("jvm(r12)", lambda: build(jvm_bands))],
        pairs,
    )


def main():
    which = sys.argv[1]
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from delta_kernel_rs_spark.session import get_spark

    spark = get_spark("probe-ab", cpus="32")
    {"p17": p17, "p26": p26, "p02": p02}[which](spark, pairs)


if __name__ == "__main__":
    main()
