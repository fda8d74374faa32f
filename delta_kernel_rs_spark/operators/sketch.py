"""Cross-engine-deterministic cardinality sketch: K-Minimum-Values.

``approx_count_distinct`` (HLL) differs between engines, so it can never
pass a bit-exact oracle. KMV gives a real sketch with the SAME estimate
everywhere: hash every distinct value with md5, keep the k smallest
hashes, and estimate

    d_hat = (k - 1) * 2^32 / h_k        (h_k = k-th smallest 32-bit hash)

with the exact count when a group holds fewer than k distinct values
(the standard KMV small-range rule). md5-hex is byte-identical in Spark
and DuckDB, and the 8-hex-char → integer fold plus one double division
are IEEE-identical, so the estimate hash-matches the oracle exactly.

Scale shape: one distinct shuffle on (group, value), then a rank-limited
window per group — Spark's WindowGroupLimit pushes the k-cap below the
sort, so each group materializes k rows, not its full distinct set. The
driver never sees a hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HEX_SPACE = 16**8  # 8 hex chars = 32 bits of hash space

#: 8-hex-char → BIGINT via a per-char fold: identical integer math in
#: Spark and DuckDB (no conv()/unhex dialect divergence).
_HEX_FOLD = (
    "aggregate(transform(split(__hex, ''), "
    "ch -> CAST(instr('0123456789abcdef', ch) - 1 AS BIGINT)), "
    "0L, (acc, v) -> acc * 16 + v)"
)


def kmv_distinct_estimate(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """Per-group distinct-count estimate: group columns + ``n_distinct_est``
    (DOUBLE) + ``n_kept`` (the sketch size actually used)."""
    sk = (
        df.select(*group_cols, F.col(value_col).alias("__v"))
        .filter(F.col("__v").isNotNull())  # count-distinct ignores NULL
        .distinct()
        .withColumn("__hex", F.substring(F.md5(F.col("__v").cast("string")), 1, 8))
        .withColumn("__h", F.expr(_HEX_FOLD))
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy(*group_cols).orderBy("__h", "__v")
            ),
        )
        .filter(F.col("__rn") <= k)
    )
    kth = F.max(F.col("__h"))
    n_kept = F.count(F.lit(1))
    est = F.when(n_kept < F.lit(k), n_kept.cast("double")).otherwise(
        (F.lit(float(k - 1)) * F.lit(float(HEX_SPACE))) / kth.cast("double")
    )
    return sk.groupBy(*group_cols).agg(
        est.alias("n_distinct_est"), n_kept.cast("int").alias("n_kept")
    )
