"""Input fan-out for compute-heavy operators.

Spark plans file scans by byte ranges, but a parquet file is only
splittable at row-group boundaries — a small input (or any file written
as a single row group) plans as ONE scan task, serializing all
pre-shuffle compute (shingling, hashing, vector norms) onto one core no
matter how many the cluster has.

The operators in this package do orders-of-magnitude more per-row work
than a row shuffle costs, so when the scan's partitioning is below the
cluster's parallelism they fan the input out with an explicit
round-robin repartition first. The explicit partition count keeps AQE
from coalescing it back down (AQE only coalesces ENSURE_REQUIREMENTS
shuffles, not user repartitions). On real at-scale inputs — thousands of
row groups at 100 TB — the guard makes this a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition ``df`` up to cluster parallelism if its
    current plan has fewer partitions; identity otherwise (the 100 TB
    case, where scans already carry thousands of splits)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
