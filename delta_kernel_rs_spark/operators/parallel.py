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


def materialize_column(df: DataFrame, expr, alias: str) -> DataFrame:
    """Append ``expr`` as a column evaluated EXACTLY ONCE per row.

    Catalyst's CollapseProject inlines an aliased expression into every
    downstream reference, and codegen's common-subexpression elimination
    does not reach inside higher-order-function lambdas — so an aliased
    O(L) array construction referenced per-element in a ``transform``
    lambda silently becomes O(L^2) per row (measured 75 ms/doc on the
    winnowing fingerprint projection — found by the round-12 scale-growth
    harness, where the 10x corpus point stalled for minutes while the
    operator "passed" at 1x behind its persist cache).

    Routing the value through ``explode(array(expr))`` inserts a Generate
    node between producer and consumers: the expression is evaluated once
    per row and downstream references read a plain attribute. Generate is
    row-preserving here (the array always has exactly one element, null
    or not), map-side, shuffle-free, and codegen-friendly — and it is a
    collapse barrier the optimizer will not inline through.
    """
    from pyspark.sql import functions as F

    return df.select("*", F.explode(F.array(expr)).alias(alias))
