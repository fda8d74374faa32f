"""Temporal joins Spark lacks as built-ins: as-of join and range
(interval band) join, both in scale-correct shapes.

AS-OF JOIN — "for each probe row, the build row with the greatest
time <= probe time, per key" — is NOT expressible as an equi-join, and
the naive inequality join is a per-key cross product. The scalable
rewrite is the union-tag trick every columnar engine uses under the
hood: union both inputs, ONE window partitioned by key and ordered by
time with build rows sorting first at equal timestamps, and a running
``last(value, ignorenulls=True)`` carries the most recent build values
forward onto each probe row. One shuffle, no join at all, no per-key
blowup — skew in probe keys costs exactly what any window over that key
costs.

RANGE JOIN — "pair rows whose times fall within a band" — becomes a
band-bucketed equi-join: quantize time to buckets at least as wide as
the band, explode the probe side over the (constant, small) set of
candidate buckets, equi-join on (key, bucket), then apply the exact band
predicate. Candidates are bounded by bucket co-residency instead of the
per-key cross product, which is the difference between O(pairs-in-band)
and O(n^2) on a hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    probe: DataFrame,
    build: DataFrame,
    keys: list[str],
    time_col: str,
    build_cols: list[str],
    tolerance_expr: Column | None = None,
) -> DataFrame:
    """Backward as-of join: each probe row gains ``<c>_asof`` for every
    ``c`` in ``build_cols`` from the latest build row at-or-before its
    ``time_col``, plus ``asof_time`` (the matched build time, NULL when
    no build row precedes).

    Both inputs must share ``keys`` and ``time_col``. Build rows tied on
    (key, time) must be pre-deduplicated by the caller (one build row per
    (key, time)) — the match is otherwise ambiguous in ANY engine.
    ``tolerance_expr``: optional max probe-build time distance (an
    interval Column in the time column's units); matches farther back
    are nulled, mirroring pandas ``merge_asof(tolerance=...)``.
    """
    pcols = [c for c in probe.columns]
    p = probe.select(
        *pcols,
        F.lit(0).alias("__is_build"),
        *[F.lit(None).cast(build.schema[c].dataType).alias(f"__b_{c}") for c in build_cols],
        F.lit(None).cast(build.schema[time_col].dataType).alias("__b_t"),
    )
    b = build.select(
        *[
            F.col(c) if c in keys or c == time_col else F.lit(None).cast(probe.schema[c].dataType).alias(c)
            for c in pcols
        ],
        F.lit(1).alias("__is_build"),
        *[F.col(c).alias(f"__b_{c}") for c in build_cols],
        F.col(time_col).alias("__b_t"),
    )
    u = p.unionByName(b)
    # build rows sort FIRST at equal time: at-or-before includes ties
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(time_col).asc(), F.col("__is_build").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(F.col(f"__b_{c}"), ignorenulls=True).over(w).alias(f"{c}_asof")
        for c in build_cols
    ]
    t_carried = F.last(F.col("__b_t"), ignorenulls=True).over(w).alias("asof_time")
    out = u.select(*pcols, "__is_build", *carried, t_carried).filter(
        F.col("__is_build") == 0
    )
    if tolerance_expr is not None:
        keep = F.col(time_col) - F.col("asof_time") <= tolerance_expr
        out = out.select(
            *pcols,
            *[
                F.when(keep, F.col(f"{c}_asof")).alias(f"{c}_asof")
                for c in build_cols
            ],
            F.when(keep, F.col("asof_time")).alias("asof_time"),
        )
    return out.drop("__is_build")


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_time: str,
    right_time: str,
    band_us: int,
) -> DataFrame:
    """Pairs (left, right) on ``keys`` where ``right_time`` falls in
    ``[left_time - band_us, left_time)`` (microsecond-typed timestamps).

    Band-bucketed: both sides quantize to ``band_us``-wide buckets; the
    left side probes its own bucket and the one below (a band of width W
    spans at most two W-wide buckets), so the join is a plain equi-join
    on (keys, bucket) with the exact predicate applied after. Right
    columns are suffixed ``_r`` on name collisions.
    """
    lt = F.unix_micros(F.col(left_time))  # micros since epoch
    # exact integer bucket arithmetic (no double division on epoch micros)
    lbucket = F.expr(f"unix_micros({left_time}) DIV {band_us}")
    rbucket = F.expr(f"unix_micros({right_time}) DIV {band_us}")
    lb = left.withColumn("__bucket", F.explode(F.array(lbucket, lbucket - 1)))
    rb = right.withColumn("__bucket", rbucket)
    rb = rb.select(
        *[
            F.col(c).alias(f"{c}_r") if c in left.columns else F.col(c)
            for c in rb.columns
        ]
    )
    rtime = f"{right_time}_r" if right_time in left.columns else right_time
    rkeys = [(f"{k}_r" if k in left.columns else k) for k in keys]
    cond = F.lit(True)
    for k, rk in zip(keys, rkeys):
        cond = cond & (F.col(k) == F.col(rk))
    cond = cond & (lb["__bucket"] == rb["__bucket"])
    rt2 = F.unix_micros(F.col(rtime))
    band = (rt2 >= lt - F.lit(band_us)) & (rt2 < lt)
    return lb.join(rb, cond & band, "inner").drop("__bucket")
