"""As-of and range joins (operators/temporal.py): union-tag window
rewrite and band-bucketed equi-join — semantics, ties, band edges, and
plan shape (no per-key cross products)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from delta_kernel_rs_spark.operators.temporal import asof_join, range_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _probe(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01T10:00:00"), 100),
            (1, _ts("2024-01-01T12:00:00"), 101),
            (2, _ts("2024-01-01T09:00:00"), 200),  # before any build row
            (3, _ts("2024-01-01T10:00:00"), 300),  # key with no build rows
        ],
        "k long, ts timestamp, pid long",
    )


def _build(spark):
    return spark.createDataFrame(
        [
            (1, _ts("2024-01-01T09:30:00"), 10),
            (1, _ts("2024-01-01T12:00:00"), 11),  # exact tie with probe 101
            (2, _ts("2024-01-01T11:00:00"), 20),
        ],
        "k long, ts timestamp, bid long",
    )


def test_asof_backward_with_ties_and_misses(spark):
    out = asof_join(_probe(spark), _build(spark), ["k"], "ts", ["bid"])
    got = {r.pid: (r.bid_asof, r.asof_time) for r in out.collect()}
    assert got[100] == (10, _ts("2024-01-01T09:30:00"))
    # at-or-before: the equal-timestamp build row matches
    assert got[101] == (11, _ts("2024-01-01T12:00:00"))
    # probe earlier than every build row of its key -> NULL
    assert got[200] == (None, None)
    # key with no build rows at all -> NULL
    assert got[300] == (None, None)
    assert out.count() == 4  # build rows never leak into the output


def test_asof_tolerance_nulls_stale_matches(spark):
    out = asof_join(
        _probe(spark), _build(spark), ["k"], "ts", ["bid"],
        tolerance_expr=F.expr("INTERVAL 1 HOUR"),
    )
    got = {r.pid: r.bid_asof for r in out.collect()}
    assert got[100] == 10   # 30 min back: inside tolerance
    assert got[101] == 11   # exact tie: inside
    assert got[200] is None


def test_asof_plan_has_no_join(spark):
    """The rewrite must be window-only: no join operator anywhere."""
    out = asof_join(_probe(spark), _build(spark), ["k"], "ts", ["bid"])
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


def test_range_join_band_edges(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:00"), 9)], "k long, ts timestamp, lid long"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T11:00:00"), 1),  # exactly band ago: included
            (1, _ts("2024-01-01T11:30:00"), 2),  # inside
            (1, _ts("2024-01-01T12:00:00"), 3),  # equal: excluded (half-open)
            (1, _ts("2024-01-01T10:59:59"), 4),  # too old
            (2, _ts("2024-01-01T11:30:00"), 5),  # other key
        ],
        "k long, ts timestamp, rid long",
    )
    out = range_join(left, right, ["k"], "ts", "ts", 3_600_000_000)
    assert sorted(r.rid for r in out.collect()) == [1, 2]


def test_range_join_crosses_bucket_boundary(spark):
    """A band window straddling a bucket boundary must still pair (the
    explode over {bucket, bucket-1} covers it)."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T12:00:30"), 9)], "k long, ts timestamp, lid long"
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T11:59:50"), 1)], "k long, ts timestamp, rid long"
    )
    out = range_join(left, right, ["k"], "ts", "ts", 60_000_000)  # 1 min band
    assert [r.rid for r in out.collect()] == [1]
