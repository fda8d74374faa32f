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


# ---------------------------------------------------------------------------
# Property tests: the window/band rewrites vs reference implementations
# (pandas merge_asof; brute-force inequality join) on random inputs.


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_row = st.tuples(
    st.integers(min_value=1, max_value=3),      # key
    st.integers(min_value=0, max_value=50),     # seconds offset
    st.integers(min_value=0, max_value=999),    # payload
)


def _mk(spark, rows, val_name):
    import pandas as pd

    pdf = pd.DataFrame(
        {
            "k": pd.Series([r[0] for r in rows], dtype="int64"),
            "ts": pd.to_datetime([r[1] for r in rows], unit="s"),
            val_name: pd.Series([r[2] for r in rows], dtype="int64"),
        }
    )
    return pdf, spark.createDataFrame(
        pdf, schema=f"k long, ts timestamp, {val_name} long"
    )


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    probe=st.lists(_row, min_size=1, max_size=12),
    build=st.lists(_row, min_size=0, max_size=12),
)
def test_asof_matches_pandas_merge_asof(spark, probe, build):
    import pandas as pd

    # one build row per (key, ts): the documented dedup precondition
    seen, bdd = set(), []
    for r in build:
        if (r[0], r[1]) not in seen:
            seen.add((r[0], r[1]))
            bdd.append(r)
    p_pdf, p_df = _mk(spark, probe, "pv")
    b_pdf, b_df = _mk(spark, bdd, "bv")

    got = asof_join(p_df, b_df, ["k"], "ts", ["bv"]).toPandas()
    exp = pd.merge_asof(
        p_pdf.sort_values(["ts", "k"], kind="stable").reset_index(drop=True),
        b_pdf.sort_values(["ts", "k"], kind="stable").reset_index(drop=True),
        on="ts", by="k", direction="backward", allow_exact_matches=True,
    )
    key = lambda df: sorted(
        (int(r.k), r.ts.value, int(r.pv), None if pd.isna(r.bv) else int(r.bv))
        for r in df.itertuples()
    )
    got = got.rename(columns={"bv_asof": "bv"})
    assert key(got) == key(exp)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    left=st.lists(_row, min_size=1, max_size=10),
    right=st.lists(_row, min_size=0, max_size=10),
)
def test_range_join_matches_bruteforce(spark, left, right):
    l_pdf, l_df = _mk(spark, left, "lv")
    r_pdf, r_df = _mk(spark, right, "rv")
    band_us = 7_000_000  # 7s band

    got = range_join(l_df, r_df, ["k"], "ts", "ts", band_us)
    got_pairs = sorted(
        (int(r.lv), int(r.rv)) for r in got.select("lv", "rv").collect()
    )
    exp_pairs = sorted(
        (int(lr.lv), int(rr.rv))
        for lr in l_pdf.itertuples()
        for rr in r_pdf.itertuples()
        if lr.k == rr.k
        and rr.ts.value // 1000 >= lr.ts.value // 1000 - band_us
        and rr.ts.value // 1000 < lr.ts.value // 1000
    )
    assert got_pairs == exp_pairs
