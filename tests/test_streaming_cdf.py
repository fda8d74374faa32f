"""Streaming CDF source tests: readStream over the engine's change feed
must match the batch CDF arms exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_kernel_rs_spark.sources.delete import delete_with_dvs
from delta_kernel_rs_spark.sources.table import DeltaTable
from delta_kernel_rs_spark.streaming import register_cdf_source

CDF_PROPS = {"delta.enableChangeDataFeed": "true"}


def _ints(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


@pytest.fixture()
def cdf_table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 30), properties=CDF_PROPS)
    t.append(_ints(spark, 30, 50))
    delete_with_dvs(t, "k % 4 = 0")
    return t


def _run_stream(spark, path, start=0, name="cdf_sink"):
    register_cdf_source(spark)
    q = (
        spark.readStream.format("delta_cdf")
        .option("path", path)
        .option("startingVersion", start)
        .load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name)


def test_stream_matches_batch_cdf(spark, cdf_table):
    got = _run_stream(spark, cdf_table.path, name="s1")
    batch = cdf_table.changes(0)
    a = {(r.k, r._change_type, r._commit_version) for r in got.collect()}
    b = {(r.k, r._change_type, r._commit_version) for r in batch.collect()}
    assert a == b
    # commit timestamps line up too (same mtime-ms source)
    ts_a = {r._commit_version: r._commit_timestamp for r in got.collect()}
    ts_b = {r._commit_version: r._commit_timestamp for r in batch.collect()}
    assert ts_a == ts_b


def test_stream_starting_version_skips_history(spark, cdf_table):
    got = _run_stream(spark, cdf_table.path, start=2, name="s2")
    rows = got.collect()
    assert {r._commit_version for r in rows} == {2}
    assert all(r._change_type == "delete" for r in rows)
    assert {r.k for r in rows} == {k for k in range(50) if k % 4 == 0}


def test_stream_requires_cdf_enabled(spark, tmp_path):
    path = str(tmp_path / "plain")
    DeltaTable.create(spark, path, df=_ints(spark, 0, 5))
    register_cdf_source(spark)
    q = (
        spark.readStream.format("delta_cdf")
        .option("path", path)
        .load()
        .writeStream.format("memory")
        .queryName("s3")
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="change data feed"):
        q.awaitTermination(120)


def test_cdf_stream_max_commits_per_trigger(spark, tmp_path):
    """maxCommitsPerTrigger bounds each micro-batch's commit range, and
    the consumed floor survives offset rewinds without re-emitting."""
    from delta_kernel_rs_spark.sources.table import DeltaTable
    from delta_kernel_rs_spark.streaming.cdf_source import DeltaCdfStreamReader

    path = str(tmp_path / "t")
    t = DeltaTable.create(
        spark,
        path,
        df=spark.range(3).toDF("x"),
        properties={"delta.enableChangeDataFeed": "true"},
    )
    for i in range(3):
        t.append(spark.range(3 * (i + 1), 3 * (i + 2)).toDF("x"), auto_checkpoint=False)
    # versions 0..3 exist
    r = DeltaCdfStreamReader(None, {"path": path, "maxcommitspertrigger": "2"})
    assert r.latestOffset() == {"version": 2}
    assert r.latestOffset() == {"version": 4}
    assert r.latestOffset() == {"version": 4}  # caught up

    # restart at a checkpoint of version 3: the rewound reader's floor
    # re-syncs from Spark's authoritative batch start
    r2 = DeltaCdfStreamReader(None, {"path": path, "maxcommitspertrigger": "1"})
    e1 = r2.latestOffset()
    assert e1 == {"version": 1}  # rewound below the checkpoint
    assert r2.partitions({"version": 3}, e1) == []  # nothing re-read
    assert r2.latestOffset() == {"version": 4}  # resumes from the floor

    with pytest.raises(ValueError, match="maxCommitsPerTrigger"):
        DeltaCdfStreamReader(None, {"path": path, "maxcommitspertrigger": "0"})


def test_stream_sees_update_images(spark, tmp_path):
    """UPDATE's cdc files (update_preimage/postimage) flow through the
    streaming source exactly like the batch arms."""
    path = str(tmp_path / "upd")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 10), properties=CDF_PROPS)
    t.update("k >= 8", {"k": "k + 100"})
    got = _run_stream(spark, path, name="upd_sink").collect()
    by_type = {}
    for r in got:
        by_type.setdefault(r._change_type, set()).add(r.k)
    assert by_type["update_preimage"] == {8, 9}
    assert by_type["update_postimage"] == {108, 109}
    # the initial create arrives as inserts; kept rows emit nothing else
    assert by_type["insert"] == set(range(10))


def test_stream_readchangefeed_via_delta_kernel_format(spark, cdf_table):
    """delta-spark idiom: readStream + readChangeFeed on the SAME
    delta_kernel format serves the streaming change feed, identical to
    the explicit delta_cdf spelling and the batch CDF arms."""
    from delta_kernel_rs_spark.sources.batch_source import register_batch_source

    register_batch_source(spark)
    q = (
        spark.readStream.format("delta_kernel")
        .option("path", cdf_table.path)
        .option("readChangeFeed", "true")
        .option("startingVersion", 0)
        .load()
        .writeStream.format("memory")
        .queryName("s_rk")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("s_rk")
    batch = cdf_table.changes(0)
    a = {(r.k, r._change_type, r._commit_version) for r in got.collect()}
    b = {(r.k, r._change_type, r._commit_version) for r in batch.collect()}
    assert a == b


def _two_col(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def test_stream_readchangefeed_honors_columns_option(spark, tmp_path):
    """The facade's columns option prunes the DECLARED schema, so the
    streaming reader must emit exactly those fields — a full-schema batch
    against a pruned declaration would misbind positionally."""
    from delta_kernel_rs_spark.sources.batch_source import register_batch_source

    path = str(tmp_path / "cols")
    t = DeltaTable.create(spark, path, df=_two_col(spark, 0, 20), properties=CDF_PROPS)
    t.append(_two_col(spark, 20, 30))
    register_batch_source(spark)
    q = (
        spark.readStream.format("delta_kernel")
        .option("path", path)
        .option("readChangeFeed", "true")
        .option("startingVersion", 0)
        .option("columns", "v")
        .load()
        .writeStream.format("memory")
        .queryName("s_cols")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("s_cols")
    assert got.columns == ["v", "_change_type", "_commit_version", "_commit_timestamp"]
    want = t.changes(0).select("v", "_change_type", "_commit_version")
    assert {(r.v, r._change_type, r._commit_version) for r in got.collect()} == {
        tuple(r) for r in want.collect()
    }


def test_stream_readchangefeed_rejects_batch_only_options(spark, cdf_table):
    """endingVersion/endingTimestamp/predicate cannot be honored by the
    unbounded stream — they must raise, never silently no-op (the same
    fail-fast rule the batch CDF reader applies)."""
    from delta_kernel_rs_spark.sources.batch_source import register_batch_source

    register_batch_source(spark)

    def start(**opts):
        r = (
            spark.readStream.format("delta_kernel")
            .option("path", cdf_table.path)
            .option("readChangeFeed", "true")
            .option("startingVersion", 0)
        )
        for k, v in opts.items():
            r = r.option(k, v)
        q = (
            r.load()
            .writeStream.format("memory")
            .queryName("s_rej")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()

    for bad in (
        {"endingVersion": 1},
        {"endingTimestamp": "2100-01-01T00:00:00"},
        {"predicate": "k > 3"},
    ):
        with pytest.raises(Exception, match="not supported for streaming"):
            start(**bad)


def test_stream_starting_timestamp(spark, cdf_table):
    """startingTimestamp resolves to the first commit at/after it (same
    rule as the batch facade and the append stream source)."""
    from delta_kernel_rs_spark.sources.batch_source import register_batch_source

    register_batch_source(spark)
    # epoch 0 → everything
    q = (
        spark.readStream.format("delta_kernel")
        .option("path", cdf_table.path)
        .option("readChangeFeed", "true")
        .option("startingTimestamp", "0")
        .load()
        .writeStream.format("memory")
        .queryName("s_ts")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("s_ts")
    batch = cdf_table.changes(0)
    assert got.count() == batch.count()


def test_stream_trigger_never_lists_full_log(spark, cdf_table, monkeypatch):
    """Per-trigger planning and offset resolution must be O(range):
    latestOffset uses list_from (start-key listing) and the shared CDF
    planner stats only the in-range commit files — list_dir over the
    whole _delta_log is forbidden on the trigger path."""
    from pyspark.sql import types as T

    from delta_kernel_rs_spark.streaming.cdf_source import (
        CDF_COLS,
        DeltaCdfStreamReader,
    )

    schema = T.StructType(
        [T.StructField("k", T.LongType(), True)] + CDF_COLS
    )
    reader = DeltaCdfStreamReader(
        schema, {"path": cdf_table.path, "startingVersion": "0"}
    )

    def boom(*a, **k):
        raise AssertionError("list_dir called on the trigger path")

    monkeypatch.setattr(type(reader._storage), "list_dir", boom)
    start = reader.initialOffset()
    end = reader.latestOffset()
    assert end["version"] > start["version"]
    parts = reader.partitions(start, end)
    assert parts


def test_stream_matches_batch_cdf_random_history(spark, tmp_path):
    """Streaming/batch CDF equivalence over a RANDOM DML history (appends,
    CoW/DV deletes, updates, upserts, replaceWhere, OPTIMIZE, RESTORE,
    checkpoints, log compaction — the history-fuzz op pool), chunked by a
    small maxCommitsPerTrigger so the stream crosses many micro-batch
    boundaries. Every pinned streaming test uses a 3-commit fixture; this
    asserts the planner equivalence on a history nobody hand-picked."""
    import random

    from delta_kernel_rs_spark.sources.cdf import table_changes
    from test_history_fuzz import _run_history

    rng = random.Random(20260819)
    path = str(tmp_path / "t")
    t, states, trace = _run_history(spark, path, rng)
    tip = t.snapshot().version

    register_cdf_source(spark)
    # processingTime trigger: rate limits are per-trigger there (under
    # availableNow the Python source API caps the whole run at ONE
    # latestOffset — see the pinned caveat test below), so the stream
    # crosses many rate-limited micro-batch boundaries before catching up
    q = (
        spark.readStream.format("delta_cdf")
        .option("path", path)
        .option("startingVersion", 1)
        .option("maxCommitsPerTrigger", rng.randrange(1, 4))
        .load()
        .writeStream.format("memory")
        .queryName("cdf_fuzz_sink")
        .trigger(processingTime="1 seconds")
        .start()
    )
    want = {
        (r.uid, r.val, r.cat, r._change_type, r._commit_version)
        for r in table_changes(spark, path, 1, tip).collect()
    }
    import time as _time

    deadline = _time.time() + 240
    got: set = set()
    while _time.time() < deadline:
        got = {
            (r.uid, r.val, r.cat, r._change_type, r._commit_version)
            for r in spark.table("cdf_fuzz_sink").collect()
        }
        if got >= want:
            break
        _time.sleep(2)
    q.stop()
    assert got == want, f"trace={trace}"
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2, "rate limit never split the backfill"


def test_available_now_with_rate_limit_is_one_bounded_run(spark, tmp_path):
    """PINNED LIBRARY LIMITATION: the Python DataSourceStreamReader API
    has no SupportsTriggerAvailableNow hook, so Trigger.AvailableNow
    captures ONE latestOffset() — a rate-limited stream processes exactly
    one bounded batch per run. The checkpoint advances and a re-run
    continues (nothing lost or re-emitted), but one run is NOT a full
    backfill. If Spark ever grows the hook, this pin should break and the
    sources should adopt it (caveat documented in streaming/cdf_source.py
    and sources/batch_source.py)."""
    path = str(tmp_path / "t")
    t = DeltaTable.create(
        spark, path, df=_ints(spark, 0, 3), properties=CDF_PROPS
    )
    for i in range(4):
        t.append(_ints(spark, 10 + 3 * i, 13 + 3 * i), auto_checkpoint=False)
    register_cdf_source(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def one_run():
        q = (
            spark.readStream.format("delta_cdf")
            .option("path", path)
            .option("startingVersion", 0)
            .option("maxCommitsPerTrigger", 2)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r._commit_version for r in spark.read.parquet(out).collect()
        }

    assert one_run() == {0, 1}  # one bounded batch, not a full backfill
    assert one_run() == {0, 1, 2, 3}  # re-run continues from the checkpoint
    assert one_run() == {0, 1, 2, 3, 4}  # to completion; nothing lost/re-read


def test_available_now_backfill_completes_in_one_call(spark, tmp_path):
    """The driver-side catch-up helper closes the AvailableNow usability
    gap: one call loops bounded runs against one checkpoint until the
    offset stops advancing — a rate-limited 10-commit table backfills
    fully and matches the batch CDF exactly."""
    from delta_kernel_rs_spark.sources.cdf import table_changes
    from delta_kernel_rs_spark.streaming import available_now_backfill

    path = str(tmp_path / "t")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 3), properties=CDF_PROPS)
    for i in range(9):
        t.append(_ints(spark, 10 + 3 * i, 13 + 3 * i), auto_checkpoint=False)
    # versions 0..9 exist
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    runs = available_now_backfill(
        spark,
        path,
        checkpoint_location=ckpt,
        sink_format="parquet",
        sink_options={"path": out},
        source_options={"startingVersion": 0, "maxCommitsPerTrigger": 2},
        run_timeout_sec=120,
    )
    # 10 commits / 2 per run = 5 data runs + 1 no-advance verification run
    assert runs == 6
    got = {
        (r.k, r._change_type, r._commit_version)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.k, r._change_type, r._commit_version)
        for r in table_changes(spark, path, 0).collect()
    }
    assert got == want
    # a second call against the same checkpoint is a cheap no-op: one
    # verification run, nothing re-emitted
    assert available_now_backfill(
        spark,
        path,
        checkpoint_location=ckpt,
        sink_format="parquet",
        sink_options={"path": out},
        source_options={"startingVersion": 0, "maxCommitsPerTrigger": 2},
        run_timeout_sec=120,
    ) == 1
    assert {
        (r.k, r._change_type, r._commit_version)
        for r in spark.read.parquet(out).collect()
    } == want
