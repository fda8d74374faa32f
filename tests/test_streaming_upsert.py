"""Streaming MERGE sink (streaming/upsert_sink.py): foreachBatch upserts
with set-transaction exactly-once, fed by the engine's own streaming
append source."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_kernel_rs_spark.sources.batch_source import register_batch_source
from delta_kernel_rs_spark.sources.merge import upsert
from delta_kernel_rs_spark.sources.table import DeltaTable
from delta_kernel_rs_spark.streaming.upsert_sink import streaming_upsert


def _kv(spark, rows):
    return spark.createDataFrame(rows, "k long, v string")


def _stream(spark, path):
    register_batch_source(spark)
    return (
        spark.readStream.format("delta_kernel")
        .option("path", path)
        .option("startingVersion", 0)
        .load()
    )


def _state(t):
    return sorted((r.k, r.v) for r in t.to_df().collect())


def test_streaming_upsert_end_to_end_and_restart(spark, tmp_path):
    src_path = str(tmp_path / "src")
    tgt_path = str(tmp_path / "tgt")
    ckpt = str(tmp_path / "ckpt")
    src = DeltaTable.create(spark, src_path, df=_kv(spark, [(1, "a"), (2, "b")]))
    tgt = DeltaTable.create(spark, tgt_path, df=_kv(spark, [(2, "OLD"), (9, "z")]))

    q = streaming_upsert(
        _stream(spark, src_path).select("k", "v"), tgt_path, ["k"], ckpt
    )
    q.processAllAvailable()
    q.stop()
    # 1 inserted, 2 updated over OLD, 9 untouched
    assert _state(tgt) == [(1, "a"), (2, "b"), (9, "z")]

    # restart with the same checkpoint: only the NEW commit is delivered
    src.append(_kv(spark, [(1, "a2"), (5, "e")]))
    q = streaming_upsert(
        _stream(spark, src_path).select("k", "v"), tgt_path, ["k"], ckpt
    )
    q.processAllAvailable()
    q.stop()
    assert _state(tgt) == [(1, "a2"), (2, "b"), (5, "e"), (9, "z")]


def test_upsert_txn_gate_is_exactly_once(spark, tmp_path):
    """A replayed (appId, batchId) merge must no-op before planning: the
    set-transaction gate (actions/set_transaction.rs) carries idempotence
    across foreachBatch re-delivery after checkpoint recovery."""
    path = str(tmp_path / "t")
    t = DeltaTable.create(spark, path, df=_kv(spark, [(1, "a"), (2, "b")]))

    v1 = upsert(t, _kv(spark, [(2, "B2"), (3, "c")]), ["k"],
                txn_app_id="q1", txn_version=0)
    assert _state(t) == [(1, "a"), (2, "B2"), (3, "c")]
    # exact replay of batch 0: no-op, no new version
    v2 = upsert(t, _kv(spark, [(2, "B2"), (3, "c")]), ["k"],
                txn_app_id="q1", txn_version=0)
    assert v2 == v1
    assert t.snapshot().version == v1
    # an older batch id is also refused; a newer one lands
    v3 = upsert(t, _kv(spark, [(4, "d")]), ["k"],
                txn_app_id="q1", txn_version=1)
    assert v3 == v1 + 1
    assert _state(t) == [(1, "a"), (2, "B2"), (3, "c"), (4, "d")]
    # a different app id is independent
    v4 = upsert(t, _kv(spark, [(5, "e")]), ["k"],
                txn_app_id="q2", txn_version=0)
    assert v4 == v3 + 1


def test_streaming_upsert_requires_streaming_df(spark, tmp_path):
    import pytest

    with pytest.raises(ValueError, match="streaming"):
        streaming_upsert(_kv(spark, [(1, "a")]), str(tmp_path / "t"), ["k"], "x")
