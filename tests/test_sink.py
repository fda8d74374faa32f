"""Write path of the delta_kernel data source: batch append + streaming sink.

Executor-side Arrow parquet writes with footer-contract stats; driver-side
commit through the SparkSession-free pycommit path; streaming micro-batches
are exactly-once via per-(appId, batchId) txn actions.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_kernel_rs_spark.sources.batch_source import register_batch_source
from delta_kernel_rs_spark.sources.log_segment import build_log_segment
from delta_kernel_rs_spark.sources.pycommit import commit_append, latest_txn_version
from delta_kernel_rs_spark.sources.storage import LocalStorage
from delta_kernel_rs_spark.sources.table import DeltaTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_batch_write_append(spark, tmp_path):
    path = str(tmp_path / "t")
    t = DeltaTable.create(spark, path, df=spark.range(10).toDF("x"))
    register_batch_source(spark)
    (
        spark.range(10, 25)
        .toDF("x")
        .write.format("delta_kernel")
        .option("path", path)
        .mode("append")
        .save()
    )
    assert _rows(t.to_df()) == [(i,) for i in range(25)]
    # footer-contract stats power skipping: scan with a predicate prunes
    files_all = t.snapshot().scan().scan_files_df().count()
    files_hit = t.snapshot().scan(predicate="x >= 20").scan_files_df().count()
    assert files_hit < files_all


def test_batch_write_partitioned(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(20).select(
        "id", (F.col("id") % 3).cast("long").alias("bucket")
    )
    t = DeltaTable.create(spark, path, df=df, partition_by=["bucket"])
    register_batch_source(spark)
    more = spark.range(20, 30).select(
        "id", (F.col("id") % 3).cast("long").alias("bucket")
    )
    more.write.format("delta_kernel").option("path", path).mode("append").save()
    assert _rows(t.to_df()) == _rows(df.unionByName(more))
    # partition pruning still works over sink-written files
    pruned = t.snapshot().scan(predicate="bucket = 1").to_df()
    assert _rows(pruned) == _rows(df.unionByName(more).filter("bucket = 1"))


def test_batch_write_schema_mismatch(spark, tmp_path):
    path = str(tmp_path / "t")
    DeltaTable.create(spark, path, df=spark.range(5).toDF("x"))
    register_batch_source(spark)
    with pytest.raises(Exception):
        (
            spark.range(5)
            .select(F.col("id").alias("wrong"))
            .write.format("delta_kernel")
            .option("path", path)
            .mode("append")
            .save()
        )


def test_streaming_sink_available_now(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    path = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    spark.range(50).toDF("x").write.parquet(src_dir)
    t = DeltaTable.create(spark, path, df=spark.range(0).toDF("x"))
    register_batch_source(spark)

    stream = spark.readStream.schema("x long").parquet(src_dir)
    q = (
        stream.writeStream.format("delta_kernel")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert _rows(t.to_df()) == [(i,) for i in range(50)]

    # restart with the same checkpoint and no new input: no extra commits
    v_before = t.snapshot().version
    q2 = (
        spark.readStream.schema("x long")
        .parquet(src_dir)
        .writeStream.format("delta_kernel")
        .option("path", path)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert t.snapshot().version == v_before
    assert t.to_df().count() == 50


def test_pycommit_replay_is_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    t = DeltaTable.create(spark, path, df=spark.range(3).toDF("x"))
    storage = LocalStorage()
    v1 = commit_append(storage, path, [], operation="STREAMING UPDATE",
                       app_id="q1", txn_version=7)
    assert v1 == 1
    # same (app, batch) replays as a no-op
    assert commit_append(storage, path, [], app_id="q1", txn_version=7) is None
    # older batch also no-op; newer commits
    assert commit_append(storage, path, [], app_id="q1", txn_version=6) is None
    assert commit_append(storage, path, [], app_id="q1", txn_version=8) == 2
    seg = build_log_segment(storage, path)
    assert latest_txn_version(storage, seg, "q1") == 8
    # txn survives a checkpoint (checkpoint parquet fallback)
    t.checkpoint()
    seg2 = build_log_segment(storage, path)
    assert not seg2.commit_files or seg2.checkpoint_version is not None
    assert latest_txn_version(storage, seg2, "q1") == 8


def _append(df, path):
    df.write.format("delta_kernel").option("path", path).mode("append").save()


def test_sink_enforces_check_constraint(spark, tmp_path):
    path = str(tmp_path / "t")
    t = DeltaTable.create(
        spark,
        path,
        df=spark.range(10).toDF("x"),
        properties={"delta.constraints.x_small": "x < 100"},
    )
    register_batch_source(spark)
    _append(spark.range(10, 20).toDF("x"), path)  # conforming rows pass
    v_before = t.snapshot().version
    with pytest.raises(Exception, match="x_small"):
        _append(spark.range(95, 105).toDF("x"), path)
    assert t.snapshot().version == v_before  # violating batch committed nothing
    assert t.to_df().count() == 20


def test_sink_enforces_not_null_invariant(spark, tmp_path):
    path = str(tmp_path / "t")
    schema = T.StructType([T.StructField("k", T.LongType(), False)])
    t = DeltaTable.create(spark, path, schema=schema)
    register_batch_source(spark)
    with pytest.raises(Exception, match="NOT NULL"):
        _append(spark.range(1).select(F.lit(None).cast("long").alias("k")), path)
    assert t.to_df().count() == 0
    _append(spark.range(3).toDF("k"), path)
    assert t.to_df().count() == 3


def test_sink_verifies_generated_column(spark, tmp_path):
    path = str(tmp_path / "t")
    schema = T.StructType(
        [
            T.StructField("x", T.LongType()),
            T.StructField(
                "x2", T.LongType(), True, {"delta.generationExpression": "x * 2"}
            ),
        ]
    )
    t = DeltaTable.create(spark, path, schema=schema)
    register_batch_source(spark)
    good = spark.range(4).toDF("x").withColumn("x2", F.col("x") * 2)
    _append(good, path)
    assert t.to_df().count() == 4
    bad = spark.range(4, 6).toDF("x").withColumn("x2", F.col("x") * 3)
    with pytest.raises(Exception, match="generated"):
        _append(bad, path)
    assert t.to_df().count() == 4


def test_sink_rejects_identity_table(spark, tmp_path):
    path = str(tmp_path / "t")
    schema = T.StructType(
        [
            T.StructField("x", T.LongType()),
            T.StructField(
                "id",
                T.LongType(),
                True,
                {"delta.identity.start": 1, "delta.identity.step": 1},
            ),
        ]
    )
    DeltaTable.create(spark, path, schema=schema)
    register_batch_source(spark)
    with pytest.raises(Exception, match="identity"):
        _append(
            spark.range(3).toDF("x").withColumn("id", F.col("x")), path
        )


def test_sink_rejects_unknown_writer_feature(spark, tmp_path):
    path = str(tmp_path / "t")
    DeltaTable.create(spark, path, df=spark.range(3).toDF("x"))
    # simulate a protocol upgrade to a feature this sink cannot enforce
    import json as _json
    import os

    log = os.path.join(path, "_delta_log")
    with open(os.path.join(log, "00000000000000000001.json"), "w") as fh:
        fh.write(
            _json.dumps(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": 7,
                        "writerFeatures": ["futureFeatureX"],
                    }
                }
            )
            + "\n"
        )
    register_batch_source(spark)
    with pytest.raises(Exception, match="futureFeatureX"):
        _append(spark.range(3, 6).toDF("x"), path)


def test_batch_reader_rejects_unknown_reader_protocol(spark, tmp_path):
    path = str(tmp_path / "t")
    DeltaTable.create(spark, path, df=spark.range(3).toDF("x"))
    import json as _json
    import os

    log = os.path.join(path, "_delta_log")
    with open(os.path.join(log, "00000000000000000001.json"), "w") as fh:
        fh.write(
            _json.dumps(
                {"protocol": {"minReaderVersion": 9, "minWriterVersion": 9}}
            )
            + "\n"
        )
    register_batch_source(spark)
    with pytest.raises(Exception, match="minReaderVersion"):
        spark.read.format("delta_kernel").option("path", path).load().collect()


def test_sink_rejects_type_mismatch(spark, tmp_path):
    path = str(tmp_path / "t")
    DeltaTable.create(spark, path, df=spark.range(3).toDF("x"))
    register_batch_source(spark)
    with pytest.raises(Exception, match="type"):
        _append(
            spark.range(3).select(F.col("id").cast("string").alias("x")), path
        )
    # lossless widening is accepted: int input into a bigint column
    _append(spark.range(3, 6).select(F.col("id").cast("int").alias("x")), path)


def test_sink_rejects_row_tracking_table(spark, tmp_path):
    path = str(tmp_path / "t")
    DeltaTable.create(
        spark,
        path,
        df=spark.range(5).toDF("x"),
        properties={"delta.enableRowTracking": "true"},
    )
    storage = LocalStorage()
    from delta_kernel_rs_spark.sources.pycommit import PyCommitError

    with pytest.raises(PyCommitError):
        commit_append(storage, path, [], app_id="q", txn_version=0)


def test_batch_write_across_schema_evolution_cm(spark, tmp_path):
    """Facade appends interleaved with ADD/RENAME/DROP COLUMN under column
    mapping: the sink must pick up each evolved schema (physical names,
    field ids) at write time — exercised nowhere else before r11."""
    from pyspark.sql import types as T

    path = str(tmp_path / "t")
    t = DeltaTable.create(
        spark,
        path,
        df=spark.createDataFrame([(0, "a")], "k long, cat string"),
        partition_by=["cat"],
        properties={"delta.columnMapping.mode": "name"},
    )
    register_batch_source(spark)
    t.add_column("extra", T.LongType())
    spark.createDataFrame([(1, "b", 7)], "k long, cat string, extra long").write.format(
        "delta_kernel"
    ).option("path", path).mode("append").save()
    assert _rows(t.to_df()) == [(0, "a", None), (1, "b", 7)]
    t.rename_column("extra", "extra2")
    spark.createDataFrame(
        [(2, "c", 8)], "k long, cat string, extra2 long"
    ).write.format("delta_kernel").option("path", path).mode("append").save()
    assert _rows(t.to_df()) == [(0, "a", None), (1, "b", 7), (2, "c", 8)]
    t.drop_column("extra2")
    spark.createDataFrame([(3, "d")], "k long, cat string").write.format(
        "delta_kernel"
    ).option("path", path).mode("append").save()
    want = [(0, "a"), (1, "b"), (2, "c"), (3, "d")]
    assert _rows(t.to_df()) == want
    got = spark.read.format("delta_kernel").option("path", path).load()
    assert _rows(got.select("k", "cat")) == want
