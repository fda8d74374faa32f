"""Column-mapping mutations, schema evolution, V2 checkpoint round-trips."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_kernel_rs_spark.functions.schema_codec import (
    COLUMN_MAPPING_PHYSICAL_NAME_KEY,
)
from delta_kernel_rs_spark.functions.schema_diff import (
    SchemaEvolutionError,
    validate_schema_evolution,
)
from delta_kernel_rs_spark.sources.delete import delete_where, delete_with_dvs
from delta_kernel_rs_spark.sources.table import DeltaTable

CM_PROPS = {"delta.columnMapping.mode": "name"}


def _ints(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") * 2).alias("v"),
        (F.col("id") % 3).cast("string").alias("part"),
    )


# -- column mapping -----------------------------------------------------------


def test_cm_create_append_read(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 40), properties=CM_PROPS)
    t.append(_ints(spark, 40, 60))
    snap = t.snapshot()
    # schema carries physical names; parquet columns are col-<uuid>
    assert all(
        COLUMN_MAPPING_PHYSICAL_NAME_KEY in (f.metadata or {})
        for f in snap.schema.fields
    )
    some_file = snap.scan().files()[0].path
    phys_cols = spark.read.parquet(some_file).columns
    assert all(c.startswith("col-") for c in phys_cols)
    # but reads present logical names
    df = t.to_df()
    assert sorted(df.columns) == ["k", "part", "v"]
    assert df.count() == 60


def test_cm_partitioned_mutations(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(
        spark,
        path,
        df=_ints(spark, 0, 60),
        partition_by=["part"],
        properties=CM_PROPS,
    )
    # partition dirs + partitionValues keys use physical names
    add_pv = t.snapshot().scan().files()[0].partition_values
    assert all(k.startswith("col-") for k in add_pv)

    delete_where(t, "k >= 40")  # CoW rewrite on a column-mapped table
    assert {r.k for r in t.to_df().collect()} == set(range(40))

    delete_with_dvs(t, "k % 10 = 0")  # DV delete on a column-mapped table
    assert {r.k for r in t.to_df().collect()} == {
        k for k in range(40) if k % 10 != 0
    }
    # partition pruning against physical pv keys still works
    pruned = t.to_df(predicate="part = '1'")
    assert {r.k for r in pruned.collect()} == {
        k for k in range(40) if k % 3 == 1 and k % 10 != 0
    }


def test_cm_stats_skipping_uses_physical_keys(spark, tmp_path):
    import json

    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 50), properties=CM_PROPS)
    files = t.snapshot().scan().files()
    # stats JSON in the log is keyed by physical names
    adds = []
    for p in sorted((tmp_path / "tbl" / "_delta_log").glob("*.json")):
        for line in p.read_text().splitlines():
            if '"add"' in line:
                adds.append(json.loads(line)["add"])
    stats = json.loads(adds[0]["stats"])
    assert all(k.startswith("col-") for k in stats["minValues"])
    # and the skipping rewrite prunes with them (k < 0 matches nothing)
    from delta_kernel_rs_spark.plans.expressions import Col, Compare, Literal

    scan = t.snapshot().scan(predicate=Compare("lt", Col("k"), Literal(-1)))
    assert scan.files() == []
    assert len(files) > 0


# -- schema evolution ---------------------------------------------------------


def test_add_column_resolves_null_for_old_files(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 20))
    t.add_column("extra", T.StringType())
    t.append(
        _ints(spark, 20, 30).withColumn("extra", F.lit("new"))
    )
    rows = {r.k: r.extra for r in t.to_df().collect()}
    assert len(rows) == 30
    assert all(v is None for k, v in rows.items() if k < 20)
    assert all(v == "new" for k, v in rows.items() if k >= 20)


def test_widen_column_reads_old_files(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.range(10).select(F.col("id").cast("int").alias("k"))
    t = DeltaTable.create(spark, path, df=df)
    t.widen_column("k", T.LongType())
    snap = t.snapshot()
    assert snap.schema["k"].dataType == T.LongType()
    got = t.to_df()
    assert got.schema["k"].dataType == T.LongType()
    assert {r.k for r in got.collect()} == set(range(10))
    t.append(spark.range(10, 15).select(F.col("id").alias("k")))
    assert t.to_df().count() == 15


@pytest.mark.parametrize(
    "mutate",
    [
        lambda s: T.StructType([f for f in s.fields if f.name != "v"]),  # drop
        lambda s: T.StructType(
            [
                T.StructField("k", T.IntegerType(), True),  # narrow long->int
                *[f for f in s.fields if f.name != "k"],
            ]
        ),
        lambda s: T.StructType(
            [T.StructField(f.name, f.dataType, False) for f in s.fields]  # tighten
        ),
        lambda s: T.StructType(
            list(s.fields) + [T.StructField("req", T.LongType(), False)]  # non-null add
        ),
    ],
)
def test_illegal_evolutions_rejected(spark, tmp_path, mutate):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 10))
    snap = t.snapshot()
    with pytest.raises(SchemaEvolutionError):
        t.alter_schema(mutate(snap.schema))
    assert snap.version == t.snapshot().version  # nothing was committed


def test_validate_allows_cm_drop():
    old = T.StructType(
        [
            T.StructField("a", T.LongType(), True, {COLUMN_MAPPING_PHYSICAL_NAME_KEY: "col-1"}),
            T.StructField("b", T.LongType(), True, {COLUMN_MAPPING_PHYSICAL_NAME_KEY: "col-2"}),
        ]
    )
    new = T.StructType([old.fields[0]])
    validate_schema_evolution(old, new, [], column_mapping_mode="name")
    with pytest.raises(SchemaEvolutionError):
        validate_schema_evolution(old, new, [], column_mapping_mode="none")


# -- V2 checkpoints -----------------------------------------------------------


def test_v2_checkpoint_roundtrip(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 30))
    t.append(_ints(spark, 30, 50))
    t.delete("k < 10")
    v = t.checkpoint(v2=True)
    log = tmp_path / "tbl" / "_delta_log"
    top = list(log.glob(f"{v:020d}.checkpoint.*.parquet"))
    assert len(top) == 1 and ".checkpoint.parquet" not in top[0].name
    assert list(log.glob("_sidecars/*.parquet"))
    # top-level file has no file actions; sidecar carries them
    top_df = spark.read.parquet(str(top[0]))
    assert top_df.filter(F.col("add.path").isNotNull()).count() == 0
    assert top_df.filter(F.col("sidecar.path").isNotNull()).count() == 1
    assert top_df.filter(F.col("checkpointMetadata.version").isNotNull()).count() == 1

    # reads resolve through the sidecar; post-checkpoint commits still land
    t.append(_ints(spark, 50, 60))
    assert {r.k for r in t.to_df().collect()} == set(range(10, 60))

    # a later checkpoint replays THROUGH the V2 checkpoint (sidecar resolution
    # in _full_replay) without losing file actions
    t.checkpoint()
    assert {r.k for r in t.to_df().collect()} == set(range(10, 60))


def test_auto_checkpoints_follow_v2_policy(spark, tmp_path):
    """Once delta.checkpointPolicy=v2 is set (by the first explicit V2
    checkpoint), interval-triggered automatic checkpoints write V2 too."""
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(
        spark,
        path,
        df=_ints(spark, 0, 5),
        properties={"delta.checkpointInterval": "100"},  # no auto ckpt yet
    )
    t.append(_ints(spark, 5, 10))
    t.checkpoint(v2=True)  # ratchets protocol + sets the policy
    t.set_properties({"delta.checkpointInterval": "2"})
    t.append(_ints(spark, 10, 15))
    t.append(_ints(spark, 15, 20))  # crosses the interval → auto ckpt
    log = tmp_path / "tbl" / "_delta_log"
    import glob as _glob
    import os as _os

    tops = sorted(_glob.glob(_os.path.join(str(log), "*.checkpoint.*.parquet")))
    assert tops, "no auto checkpoint written"
    # V2 naming: {version}.checkpoint.{uuid}.parquet (not .checkpoint.parquet)
    assert all(".checkpoint.parquet" not in p for p in tops)
    assert t.to_df().count() == 20


def test_timestamp_ntz_table_declares_feature(spark, tmp_path):
    """An NTZ-bearing schema must list the timestampNtz reader-writer
    feature (reference table_features timestamp_ntz.rs)."""
    import datetime

    path = str(tmp_path / "tbl")
    schema = T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("ts", T.TimestampNTZType()),
        ]
    )
    t = DeltaTable.create(spark, path, schema=schema)
    proto = t.snapshot().protocol
    assert "timestampNtz" in (proto.reader_features or [])
    assert "timestampNtz" in (proto.writer_features or [])
    rows = [(1, datetime.datetime(2024, 3, 1, 12, 0)), (2, datetime.datetime(2024, 3, 2, 6, 30))]
    t.append(spark.createDataFrame(rows, schema))
    got = sorted((r.k, r.ts) for r in t.to_df().collect())
    assert got == rows


def test_rename_and_drop_column_under_cm(spark, tmp_path):
    """RENAME/DROP COLUMN: metadata-only under column mapping — data files
    untouched, reads remap through the stable physical names."""
    import pytest as _pytest

    path = str(tmp_path / "tbl")
    df = spark.range(6).select(
        F.col("id").alias("a"), (F.col("id") * 10).alias("b")
    )
    t = DeltaTable.create(
        spark, path, df=df, properties={"delta.columnMapping.mode": "name"}
    )
    files_before = {f.path for f in t.snapshot().scan().files()}

    t.rename_column("a", "a2")
    got = sorted((r.a2, r.b) for r in t.to_df().collect())
    assert got == [(i, i * 10) for i in range(6)]
    # appends after the rename land under the SAME physical name
    t.append(
        spark.createDataFrame([(100, 1000)], "a2 LONG, b LONG")
    )
    assert (100, 1000) in {(r.a2, r.b) for r in t.to_df().collect()}

    t.drop_column("b")
    assert t.to_df().columns == ["a2"]
    assert sorted(r.a2 for r in t.to_df().collect()) == [0, 1, 2, 3, 4, 5, 100]
    # the original data files were never rewritten
    assert files_before <= {f.path for f in t.snapshot().scan().files()}

    with _pytest.raises(ValueError, match="column mapping"):
        DeltaTable.create(
            spark, str(tmp_path / "plain"), df=spark.range(3).toDF("x")
        ).rename_column("x", "y")


def test_nested_struct_column_mapping_roundtrip(spark, tmp_path):
    """Delta cm spec: NESTED struct fields get ids + physical names too.
    The parquet files must carry physical nested names (external readers
    resolve by them) and our read must map them back losslessly."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from delta_kernel_rs_spark.functions.schema_codec import max_column_id

    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, {"a": 10, "inner": {"b": "x"}}, [{"c": 1.5}])],
        "id long, s struct<a:long, inner:struct<b:string>>, arr array<struct<c:double>>",
    )
    t = DeltaTable.create(
        spark, path, df=df, properties={"delta.columnMapping.mode": "name"}
    )
    snap = t.snapshot()
    # ids assigned at every nesting level: id, s, s.a, s.inner, s.inner.b,
    # arr, arr.element.c = 7
    assert max_column_id(snap.schema) == 7
    assert int(snap.metadata.configuration["delta.columnMapping.maxColumnId"]) == 7

    # the written parquet uses physical names at EVERY level
    pf = pq.ParquetFile(glob.glob(f"{path}/*.parquet")[0])
    names = " ".join(str(pf.schema_arrow).splitlines())
    assert "inner" not in names and "arr" not in names, names
    assert names.count("col-") >= 6

    # read maps back to logical names, values intact
    row = t.to_df().select("id", "s", "arr").collect()[0]
    assert row.s.a == 10 and row.s.inner.b == "x"
    assert row.arr[0].c == 1.5

    # a second append + a predicate over the nested field still work
    t.append(df.withColumn("id", F.lit(2)))
    assert t.to_df(predicate="id = 2").collect()[0].s.inner.b == "x"
