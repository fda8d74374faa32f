"""mergeSchema append: auto-evolution in one commit.

Reference rules: kernel/src/schema/diff.rs (legal evolutions) +
transaction/builder/schema_evolution.rs; the mergeSchema behavior itself
is the standard Delta writer option this engine's users expect.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from delta_kernel_rs_spark.functions.schema_diff import (
    SchemaEvolutionError,
    merge_append_schema,
)
from delta_kernel_rs_spark.sources.table import DeltaTable


@pytest.fixture()
def table(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    return DeltaTable.create(spark, str(tmp_path / "tbl"), df=df)


def test_merge_append_schema_rules():
    old = T.StructType(
        [T.StructField("a", T.IntegerType(), False), T.StructField("b", T.StringType())]
    )
    inc = T.StructType(
        [
            T.StructField("a", T.LongType()),  # widen
            T.StructField("c", T.DoubleType()),  # new
        ]
    )
    merged = merge_append_schema(old, inc)
    assert [f.name for f in merged.fields] == ["a", "b", "c"]
    assert merged["a"].dataType == T.LongType()
    assert merged["a"].nullable is False  # table nullability kept
    assert merged["c"].nullable is True
    # incompatible type change refuses
    bad = T.StructType([T.StructField("b", T.LongType())])
    with pytest.raises(SchemaEvolutionError, match="incompatible"):
        merge_append_schema(old, bad)


def test_append_new_column_one_commit(spark, table):
    v0 = table.snapshot().version
    extra = spark.createDataFrame([(3, "c", 1.5)], "k int, v string, score double")
    table.append(extra, merge_schema=True)
    snap = table.snapshot()
    assert snap.version == v0 + 1  # metadata + data in ONE commit
    assert [f.name for f in snap.schema.fields] == ["k", "v", "score"]
    got = {r.k: (r.v, r.score) for r in table.to_df().collect()}
    assert got[3] == ("c", 1.5)
    assert got[1] == ("a", None)  # old files resolve the new column to NULL


def test_append_widening_merge(spark, table):
    big = spark.createDataFrame([(2**40, "z")], "k long, v string")
    table.append(big, merge_schema=True)
    snap = table.snapshot()
    assert snap.schema["k"].dataType == T.LongType()
    assert {r.k for r in table.to_df().collect()} == {1, 2, 2**40}


def test_append_missing_column_fills_null(spark, table):
    table.append(
        spark.createDataFrame([(9,)], "k int"), merge_schema=True
    )
    got = {r.k: r.v for r in table.to_df().collect()}
    assert got[9] is None
    assert len(got) == 3


def test_append_without_flag_unchanged(spark, table):
    # plain append still refuses to evolve
    extra = spark.createDataFrame([(3, "c", 1.5)], "k int, v string, score double")
    table.append(extra)  # silently prunes to table columns (existing behavior)
    snap = table.snapshot()
    assert [f.name for f in snap.schema.fields] == ["k", "v"]


def test_incompatible_merge_raises(spark, table):
    bad = spark.createDataFrame([(1, 5)], "k int, v long")
    with pytest.raises(SchemaEvolutionError):
        table.append(bad, merge_schema=True)


def test_merge_schema_with_column_mapping(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "k int, v string")
    t = DeltaTable.create(
        spark,
        str(tmp_path / "cm"),
        df=df,
        properties={"delta.columnMapping.mode": "name"},
    )
    t.append(
        spark.createDataFrame([(2, "b", 7)], "k int, v string, n int"),
        merge_schema=True,
    )
    snap = t.snapshot()
    n_field = snap.schema["n"]
    assert n_field.metadata.get("delta.columnMapping.id") is not None
    got = {r.k: r.n for r in t.to_df().collect()}
    assert got == {1: None, 2: 7}


def test_schema_evolution_ratchets_protocol_for_new_features(spark, tmp_path):
    """Adding a feature-requiring column (timestampNtz) to a legacy-protocol
    table must upgrade the protocol in the SAME commit (the reference
    refuses the ALTER outright — builder/alter_table.rs; this engine
    ratchets instead, merged with existing features)."""
    from pyspark.sql import types as T

    from delta_kernel_rs_spark.sources.table import DeltaTable

    t = DeltaTable.create(spark, str(tmp_path / "t"), df=spark.range(3).toDF("id"))
    assert t.snapshot().protocol.min_reader_version == 1
    t.add_column("ts_ntz", T.TimestampNTZType())
    p = t.snapshot().protocol
    assert "timestampNtz" in (p.reader_features or [])
    assert "timestampNtz" in (p.writer_features or [])
    assert p.min_reader_version == 3 and p.min_writer_version == 7
    # a second unrelated evolution never drops the feature
    t.add_column("extra", T.LongType())
    p2 = t.snapshot().protocol
    assert "timestampNtz" in (p2.reader_features or [])
