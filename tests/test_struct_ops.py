"""StructExpr (keep-predicate constructor) + StructPatch unit tests
(reference kernel/src/expressions/mod.rs:473-487, struct_patch.rs)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_kernel_rs_spark.plans.expressions import (
    Arith,
    Col,
    Compare,
    Literal,
    StructExpr,
    StructPatchBuilder,
)


def test_struct_keep_predicate_nulls_row(spark):
    df = spark.createDataFrame([(1, 5.0), (2, 20.0)], "id long, v double")
    s = StructExpr(
        fields=(("v", Col("v")),), keep=Compare("gt", Col("v"), Literal(10.0))
    )
    rows = {r.id: r.s for r in df.select("id", s.to_spark().alias("s")).collect()}
    assert rows[1] is None
    assert rows[2].v == 20.0


def test_struct_patch_set_and_drop(spark):
    df = spark.createDataFrame([(1,)], "id long").select(
        "id", F.struct(F.lit(1).alias("a"), F.lit(2).alias("b")).alias("s")
    )
    patch = (
        StructPatchBuilder("s")
        .set("c", Arith("plus", Col("s.a"), Col("s.b")))
        .set("a", Literal(9))
        .drop("b")
        .build()
    )
    out = df.select(patch.to_spark().alias("p")).collect()[0].p
    assert out.asDict() == {"a": 9, "c": 3}


def test_struct_patch_builder_rejects_conflicts():
    b = StructPatchBuilder("s").set("a", Literal(1))
    with pytest.raises(ValueError, match="conflicting"):
        b.drop("a")


def test_struct_patch_preserves_null_struct(spark):
    df = spark.createDataFrame([(1,)], "id long").select(
        "id", F.lit(None).cast("struct<a:int>").alias("s")
    )
    patch = StructPatchBuilder("s").set("b", Literal(5)).build()
    assert df.select(patch.to_spark().alias("p")).collect()[0].p is None
