"""Generated / identity / default columns on write (VERDICT r3 item 9).

Reference metadata keys: kernel/src/schema/mod.rs:253-320
(`delta.generationExpression`, `CURRENT_DEFAULT`, `delta.identity.*`).
Criteria: identity auto-assigns monotonically, generation expression
computed when absent, default applied on missing column, violation raises.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_kernel_rs_spark.sources.table import DeltaTable
from delta_kernel_rs_spark.sources.transaction import ConstraintViolationError


def _schema(*fields):
    return T.StructType(list(fields))


def test_default_applied_on_missing_column(spark, tmp_path):
    path = str(tmp_path / "t")
    schema = _schema(
        T.StructField("x", T.LongType()),
        T.StructField("region", T.StringType(), True, {"CURRENT_DEFAULT": "'emea'"}),
    )
    t = DeltaTable.create(spark, path, schema=schema)
    t.append(spark.range(5).toDF("x"))
    got = t.to_df().select("x", "region").collect()
    assert all(r.region == "emea" for r in got) and len(got) == 5
    # provided column wins over the default
    t.append(spark.range(5, 8).toDF("x").withColumn("region", F.lit("apac")))
    assert t.to_df().filter("region = 'apac'").count() == 3


def test_generated_column_computed_when_absent(spark, tmp_path):
    path = str(tmp_path / "t")
    schema = _schema(
        T.StructField("x", T.LongType()),
        T.StructField(
            "x2", T.LongType(), True, {"delta.generationExpression": "x * 2"}
        ),
    )
    t = DeltaTable.create(spark, path, schema=schema)
    t.append(spark.range(4).toDF("x"))
    got = {(r.x, r.x2) for r in t.to_df().collect()}
    assert got == {(i, 2 * i) for i in range(4)}


def test_generated_column_violation_raises(spark, tmp_path):
    path = str(tmp_path / "t")
    schema = _schema(
        T.StructField("x", T.LongType()),
        T.StructField(
            "x2", T.LongType(), True, {"delta.generationExpression": "x * 2"}
        ),
    )
    t = DeltaTable.create(spark, path, schema=schema)
    # consistent values pass
    t.append(spark.range(3).toDF("x").withColumn("x2", F.col("x") * 2))
    with pytest.raises(ConstraintViolationError):
        t.append(spark.range(3).toDF("x").withColumn("x2", F.col("x") * 3))


def test_identity_auto_assign_monotonic(spark, tmp_path):
    path = str(tmp_path / "t")
    schema = _schema(
        T.StructField(
            "id",
            T.LongType(),
            True,
            {"delta.identity.start": 100, "delta.identity.step": 10},
        ),
        T.StructField("x", T.LongType()),
    )
    t = DeltaTable.create(spark, path, schema=schema)
    t.append(spark.range(6).repartition(3).toDF("x"))
    ids1 = sorted(r.id for r in t.to_df().collect())
    assert ids1 == [100 + 10 * i for i in range(6)]  # gap-free from start

    # second write continues past the persisted high-water mark
    t.append(spark.range(6, 9).toDF("x"))
    ids2 = sorted(r.id for r in t.to_df().collect())
    assert ids2 == [100 + 10 * i for i in range(9)]
    # HWM persisted in field metadata
    meta = t.snapshot().schema["id"].metadata
    assert int(meta["delta.identity.highWaterMark"]) == 180


def test_identity_explicit_insert(spark, tmp_path):
    path = str(tmp_path / "t")
    disallow = _schema(
        T.StructField(
            "id", T.LongType(), True, {"delta.identity.start": 1, "delta.identity.step": 1}
        ),
        T.StructField("x", T.LongType()),
    )
    t = DeltaTable.create(spark, str(tmp_path / "a"), schema=disallow)
    with pytest.raises(ConstraintViolationError):
        t.append(spark.range(3).toDF("x").withColumn("id", F.col("x")))

    allow = _schema(
        T.StructField(
            "id",
            T.LongType(),
            True,
            {
                "delta.identity.start": 1,
                "delta.identity.step": 1,
                "delta.identity.allowExplicitInsert": True,
            },
        ),
        T.StructField("x", T.LongType()),
    )
    t2 = DeltaTable.create(spark, path, schema=allow)
    t2.append(spark.range(3).toDF("x").withColumn("id", F.col("x") + 50))
    # explicit values advanced the HWM; auto-assign continues past them
    t2.append(spark.range(3, 5).toDF("x"))
    ids = sorted(r.id for r in t2.to_df().collect())
    assert ids == [50, 51, 52, 53, 54]
