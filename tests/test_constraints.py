"""Write-side enforcement: CHECK constraints, invariants, NOT NULL,
append-only tables, time-bounded CDF."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_kernel_rs_spark.sources.delete import delete_where, delete_with_dvs
from delta_kernel_rs_spark.sources.table import DeltaTable
from delta_kernel_rs_spark.sources.transaction import (
    AppendOnlyError,
    ConstraintViolationError,
)


def _ints(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def test_check_constraint_blocks_bad_write(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(
        spark,
        path,
        df=_ints(spark, 0, 10),
        properties={"delta.constraints.k_small": "k < 100"},
    )
    with pytest.raises(ConstraintViolationError, match="k_small"):
        t.append(_ints(spark, 95, 105))
    assert t.snapshot().version == 0  # nothing committed
    t.append(_ints(spark, 10, 20))  # conforming writes pass
    assert t.to_df().count() == 20


def test_column_invariant_enforced(spark, tmp_path):
    path = str(tmp_path / "tbl")
    inv = json.dumps({"expression": {"expression": "k >= 0"}})
    schema = T.StructType([T.StructField("k", T.LongType(), True, {"delta.invariants": inv})])
    t = DeltaTable.create(spark, path, schema=schema)
    t.append(_ints(spark, 0, 5))
    with pytest.raises(ConstraintViolationError, match="invariant"):
        t.append(spark.range(1).select(F.lit(-1).cast("long").alias("k")))


def test_not_null_field_enforced(spark, tmp_path):
    path = str(tmp_path / "tbl")
    schema = T.StructType([T.StructField("k", T.LongType(), False)])
    t = DeltaTable.create(spark, path, schema=schema)
    with pytest.raises(ConstraintViolationError, match="notnull"):
        t.append(spark.range(1).select(F.lit(None).cast("long").alias("k")))


def test_append_only_blocks_deletes(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(
        spark, path, df=_ints(spark, 0, 30), properties={"delta.appendOnly": "true"}
    )
    with pytest.raises(AppendOnlyError):
        delete_where(t, "k < 10")
    with pytest.raises(AppendOnlyError):
        delete_with_dvs(t, "k < 10")
    t.append(_ints(spark, 30, 40))  # appends still fine
    assert t.to_df().count() == 40


def test_changes_between_timestamps(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(
        spark,
        path,
        df=_ints(spark, 0, 10),
        properties={
            "delta.enableChangeDataFeed": "true",
            "delta.enableInCommitTimestamps": "true",
        },
    )
    t.append(_ints(spark, 10, 20))
    t.append(_ints(spark, 20, 30))
    log = tmp_path / "tbl" / "_delta_log"
    icts = []
    for p in sorted(log.glob("*.json")):
        icts.append(
            json.loads(p.read_text().splitlines()[0])["commitInfo"]["inCommitTimestamp"]
        )
    ch = t.changes_between_timestamps(icts[1], icts[2])
    assert {r._commit_version for r in ch.collect()} == {1, 2}
    assert {r.k for r in ch.collect()} == set(range(10, 30))


def test_write_refuses_unknown_writer_feature(spark, tmp_path):
    """A table upgraded (by some other engine) to a writer feature this
    engine cannot enforce must refuse ALL writes, not land unenforced data
    (reference table_features write gating)."""
    import os

    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 5))
    with open(os.path.join(path, "_delta_log", "00000000000000000001.json"), "w") as fh:
        fh.write(
            json.dumps(
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
    with pytest.raises(Exception, match="futureFeatureX"):
        t.append(_ints(spark, 5, 10))
    # reading stays allowed: the upgrade touched only writer requirements
    assert t.to_df().count() == 5
