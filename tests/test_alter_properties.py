"""ALTER TABLE SET/UNSET TBLPROPERTIES (reference exercises these via
kernel/tests/integration/features/alter_table.rs): property merge,
protocol ratchet, ADD-CONSTRAINT validation against existing rows, ICT
mid-table enablement metadata."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_kernel_rs_spark.sources.table import DeltaTable
from delta_kernel_rs_spark.sources.transaction import ConstraintViolationError


def _tbl(spark, tmp_path, **props):
    t = DeltaTable.create(
        spark,
        str(tmp_path / "tbl"),
        df=spark.range(10).select(F.col("id").alias("k")),
        properties=props or None,
    )
    return t


def test_set_properties_merges_and_survives(spark, tmp_path):
    t = _tbl(spark, tmp_path, **{"delta.appendOnly": "false"})
    t.set_properties({"delta.enableChangeDataFeed": "true", "custom.tag": "x"})
    conf = t.snapshot().metadata.configuration
    assert conf["delta.enableChangeDataFeed"] == "true"
    assert conf["custom.tag"] == "x"
    assert conf["delta.appendOnly"] == "false"
    # CDF requires minWriter >= 4 (legacy ladder)
    assert t.snapshot().protocol.min_writer_version >= 4
    # CDF actually records changes from the NEXT commit on
    t.append(spark.range(10, 13).select(F.col("id").alias("k")))
    ch = t.changes(t.snapshot().version)
    assert sorted(r.k for r in ch.collect()) == [10, 11, 12]


def test_add_constraint_validates_existing_rows(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    with pytest.raises(ConstraintViolationError, match="existing row"):
        t.set_properties({"delta.constraints.big": "k > 5"})
    # satisfiable constraint lands and is enforced on future writes
    t.set_properties({"delta.constraints.nonneg": "k >= 0"})
    assert t.snapshot().protocol.min_writer_version >= 3
    with pytest.raises(ConstraintViolationError):
        t.append(spark.createDataFrame([(-1,)], "k LONG"))


def test_set_properties_protocol_merges_existing_features(spark, tmp_path):
    """Upgrading for a new property must keep features already present."""
    t = _tbl(spark, tmp_path, **{"delta.enableRowTracking": "true"})
    p0 = t.snapshot().protocol
    assert "rowTracking" in p0.writer_features
    t.set_properties({"delta.enableChangeDataFeed": "true"})
    p1 = t.snapshot().protocol
    assert "rowTracking" in p1.writer_features
    assert "changeDataFeed" in p1.writer_features


def test_ict_mid_table_enablement_metadata(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    t.append(spark.range(10, 12).select(F.col("id").alias("k")))
    v = t.set_properties({"delta.enableInCommitTimestamps": "true"})
    conf = t.snapshot().metadata.configuration
    assert conf["delta.inCommitTimestampEnablementVersion"] == str(v)
    assert int(conf["delta.inCommitTimestampEnablementTimestamp"]) > 0
    assert "inCommitTimestamp" in t.snapshot().protocol.writer_features


def test_unset_properties(spark, tmp_path):
    t = _tbl(spark, tmp_path, **{"custom.a": "1", "custom.b": "2"})
    t.unset_properties(["custom.a", "custom.never.existed"])
    conf = t.snapshot().metadata.configuration
    assert "custom.a" not in conf and conf["custom.b"] == "2"


def test_column_mapping_mode_change_refused(spark, tmp_path):
    t = _tbl(spark, tmp_path)
    with pytest.raises(ValueError, match="columnMapping.mode"):
        t.set_properties({"delta.columnMapping.mode": "name"})
