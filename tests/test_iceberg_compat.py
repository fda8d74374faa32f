"""IcebergCompatV2 writer feature (UniForm tables).

Mirrors the reference's requirement cases (kernel/src/table_features/
mod.rs:407-482 V1/V2/V3 FeatureInfo; kernel/tests/integration/features/
iceberg_compat.rs): exactly one supported version, requirement
validation at create AND per commit, DV refusal, type allowlist, field
ids in the written parquet.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_kernel_rs_spark.functions.iceberg_compat import (
    IcebergCompatError,
    validate_iceberg_compat,
)
from delta_kernel_rs_spark.sources.table import DeltaTable

V2 = {"delta.enableIcebergCompatV2": "true", "delta.columnMapping.mode": "name"}


def _schema():
    return T.StructType(
        [
            T.StructField("k", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField(
                "nested",
                T.StructType(
                    [
                        T.StructField("xs", T.ArrayType(T.DoubleType())),
                        T.StructField("m", T.MapType(T.StringType(), T.LongType())),
                    ]
                ),
            ),
        ]
    )


def test_v2_requires_column_mapping():
    with pytest.raises(IcebergCompatError, match="column mapping"):
        validate_iceberg_compat(
            {"delta.enableIcebergCompatV2": "true"}, _schema(), "none"
        )


def test_v1_is_refused():
    with pytest.raises(IcebergCompatError, match="not supported"):
        validate_iceberg_compat(
            {
                "delta.enableIcebergCompatV1": "true",
                "delta.columnMapping.mode": "name",
            },
            _schema(),
            "name",
        )


def test_versions_mutually_exclusive():
    with pytest.raises(IcebergCompatError, match="mutually exclusive"):
        validate_iceberg_compat(
            {
                "delta.enableIcebergCompatV2": "true",
                "delta.enableIcebergCompatV3": "true",
            },
            _schema(),
            "name",
        )


def test_v2_forbids_enabled_dvs():
    with pytest.raises(IcebergCompatError, match="deletion vectors"):
        validate_iceberg_compat(
            dict(V2, **{"delta.enableDeletionVectors": "true"}), _schema(), "name"
        )


def test_v2_type_allowlist_rejects_variant():
    schema = T.StructType([T.StructField("v", T.VariantType())])
    with pytest.raises(IcebergCompatError, match="does not support type"):
        validate_iceberg_compat(V2, schema, "name")
    # nested offender is reported with its dotted path
    nested = T.StructType(
        [T.StructField("a", T.StructType([T.StructField("n", T.NullType())]))]
    )
    with pytest.raises(IcebergCompatError, match="a.n"):
        validate_iceberg_compat(V2, nested, "name")


def test_v2_create_write_read_roundtrip(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, schema=_schema(), properties=dict(V2))
    proto = t.snapshot().protocol
    assert "icebergCompatV2" in (proto.writer_features or [])
    assert "columnMapping" in (proto.writer_features or [])
    df = spark.createDataFrame(
        [(1, "x", ([1.0, 2.0], {"a": 1})), (2, "y", ([], {}))],
        _schema(),
    )
    t.append(df)
    got = {(r.k, r.s) for r in t.to_df().select("k", "s").collect()}
    assert got == {(1, "x"), (2, "y")}


def test_v2_field_ids_land_in_parquet(spark, tmp_path):
    """The UniForm payoff: parquet files written under V2 carry field ids
    (via column mapping), which Iceberg readers resolve columns by."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "tbl")
    t = DeltaTable.create(
        spark,
        path,
        schema=T.StructType([T.StructField("k", T.LongType())]),
        properties=dict(V2),
    )
    t.append(spark.range(5).toDF("k").coalesce(1))
    f = t.snapshot().scan().files()[0]
    arrow_schema = pq.read_schema(f.path)
    meta = arrow_schema.field(0).metadata or {}
    assert meta.get(b"PARQUET:field_id") is not None


def test_v2_refuses_dv_delete(spark, tmp_path):
    from delta_kernel_rs_spark.sources.delete import delete_with_dvs

    path = str(tmp_path / "tbl")
    t = DeltaTable.create(
        spark,
        path,
        schema=T.StructType([T.StructField("k", T.LongType())]),
        properties=dict(V2),
    )
    t.append(spark.range(10).toDF("k"))
    with pytest.raises(IcebergCompatError, match="forbidden"):
        delete_with_dvs(t, "k % 2 = 0")
    # copy-on-write delete stays available and keeps the table compliant
    t.delete("k % 2 = 0")
    assert sorted(r.k for r in t.to_df().collect()) == [1, 3, 5, 7, 9]


def test_v1_feature_carrying_tables_are_write_refused(spark, tmp_path):
    """A table whose protocol lists icebergCompatV1 (written by another
    engine) is read-allowed but write-refused — writer-only features this
    engine cannot enforce must block writes, not corrupt the promise."""
    import json
    import os

    for feat in ("icebergCompatV1",):
        path = str(tmp_path / feat)
        t = DeltaTable.create(
            spark, path, schema=T.StructType([T.StructField("k", T.LongType())])
        )
        t.append(spark.range(3).toDF("k"))
        # graft the foreign feature into the protocol (simulating another
        # writer's table)
        log = os.path.join(path, "_delta_log", "00000000000000000000.json")
        lines = open(log).read().splitlines()
        out = []
        for line in lines:
            a = json.loads(line)
            if "protocol" in a:
                a["protocol"]["minWriterVersion"] = 7
                a["protocol"]["writerFeatures"] = [feat]
            out.append(json.dumps(a))
        open(log, "w").write("\n".join(out) + "\n")
        # drop the version CRCs the in-place protocol edit invalidated
        for f in os.listdir(os.path.dirname(log)):
            if f.endswith(".crc"):
                os.unlink(os.path.join(os.path.dirname(log), f))

        snap = DeltaTable(spark, path).snapshot()
        assert sorted(r.k for r in snap.scan().to_df().collect()) == [0, 1, 2]
        with pytest.raises(Exception, match="unsupported writer features"):
            snap.protocol.ensure_write_supported()


V3 = {
    "delta.enableIcebergCompatV3": "true",
    "delta.columnMapping.mode": "name",
    "delta.enableRowTracking": "true",
}


def test_v3_requires_row_tracking():
    with pytest.raises(IcebergCompatError, match="row tracking"):
        validate_iceberg_compat(
            {
                "delta.enableIcebergCompatV3": "true",
                "delta.columnMapping.mode": "name",
            },
            _schema(),
            "name",
        )


def test_v3_allows_variant_and_rejects_legacy_nested_ids():
    schema = T.StructType([T.StructField("v", T.VariantType())])
    assert validate_iceberg_compat(dict(V3), schema, "name") == 3
    legacy = T.StructType(
        [
            T.StructField(
                "nested",
                T.StructType(
                    [
                        T.StructField(
                            "x", T.LongType(), True,
                            {"parquet.field.nested.ids": {"a": 1}},
                        )
                    ]
                ),
            )
        ]
    )
    with pytest.raises(IcebergCompatError, match="nested.ids"):
        validate_iceberg_compat(dict(V3), legacy, "name")


def test_v3_create_write_dv_delete_roundtrip(spark, tmp_path):
    """V3 end-to-end: feature listed, rows written under column mapping +
    row tracking, and (unlike V2) a DV delete is PERMITTED."""
    from delta_kernel_rs_spark.sources.delete import delete_with_dvs

    path = str(tmp_path / "tbl")
    t = DeltaTable.create(
        spark,
        path,
        schema=T.StructType([T.StructField("k", T.LongType())]),
        properties=dict(V3),
    )
    assert "icebergCompatV3" in (t.snapshot().protocol.writer_features or [])
    t.append(spark.range(10).toDF("k"))
    delete_with_dvs(t, "k % 2 = 0")
    assert sorted(r.k for r in t.to_df().collect()) == [1, 3, 5, 7, 9]
