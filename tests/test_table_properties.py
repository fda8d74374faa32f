"""Typed TableProperties parsing parity with the reference
(kernel/src/table_properties/{mod,deserialize}.rs): strict booleans,
interval grammar, -1 sentinel, column-name list escaping, enum
variants, codec aliasing, and unknown-property preservation."""

from __future__ import annotations

import pytest

from delta_kernel_rs_spark.sources.table_properties import (
    ALL_COLUMNS,
    DEFAULT_NUM_INDEXED_COLS,
    TableProperties,
    parse_bool,
    parse_column_name_list,
    parse_interval_ms,
    parse_non_negative,
    parse_positive_int,
)


def test_parse_bool_strict():
    assert parse_bool("true") is True
    assert parse_bool("false") is False
    # no case folding, no 1/0 (reference parse_bool)
    for bad in ("True", "FALSE", "1", "0", "yes", ""):
        assert parse_bool(bad) is None


def test_parse_ints():
    assert parse_non_negative("0") == 0
    assert parse_non_negative("12") == 12
    assert parse_non_negative("-1") is None
    assert parse_non_negative("1.5") is None
    assert parse_positive_int("12") == 12
    assert parse_positive_int("0") is None  # NonZero in the reference


def test_parse_interval_grammar():
    # reference deserialize.rs tests: units, plurals, rejections
    assert parse_interval_ms("interval 123 nanoseconds") == 0
    assert parse_interval_ms("interval 123 microseconds") == 0
    assert parse_interval_ms("interval 123 milliseconds") == 123
    assert parse_interval_ms("interval 2 seconds") == 2_000
    assert parse_interval_ms("interval 2 minutes") == 120_000
    assert parse_interval_ms("interval 2 hours") == 7_200_000
    assert parse_interval_ms("interval 2 days") == 172_800_000
    assert parse_interval_ms("interval 2 weeks") == 1_209_600_000
    assert parse_interval_ms("interval 1 day") == 86_400_000
    # months/years unsupported; negatives rejected; prefix required
    for bad in (
        "interval 2 months",
        "interval 2 years",
        "interval -1 days",
        "2 days",
        "interval 2",
        "interval",
        "interval 1.5 days",
        "interval 2 fortnights",
        "",
    ):
        assert parse_interval_ms(bad) is None, bad


def test_parse_column_name_list_reference_cases():
    # the reference's own test table (expressions/column_names.rs)
    assert parse_column_name_list("") == []
    assert parse_column_name_list("  ,  ") == [(), ()]
    assert parse_column_name_list("  a  ") == [("a",)]
    assert parse_column_name_list("  ,  a  ") == [(), ("a",)]
    assert parse_column_name_list("  a  ,  ") == [("a",), ()]
    assert parse_column_name_list("a  ,  b") == [("a",), ("b",)]
    assert parse_column_name_list("`a, b`") == [("a, b",)]
    assert parse_column_name_list("a.b, c") == [("a", "b"), ("c",)]
    assert parse_column_name_list("`a.b`, c") == [("a.b",), ("c",)]
    # the doc example: backticked field containing comma and spaces
    assert parse_column_name_list("a.b , c.`d , e` . f") == [
        ("a", "b"),
        ("c", "d , e", "f"),
    ]
    # doubled backtick = literal backtick
    assert parse_column_name_list("`b.``c``.d`") == [("b.`c`.d",)]
    # malformed inputs fail the whole list
    assert parse_column_name_list("`unclosed") is None
    assert parse_column_name_list("a b") is None
    assert parse_column_name_list("1abc") is None
    assert parse_column_name_list("a.é") is None


def test_from_configuration_typed_fields():
    props = TableProperties.from_configuration(
        {
            "delta.appendOnly": "true",
            "delta.autoOptimize.autoCompact": "false",
            "delta.checkpointInterval": "100",
            "delta.checkpoint.writeStatsAsJson": "false",
            "delta.checkpoint.writeStatsAsStruct": "true",
            "delta.columnMapping.mode": "name",
            "delta.columnMapping.maxColumnId": "7",
            "delta.dataSkippingNumIndexedCols": "-1",
            "delta.dataSkippingStatsColumns": "a, b.`c.d`",
            "delta.deletedFileRetentionDuration": "interval 1 weeks",
            "delta.isolationLevel": "writeSerializable",
            "delta.checkpointPolicy": "v2",
            "delta.parquet.compression.codec": "NONE",
            "delta.targetFileSize": "123456",
            "delta.rowTrackingSuspended": "true",
            "delta.inCommitTimestampEnablementVersion": "9",
        }
    )
    assert props.append_only is True
    assert props.auto_compact is False
    assert props.checkpoint_interval == 100
    assert props.should_write_stats_as_json() is False
    assert props.should_write_stats_as_struct() is True
    assert props.column_mapping_mode == "name"
    assert props.column_mapping_max_column_id == 7
    assert props.data_skipping_num_indexed_cols == ALL_COLUMNS
    assert props.data_skipping_stats_columns == (("a",), ("b", "c.d"))
    assert props.deleted_file_retention_duration == 7 * 24 * 3600 * 1000
    assert props.isolation_level == "writeSerializable"
    assert props.checkpoint_policy == "v2"
    # `none` is a case-insensitive alias for uncompressed
    assert props.parquet_compression_codec == "uncompressed"
    assert props.target_file_size == 123456
    assert props.row_tracking_suspended is True
    assert props.in_commit_timestamp_enablement_version == 9
    assert props.unknown_properties == {}


def test_failed_parses_preserved_in_unknown():
    cfg = {
        "delta.appendOnly": "YES",  # bad bool
        "delta.checkpointInterval": "0",  # NonZero fails
        "delta.dataSkippingStatsColumns": "`unclosed",  # bad list
        "delta.logRetentionDuration": "interval 2 months",  # unsupported
        "delta.parquet.compression.codec": "brotli",  # unrecognized codec
        "delta.someFutureKnob": "whatever",  # unknown key
        "user.custom": "kept",  # non-delta user property
    }
    props = TableProperties.from_configuration(cfg)
    assert props.append_only is None
    assert props.checkpoint_interval is None
    assert props.data_skipping_stats_columns is None
    assert props.log_retention_duration is None
    assert props.parquet_compression_codec is None
    # every failed/unknown pair preserved verbatim
    assert props.unknown_properties == cfg


def test_enum_keys_consumed_even_on_bad_values():
    """The reference's try_parse uses `.ok()` WITHOUT `?` for the
    enum-valued keys — a bad value is consumed-and-dropped, NOT kept in
    unknown_properties (unlike every other key)."""
    props = TableProperties.from_configuration(
        {
            "delta.isolationLevel": "Serializable",  # case-sensitive variant
            "delta.checkpointPolicy": "V2",
            "delta.columnMapping.mode": "bogus",
            "delta.dataSkippingNumIndexedCols": "-2",  # only -1 allowed
        }
    )
    assert props.isolation_level is None
    assert props.checkpoint_policy is None
    assert props.column_mapping_mode is None
    assert props.data_skipping_num_indexed_cols is None
    assert props.unknown_properties == {}


def test_defaulted_accessors():
    empty = TableProperties.from_configuration({})
    assert empty.should_write_stats_as_json() is True
    assert empty.should_write_stats_as_struct() is False
    assert empty.should_randomize_file_prefixes() is False
    assert empty.random_prefix_length_or_default() == 2
    assert empty.compression_codec_or_default() == "zstd"
    assert empty.num_indexed_cols_or_default() == DEFAULT_NUM_INDEXED_COLS
    assert empty.isolation_level_or_default() == "serializable"


def test_snapshot_exposes_cached_table_properties():
    from delta_kernel_rs_spark.sources.snapshot import TableMetadata

    md = TableMetadata(
        id="x",
        schema_string='{"type":"struct","fields":[]}',
        partition_columns=[],
        configuration={"delta.appendOnly": "true", "custom": "v"},
    )
    props = md.table_properties
    assert props.append_only is True
    assert props.unknown_properties == {"custom": "v"}
    assert md.table_properties is props  # cached


def test_create_partition_column_validation(spark, tmp_path):
    """Reference builder/create_table.rs validate_partition_columns rules."""
    import pytest
    from pyspark.sql import types as T

    from delta_kernel_rs_spark.sources.table import DeltaTable

    schema = T.StructType([
        T.StructField("a", T.LongType()),
        T.StructField("b", T.StringType()),
        T.StructField("n", T.StructType([T.StructField("x", T.LongType())])),
    ])

    with pytest.raises(ValueError, match="not found in schema"):
        DeltaTable.create(spark, str(tmp_path / "t1"), schema=schema,
                          partition_by=["zz"])
    with pytest.raises(ValueError, match="Duplicate partition column"):
        DeltaTable.create(spark, str(tmp_path / "t2"), schema=schema,
                          partition_by=["a", "a"])
    with pytest.raises(ValueError, match="non-primitive type"):
        DeltaTable.create(spark, str(tmp_path / "t3"), schema=schema,
                          partition_by=["n"])
    with pytest.raises(ValueError, match="top-level column"):
        DeltaTable.create(spark, str(tmp_path / "t4"), schema=schema,
                          partition_by=["n.x"])
    with pytest.raises(ValueError, match="at least one non-partition column"):
        DeltaTable.create(
            spark, str(tmp_path / "t5"),
            schema=T.StructType([T.StructField("a", T.LongType())]),
            partition_by=["a"],
        )


def test_iceberg_v3_rejects_suspended_row_tracking(spark, tmp_path):
    import pytest

    from delta_kernel_rs_spark.functions.iceberg_compat import IcebergCompatError
    from delta_kernel_rs_spark.sources.table import DeltaTable

    with pytest.raises(IcebergCompatError, match="rowTrackingSuspended"):
        DeltaTable.create(
            spark, str(tmp_path / "t"),
            df=spark.range(3).toDF("id"),
            properties={
                "delta.enableIcebergCompatV3": "true",
                "delta.enableRowTracking": "true",
                "delta.columnMapping.mode": "name",
                "delta.rowTrackingSuspended": "true",
            },
        )
