"""Typed view over a table's ``metadata.configuration``.

Parity with the reference's ``TableProperties``
(``kernel/src/table_properties/mod.rs:75-245`` and
``deserialize.rs:26-226``): every known ``delta.*`` key parses into a
typed field with the reference's exact lenience rules, and anything
else — unknown keys AND known keys whose values fail to parse — is
preserved verbatim in ``unknown_properties`` (never an error: a table
written by a newer client must stay readable).

Parse strictness mirrors the reference function-for-function:

- booleans accept only ``"true"``/``"false"`` (``parse_bool``)
- intervals are ``"interval <n> <unit>"``; months/years are
  unsupported, negatives rejected (``parse_interval_impl``)
- ``dataSkippingNumIndexedCols`` parses as i64 where ``-1`` means
  all columns and any other negative fails
- column-name lists honor backtick escaping with doubled-backtick
  escapes (``ColumnName::parse_column_name_list``,
  ``expressions/column_names.rs:51-70,289-327``)
- enum-valued keys (isolation level, checkpoint policy) match their
  serialized variants exactly; the parquet codec is case-insensitive
  with ``none`` as an alias for ``uncompressed``
"""

from __future__ import annotations

from dataclasses import dataclass, field

#: leaf-column count used when ``dataSkippingNumIndexedCols`` is unset
#: (reference DEFAULT_NUM_INDEXED_COLS, table_properties/mod.rs:291)
DEFAULT_NUM_INDEXED_COLS = 32

#: ``dataSkippingNumIndexedCols = -1``: collect stats on ALL leaf columns
#: (reference DataSkippingNumIndexedCols::AllColumns)
ALL_COLUMNS = -1

_SECONDS_PER_MINUTE = 60
_SECONDS_PER_HOUR = 60 * _SECONDS_PER_MINUTE
_SECONDS_PER_DAY = 24 * _SECONDS_PER_HOUR
_SECONDS_PER_WEEK = 7 * _SECONDS_PER_DAY

#: exact-match enum variants (strum camelCase, case-SENSITIVE — reference
#: table_properties/mod.rs:326-357)
ISOLATION_LEVELS = frozenset({"serializable", "writeSerializable", "snapshotIsolation"})
CHECKPOINT_POLICIES = frozenset({"classic", "v2"})
COLUMN_MAPPING_MODES = frozenset({"none", "id", "name"})

#: parquet codec variants, matched case-insensitively; ``none`` is an alias
#: for ``uncompressed`` (reference ParquetCompressionCodec,
#: table_properties/mod.rs:370-385). Values are the canonical strings.
_PARQUET_CODECS = {
    "zstd": "zstd",
    "uncompressed": "uncompressed",
    "none": "uncompressed",
    "snappy": "snappy",
    "gzip": "gzip",
    "lz4": "lz4",
    "lz4_raw": "lz4_raw",
}


def parse_bool(s: str) -> bool | None:
    """Strict JSON-style boolean — anything else fails (reference
    ``parse_bool``: no case folding, no 1/0)."""
    if s == "true":
        return True
    if s == "false":
        return False
    return None


def parse_non_negative(s: str) -> int | None:
    try:
        n = int(s, 10)
    except ValueError:
        return None
    return n if n >= 0 else None


def parse_positive_int(s: str) -> int | None:
    n = parse_non_negative(s)
    return n if n else None


def parse_interval_ms(s: str) -> int | None:
    """``"interval <n> <unit>"`` → milliseconds (reference
    ``parse_interval_impl``: no months/years, no fractions, no
    negatives; sub-millisecond units floor toward zero)."""
    parts = s.split()
    if len(parts) != 3 or parts[0] != "interval":
        return None
    try:
        n = int(parts[1], 10)
    except ValueError:
        return None
    if n < 0:
        return None
    unit = parts[2]
    if unit in ("nanosecond", "nanoseconds"):
        return n // 1_000_000
    if unit in ("microsecond", "microseconds"):
        return n // 1_000
    if unit in ("millisecond", "milliseconds"):
        return n
    if unit in ("second", "seconds"):
        return n * 1_000
    if unit in ("minute", "minutes"):
        return n * _SECONDS_PER_MINUTE * 1_000
    if unit in ("hour", "hours"):
        return n * _SECONDS_PER_HOUR * 1_000
    if unit in ("day", "days"):
        return n * _SECONDS_PER_DAY * 1_000
    if unit in ("week", "weeks"):
        return n * _SECONDS_PER_WEEK * 1_000
    return None  # months/years unsupported; unknown units fail


def parse_column_name_list(s: str) -> list[tuple[str, ...]] | None:
    """Comma-separated column paths with ``.``-nested fields and backtick
    escaping (doubled backtick = literal backtick) — the reference's
    ``ColumnName::parse_column_name_list`` state machine
    (``expressions/column_names.rs:289-327``). Returns ``None`` on any
    malformed input (unclosed backtick, stray character, digit-leading
    unescaped field, trailing comma)."""
    i, n = 0, len(s)
    cols: list[tuple[str, ...]] = []

    def skip_ws(j: int) -> int:
        while j < n and s[j].isspace():
            j += 1
        return j

    i = skip_ws(i)
    if i >= n:
        return []  # empty string -> empty list, not [()]
    # ending state: None=exhausted, ','=next column, '.'=next field
    pending_column = True
    while pending_column:
        pending_column = False
        i = skip_ws(i)
        if i < n and s[i] == ",":
            # leading/doubled comma -> empty column (reference swallows it)
            cols.append(())
            i += 1
            pending_column = True
            continue
        if i >= n:
            cols.append(())
            break
        path: list[str] = []
        pending_field = True
        while pending_field:
            pending_field = False
            i = skip_ws(i)
            name_chars: list[str] = []
            if i < n and s[i] == "`":
                i += 1
                closed = False
                while i < n:
                    if s[i] == "`":
                        if i + 1 < n and s[i + 1] == "`":
                            name_chars.append("`")
                            i += 2
                            continue
                        i += 1
                        closed = True
                        break
                    name_chars.append(s[i])
                    i += 1
                if not closed:
                    return None  # no closing backtick
            else:
                first = True
                while i < n and (s[i].isascii() and (s[i].isalnum() or s[i] == "_")):
                    if first and s[i].isdigit():
                        return None  # unescaped field can't start with digit
                    name_chars.append(s[i])
                    first = False
                    i += 1
            path.append("".join(name_chars))
            i = skip_ws(i)
            if i >= n:
                pass  # input exhausted
            elif s[i] == ".":
                i += 1
                pending_field = True
            elif s[i] == ",":
                i += 1
                pending_column = True
            else:
                return None  # invalid character after field
        cols.append(tuple(path))
    return cols


@dataclass(frozen=True)
class TableProperties:
    """Typed ``delta.*`` properties; ``None`` = unset or unparseable
    (the raw pair then lives in ``unknown_properties``). Field set and
    names mirror the reference struct 1:1; durations are milliseconds."""

    append_only: bool | None = None
    auto_compact: bool | None = None
    optimize_write: bool | None = None
    checkpoint_interval: int | None = None
    checkpoint_write_stats_as_json: bool | None = None
    checkpoint_write_stats_as_struct: bool | None = None
    column_mapping_mode: str | None = None
    column_mapping_max_column_id: int | None = None
    data_skipping_num_indexed_cols: int | None = None  # -1 = all columns
    data_skipping_stats_columns: tuple[tuple[str, ...], ...] | None = None
    deleted_file_retention_duration: int | None = None  # ms
    enable_change_data_feed: bool | None = None
    enable_deletion_vectors: bool | None = None
    enable_type_widening: bool | None = None
    enable_iceberg_compat_v1: bool | None = None
    enable_iceberg_compat_v2: bool | None = None
    enable_iceberg_compat_v3: bool | None = None
    isolation_level: str | None = None
    log_retention_duration: int | None = None  # ms
    enable_expired_log_cleanup: bool | None = None
    randomize_file_prefixes: bool | None = None
    random_prefix_length: int | None = None
    set_transaction_retention_duration: int | None = None  # ms
    target_file_size: int | None = None
    tune_file_sizes_for_rewrites: bool | None = None
    checkpoint_policy: str | None = None
    enable_row_tracking: bool | None = None
    row_tracking_suspended: bool | None = None
    materialized_row_id_column_name: str | None = None
    materialized_row_commit_version_column_name: str | None = None
    parquet_format_version: str | None = None
    parquet_compression_codec: str | None = None  # canonical variant name
    enable_in_commit_timestamps: bool | None = None
    in_commit_timestamp_enablement_version: int | None = None
    in_commit_timestamp_enablement_timestamp: int | None = None
    unknown_properties: dict[str, str] = field(default_factory=dict)

    # -- defaulted accessors (reference mod.rs:247-289) -------------------
    def should_write_stats_as_json(self) -> bool:
        if self.checkpoint_write_stats_as_json is None:
            return True
        return self.checkpoint_write_stats_as_json

    def should_write_stats_as_struct(self) -> bool:
        return bool(self.checkpoint_write_stats_as_struct)

    def should_randomize_file_prefixes(self) -> bool:
        return bool(self.randomize_file_prefixes)

    def random_prefix_length_or_default(self) -> int:
        return self.random_prefix_length or 2

    def compression_codec_or_default(self) -> str:
        """The protocol's recommended fallback is zstd when unset
        (reference ``compression_codec_or_default``)."""
        return self.parquet_compression_codec or "zstd"

    def num_indexed_cols_or_default(self) -> int:
        """``-1`` = all columns; otherwise the configured or default
        leaf-column count."""
        if self.data_skipping_num_indexed_cols is None:
            return DEFAULT_NUM_INDEXED_COLS
        return self.data_skipping_num_indexed_cols

    def isolation_level_or_default(self) -> str:
        return self.isolation_level or "serializable"

    @classmethod
    def from_configuration(cls, configuration: dict[str, str]) -> "TableProperties":
        parsed: dict[str, object] = {}
        unknown: dict[str, str] = {}

        def put(field_name: str, value):
            """Failed parse -> the raw pair goes to unknown_properties
            (reference try_parse returns None and From keeps the pair)."""
            if value is None:
                return False
            parsed[field_name] = value
            return True

        for k, v in (configuration or {}).items():
            ok = False
            if k == "delta.appendOnly":
                ok = put("append_only", parse_bool(v))
            elif k == "delta.autoOptimize.autoCompact":
                ok = put("auto_compact", parse_bool(v))
            elif k == "delta.autoOptimize.optimizeWrite":
                ok = put("optimize_write", parse_bool(v))
            elif k == "delta.checkpointInterval":
                ok = put("checkpoint_interval", parse_positive_int(v))
            elif k == "delta.checkpoint.writeStatsAsJson":
                ok = put("checkpoint_write_stats_as_json", parse_bool(v))
            elif k == "delta.checkpoint.writeStatsAsStruct":
                ok = put("checkpoint_write_stats_as_struct", parse_bool(v))
            elif k == "delta.columnMapping.mode":
                # enum-valued keys are consumed even when the value fails to
                # parse (reference try_parse uses `.ok()` WITHOUT `?` here —
                # unlike every other key, a bad value is dropped, not kept
                # in unknown_properties; deserialize.rs:57,62,86,94)
                put("column_mapping_mode", v if v in COLUMN_MAPPING_MODES else None)
                ok = True
            elif k == "delta.columnMapping.maxColumnId":
                ok = put("column_mapping_max_column_id", parse_non_negative(v))
            elif k == "delta.dataSkippingNumIndexedCols":
                try:
                    num = int(v, 10)
                except ValueError:
                    num = None
                put(
                    "data_skipping_num_indexed_cols",
                    num if num is not None and num >= -1 else None,
                )
                ok = True  # enum-style: consumed even on a bad value
            elif k == "delta.dataSkippingStatsColumns":
                cols = parse_column_name_list(v)
                ok = put(
                    "data_skipping_stats_columns",
                    tuple(cols) if cols is not None else None,
                )
            elif k == "delta.deletedFileRetentionDuration":
                ok = put("deleted_file_retention_duration", parse_interval_ms(v))
            elif k == "delta.enableChangeDataFeed":
                ok = put("enable_change_data_feed", parse_bool(v))
            elif k == "delta.enableDeletionVectors":
                ok = put("enable_deletion_vectors", parse_bool(v))
            elif k == "delta.enableTypeWidening":
                ok = put("enable_type_widening", parse_bool(v))
            elif k == "delta.enableIcebergCompatV1":
                ok = put("enable_iceberg_compat_v1", parse_bool(v))
            elif k == "delta.enableIcebergCompatV2":
                ok = put("enable_iceberg_compat_v2", parse_bool(v))
            elif k == "delta.enableIcebergCompatV3":
                ok = put("enable_iceberg_compat_v3", parse_bool(v))
            elif k == "delta.isolationLevel":
                put("isolation_level", v if v in ISOLATION_LEVELS else None)
                ok = True  # enum-style: consumed even on a bad value
            elif k == "delta.logRetentionDuration":
                ok = put("log_retention_duration", parse_interval_ms(v))
            elif k == "delta.enableExpiredLogCleanup":
                ok = put("enable_expired_log_cleanup", parse_bool(v))
            elif k == "delta.randomizeFilePrefixes":
                ok = put("randomize_file_prefixes", parse_bool(v))
            elif k == "delta.randomPrefixLength":
                ok = put("random_prefix_length", parse_positive_int(v))
            elif k == "delta.setTransactionRetentionDuration":
                ok = put("set_transaction_retention_duration", parse_interval_ms(v))
            elif k == "delta.targetFileSize":
                ok = put("target_file_size", parse_positive_int(v))
            elif k == "delta.tuneFileSizesForRewrites":
                ok = put("tune_file_sizes_for_rewrites", parse_bool(v))
            elif k == "delta.checkpointPolicy":
                put("checkpoint_policy", v if v in CHECKPOINT_POLICIES else None)
                ok = True  # enum-style: consumed even on a bad value
            elif k == "delta.enableRowTracking":
                ok = put("enable_row_tracking", parse_bool(v))
            elif k == "delta.rowTrackingSuspended":
                ok = put("row_tracking_suspended", parse_bool(v))
            elif k == "delta.rowTracking.materializedRowIdColumnName":
                ok = put("materialized_row_id_column_name", v)
            elif k == "delta.rowTracking.materializedRowCommitVersionColumnName":
                ok = put("materialized_row_commit_version_column_name", v)
            elif k == "delta.parquet.format.version":
                ok = put("parquet_format_version", v)
            elif k == "delta.parquet.compression.codec":
                # unrecognized codecs stay in unknown_properties so a
                # connector can fall back itself (reference try_parse note)
                ok = put("parquet_compression_codec", _PARQUET_CODECS.get(v.lower()))
            elif k == "delta.enableInCommitTimestamps":
                ok = put("enable_in_commit_timestamps", parse_bool(v))
            elif k == "delta.inCommitTimestampEnablementVersion":
                ok = put("in_commit_timestamp_enablement_version", parse_non_negative(v))
            elif k == "delta.inCommitTimestampEnablementTimestamp":
                ok = put(
                    "in_commit_timestamp_enablement_timestamp", parse_non_negative(v)
                )
            if not ok:
                unknown[k] = v
        return cls(unknown_properties=unknown, **parsed)
