"""Per-file stats collection on write + the stats JSON contract.

Mirrors the reference's write-side stats (default-engine/src/stats.rs):
``numRecords``, per-column ``nullCount`` / ``minValues`` / ``maxValues``
with the truncation rules that are a *correctness contract* for readers:

* strings: min may truncate down to a 32-char prefix; max must round UP —
  truncate then increment the last character (stats.rs:52 truncate_min_string,
  :86 truncate_max_string);
* timestamps: truncated (not rounded) to milliseconds, serialized
  ``yyyy-MM-dd'T'HH:mm:ss.SSS'Z'`` (kernel/src/expressions/mod.rs:103-125
  ToJson contract) — readers must widen max bounds by 1ms (see
  plans/data_skipping.py);
* non-finite floats are excluded from min/max;
* binary is excluded from min/max entirely.

The collection itself is a distributed Spark job (groupBy file path), not a
driver loop — at 100 TB a single commit can add thousands of files.
"""

from __future__ import annotations

import datetime as _dt
import json
import math
from decimal import Decimal
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

STRING_PREFIX_LEN = 32
DEFAULT_NUM_INDEXED_COLS = 32

_MINMAX_ELIGIBLE = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.DecimalType,
    T.StringType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
)


def eligible_stats_columns(
    schema: T.StructType, num_indexed: int = DEFAULT_NUM_INDEXED_COLS
) -> list[T.StructField]:
    """First N top-level leaf columns eligible for min/max stats
    (arrays/maps/structs are skipping-ineligible — reference
    kernel/src/scan/mod.rs:558-564; ``dataSkippingNumIndexedCols``)."""
    out = []
    for f in schema.fields[:num_indexed]:
        if isinstance(f.dataType, _MINMAX_ELIGIBLE):
            out.append(f)
    return out


def collect_file_stats(
    spark: SparkSession,
    paths: list[str],
    read_schema: T.StructType,
    num_indexed: int = DEFAULT_NUM_INDEXED_COLS,
) -> dict[str, dict[str, Any]]:
    """Distributed stats job: one output row per file.

    Returns ``{normalized_file_path: {"numRecords": n, "min": {...},
    "max": {...}, "nullCount": {...}}}`` with raw (untruncated) values —
    truncation happens at JSON-serialization time.
    """
    from delta_kernel_rs_spark.sources.scan import normalize_file_path

    df = spark.read.schema(read_schema).parquet(*paths)
    cols = eligible_stats_columns(read_schema, num_indexed)
    aggs = [F.count(F.lit(1)).alias("__numRecords")]
    for f in cols:
        aggs.append(F.min(f.name).alias(f"__min__{f.name}"))
        aggs.append(F.max(f.name).alias(f"__max__{f.name}"))
        aggs.append(
            F.sum(F.when(F.col(f.name).isNull(), 1).otherwise(0)).alias(
                f"__null__{f.name}"
            )
        )
    grouped = df.groupBy(
        normalize_file_path(F.col("_metadata.file_path")).alias("__path")
    ).agg(*aggs)
    result: dict[str, dict[str, Any]] = {}
    for row in grouped.collect():
        d = row.asDict()
        stats = {
            "numRecords": d["__numRecords"],
            "min": {},
            "max": {},
            "nullCount": {},
        }
        for f in cols:
            stats["min"][f.name] = d[f"__min__{f.name}"]
            stats["max"][f.name] = d[f"__max__{f.name}"]
            stats["nullCount"][f.name] = d[f"__null__{f.name}"]
        result[d["__path"]] = stats
    return result


def collect_file_stats_footer(
    spark: SparkSession,
    paths: list[str],
    read_schema: T.StructType,
    num_indexed: int = DEFAULT_NUM_INDEXED_COLS,
) -> dict[str, dict[str, Any]]:
    """Footer-only stats: aggregate parquet row-group statistics per file.

    Zero data reads — the writer's row-group stats already hold min/max/
    null-count (the reference reads them the same way via
    read_parquet_footer, kernel/src/lib.rs:1011-1067). Footers are parsed
    on executors (pyarrow over pyarrow.fs), so a thousand-file commit costs
    one tiny task per file batch, not a second pass over the data.

    Columns whose stats the writer omitted (e.g. NaN-bearing floats) are
    simply absent from min/max — readers treat missing stats as unknown.
    """
    eligible = {f.name for f in eligible_stats_columns(read_schema, num_indexed)}

    def read_footers(it):
        import pyarrow.fs as pafs
        import pyarrow.parquet as pq

        for path in it:
            if "://" in path:
                fs, rel = pafs.FileSystem.from_uri(path)
            else:
                # never URI-encode local paths: partition directories may
                # carry spaces / percent-escapes that break URI parsing
                fs, rel = pafs.LocalFileSystem(), path
            try:
                meta = pq.read_metadata(rel, filesystem=fs)
            except OSError:
                # Footer carries a logical type this pyarrow build cannot
                # parse (e.g. Spark VARIANT). Stats become unknown for the
                # whole file — readers already treat missing stats that way.
                yield path, None
                continue
            mins: dict[str, Any] = {}
            maxs: dict[str, Any] = {}
            nulls: dict[str, Any] = {}
            bad_bounds: set[str] = set()
            bad_nulls: set[str] = set()
            for rg in range(meta.num_row_groups):
                group = meta.row_group(rg)
                for ci in range(group.num_columns):
                    col = group.column(ci)
                    name = col.path_in_schema
                    if "." in name or name not in eligible:
                        continue
                    st = col.statistics
                    has_nc = st is not None and st.has_null_count
                    if has_nc:
                        nulls[name] = nulls.get(name, 0) + st.null_count
                    else:
                        bad_nulls.add(name)
                    if st is None or not st.has_min_max:
                        # Bounds survive a stats-less group only if it is
                        # provably all-null (nulls don't affect min/max).
                        if not (has_nc and st.null_count == group.num_rows):
                            bad_bounds.add(name)
                        continue
                    try:
                        lo, hi = st.min, st.max
                    except Exception:
                        # pyarrow cannot cast statistics for this physical
                        # type (binary, int96, ...) — bounds unknown, which
                        # readers already treat as not-skippable.
                        bad_bounds.add(name)
                        continue
                    if name not in mins or lo < mins[name]:
                        mins[name] = lo
                    if name not in maxs or hi > maxs[name]:
                        maxs[name] = hi
            for name in bad_bounds:
                mins.pop(name, None)
                maxs.pop(name, None)
            for name in bad_nulls:
                nulls.pop(name, None)
            yield path, {
                "numRecords": meta.num_rows,
                "min": mins,
                "max": maxs,
                "nullCount": nulls,
            }

    n_slices = max(1, min(len(paths), 64))
    rows = (
        spark.sparkContext.parallelize(paths, n_slices)
        .mapPartitions(lambda it: read_footers(it))
        .collect()
    )
    return dict(rows)


def truncate_min_string(s: str, prefix_len: int = STRING_PREFIX_LEN) -> str:
    return s[:prefix_len]


def truncate_max_string(s: str, prefix_len: int = STRING_PREFIX_LEN) -> str | None:
    """Valid UPPER bound after truncation: increment the last kept char.

    Returns None when no valid bound exists (all kept chars are at the max
    code point) — the column is then omitted from maxValues.
    """
    if len(s) <= prefix_len:
        return s
    kept = list(s[:prefix_len])
    for i in range(len(kept) - 1, -1, -1):
        cp = ord(kept[i])
        if cp < 0x10FFFF:
            kept[i] = chr(cp + 1)
            return "".join(kept[: i + 1])
    return None


def _ts_to_stat(value: _dt.datetime) -> str:
    """Truncate (floor) to milliseconds; 3 fractional digits; 'Z' suffix."""
    ms = value.microsecond // 1000
    return value.strftime("%Y-%m-%dT%H:%M:%S") + f".{ms:03d}Z"


def _stat_value(value: Any, data_type: T.DataType, is_max: bool) -> Any:
    if value is None:
        return None
    if isinstance(data_type, (T.FloatType, T.DoubleType)):
        if isinstance(value, float) and not math.isfinite(value):
            return None
        return value
    if isinstance(data_type, T.StringType):
        return (
            truncate_max_string(value) if is_max else truncate_min_string(value)
        )
    if isinstance(data_type, (T.TimestampType, T.TimestampNTZType)):
        return _ts_to_stat(value)
    if isinstance(data_type, T.DateType):
        return value.isoformat()
    if isinstance(value, Decimal):
        return float(value) if value == value.to_integral_value() else str(value)
    return value


def stats_json(raw: dict[str, Any], schema: T.StructType) -> str:
    """Serialize one file's stats to the ``add.stats`` JSON document."""
    types = {f.name: f.dataType for f in schema.fields}
    min_values: dict[str, Any] = {}
    max_values: dict[str, Any] = {}
    null_count: dict[str, Any] = {}
    for name, value in raw.get("min", {}).items():
        v = _stat_value(value, types[name], is_max=False)
        if v is not None:
            min_values[name] = v
    for name, value in raw.get("max", {}).items():
        v = _stat_value(value, types[name], is_max=True)
        if v is not None:
            max_values[name] = v
    for name, value in raw.get("nullCount", {}).items():
        if value is not None:
            null_count[name] = value
    doc = {
        "numRecords": raw["numRecords"],
        "minValues": min_values,
        "maxValues": max_values,
        "nullCount": null_count,
    }
    return json.dumps(doc, separators=(",", ":"), default=str)
