"""Delta partition-value serialization (reference:
kernel/src/partition/serialization.rs; parsing via per-type cast semantics
of kernel/src/scan/transform_spec.rs:76+ / MapToStruct
kernel/src/expressions/mod.rs:643-666).

``add.partitionValues`` is a ``map<string,string>``; the string forms are:
dates ``YYYY-MM-DD``, timestamps ``YYYY-MM-DD HH:MM:SS[.ffffff]``, decimals
plain, booleans ``true/false``, null = JSON null (and
``__HIVE_DEFAULT_PARTITION__`` in directory names). Empty string parses to
NULL for every type except string/binary.

WRITE-path caveat (tests/test_partition_fuzz.py): the hive directory
sentinel is not injective — Spark's dir escaper maps both NULL and the
EMPTY STRING to ``__HIVE_DEFAULT_PARTITION__`` (and writes the literal
sentinel string verbatim). Writers deriving partitionValues from directory
names (this engine, delta-spark's commit protocol alike) therefore
collapse ``''`` to NULL on write — the documented delta-spark quirk this
engine matches — and this engine REFUSES a literal-sentinel string value
outright (transaction._guard_hive_sentinel_literal) rather than corrupt it
to NULL. The READ path still honors a foreign-written ``""`` in
add.partitionValues as a real empty string.
"""

from __future__ import annotations

import datetime as _dt
import urllib.parse
from decimal import Decimal
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"


def parse_partition_column(raw: Column, data_type: T.DataType) -> Column:
    """Typed column from the raw partition-value string.

    Spark's string→T cast implements Delta's parse semantics (SURVEY §2.3
    MapToStruct row); the one extra rule is empty-string→NULL for
    non-string types (reference kernel/src/expressions/mod.rs:653-656).
    """
    if isinstance(data_type, (T.StringType,)):
        return raw
    if isinstance(data_type, T.BinaryType):
        return raw.cast("binary")
    cleaned = F.when(raw == "", F.lit(None)).otherwise(raw)
    return cleaned.cast(data_type)


def serialize_partition_value(value: Any, data_type: T.DataType) -> str | None:
    """Python value → Delta partition string (write path)."""
    if value is None:
        return None
    if isinstance(data_type, T.DateType):
        return value.isoformat() if isinstance(value, _dt.date) else str(value)
    if isinstance(data_type, (T.TimestampType, T.TimestampNTZType)):
        if isinstance(value, _dt.datetime):
            return value.strftime("%Y-%m-%d %H:%M:%S.%f")
        return str(value)
    if isinstance(data_type, T.BooleanType):
        return "true" if value else "false"
    if isinstance(data_type, T.DecimalType):
        return str(Decimal(value))
    if isinstance(data_type, T.BinaryType):
        return bytes(value).decode("latin-1")
    return str(value)


def parse_hive_partition_path(rel_dir: str) -> dict[str, str | None]:
    """``a=1/b=__HIVE_DEFAULT_PARTITION__`` → {"a": "1", "b": None}.

    Spark writes hive-style partition dirs with URL-escaped values; Delta
    stores the unescaped value in ``partitionValues``.
    """
    out: dict[str, str | None] = {}
    for seg in rel_dir.split("/"):
        if not seg or "=" not in seg:
            continue
        key, _, val = seg.partition("=")
        key = urllib.parse.unquote(key)
        if val == HIVE_DEFAULT_PARTITION:
            out[key] = None
        else:
            out[key] = urllib.parse.unquote(val)
    return out
