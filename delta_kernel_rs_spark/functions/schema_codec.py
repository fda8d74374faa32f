"""Delta ``schemaString`` JSON ⇄ Spark StructType codec.

The Delta log persists the table schema as a JSON document inside the
``metaData`` action (reference: kernel/src/schema/mod.rs:2169-2254 serde
impls; type spellings at kernel/src/schema/mod.rs:1972-2017). The dialect is
nearly identical to Spark's ``StructType.json()``; the differences we handle
explicitly are the interval spellings, ``variant``, and tolerance for
unknown physical metadata keys.
"""

from __future__ import annotations

import json
import re
from typing import Any

from pyspark.sql import types as T

_PRIMITIVES: dict[str, T.DataType] = {
    "string": T.StringType(),
    "long": T.LongType(),
    "integer": T.IntegerType(),
    "short": T.ShortType(),
    "byte": T.ByteType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "boolean": T.BooleanType(),
    "binary": T.BinaryType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    "timestamp_ntz": T.TimestampNTZType(),
    "void": T.NullType(),
}

_DECIMAL_RE = re.compile(r"^decimal\(\s*(\d+)\s*,\s*(-?\d+)\s*\)$")

# Field-metadata keys the kernel defines (kernel/src/schema/mod.rs:253-320).
COLUMN_MAPPING_ID_KEY = "delta.columnMapping.id"
COLUMN_MAPPING_PHYSICAL_NAME_KEY = "delta.columnMapping.physicalName"
PARQUET_FIELD_ID_KEY = "parquet.field.id"
GENERATION_EXPRESSION_KEY = "delta.generationExpression"
INVARIANTS_KEY = "delta.invariants"


def parse_type(obj: Any) -> T.DataType:
    """Parse a Delta schema JSON type node into a Spark DataType."""
    if isinstance(obj, str):
        if obj in _PRIMITIVES:
            return _PRIMITIVES[obj]
        m = _DECIMAL_RE.match(obj)
        if m:
            return T.DecimalType(int(m.group(1)), int(m.group(2)))
        if obj == "decimal":
            return T.DecimalType(10, 0)
        if obj in ("interval year to month", "interval year", "interval month"):
            return T.YearMonthIntervalType()
        if obj.startswith("interval"):
            return T.DayTimeIntervalType()
        if obj == "variant":
            return T.VariantType()
        raise ValueError(f"unsupported Delta primitive type: {obj!r}")
    kind = obj.get("type")
    if kind == "struct":
        return T.StructType([parse_field(f) for f in obj["fields"]])
    if kind == "array":
        return T.ArrayType(parse_type(obj["elementType"]), bool(obj.get("containsNull", True)))
    if kind == "map":
        return T.MapType(
            parse_type(obj["keyType"]),
            parse_type(obj["valueType"]),
            bool(obj.get("valueContainsNull", True)),
        )
    raise ValueError(f"unsupported Delta type node: {obj!r}")


def parse_field(obj: dict[str, Any]) -> T.StructField:
    return T.StructField(
        obj["name"],
        parse_type(obj["type"]),
        bool(obj.get("nullable", True)),
        dict(obj.get("metadata") or {}),
    )


def parse_schema_string(schema_string: str) -> T.StructType:
    """``metaData.schemaString`` → StructType."""
    parsed = json.loads(schema_string)
    dt = parse_type(parsed)
    if not isinstance(dt, T.StructType):
        raise ValueError("schemaString root must be a struct")
    return dt


def _type_to_json(dt: T.DataType) -> Any:
    if isinstance(dt, T.StructType):
        return {"type": "struct", "fields": [_field_to_json(f) for f in dt.fields]}
    if isinstance(dt, T.ArrayType):
        return {
            "type": "array",
            "elementType": _type_to_json(dt.elementType),
            "containsNull": dt.containsNull,
        }
    if isinstance(dt, T.MapType):
        return {
            "type": "map",
            "keyType": _type_to_json(dt.keyType),
            "valueType": _type_to_json(dt.valueType),
            "valueContainsNull": dt.valueContainsNull,
        }
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp_ntz"
    if isinstance(dt, T.NullType):
        return "void"
    if isinstance(dt, T.YearMonthIntervalType):
        return "interval year to month"
    if isinstance(dt, T.DayTimeIntervalType):
        return "interval day to second"
    if isinstance(dt, T.VariantType):
        # kernel/src/schema/mod.rs:2298-2301 — `variant` round-trips as a
        # primitive spelling (parse side is parse_type above).
        return "variant"
    for name, spark_type in _PRIMITIVES.items():
        if dt == spark_type:
            return name
    raise ValueError(f"cannot serialize Spark type to Delta schema JSON: {dt}")


def _field_to_json(f: T.StructField) -> dict[str, Any]:
    meta = f.metadata or {}
    return {
        "name": f.name,
        "type": _type_to_json(f.dataType),
        "nullable": f.nullable,
        "metadata": meta,
    }


def to_schema_string(schema: T.StructType) -> str:
    """StructType → ``metaData.schemaString`` JSON."""
    return json.dumps(_type_to_json(schema), separators=(",", ":"))


def assign_column_mapping(
    schema: T.StructType, start_id: int = 0
) -> tuple[T.StructType, int]:
    """Assign column-mapping physical names + field ids to a fresh schema.

    Used at CREATE TABLE time when ``delta.columnMapping.mode`` is ``name``
    or ``id`` (reference kernel/src/table_features/column_mapping.rs):
    every field — INCLUDING nested struct fields inside structs, arrays,
    and maps, per the Delta column-mapping spec — gets a stable
    ``col-<uuid>`` physical (parquet) name, a ``delta.columnMapping.id``
    and matching ``parquet.field.id``. Returns (annotated schema, max
    assigned column id).
    """
    import uuid as _uuid

    next_id = start_id

    def walk_type(dt: T.DataType) -> T.DataType:
        nonlocal next_id
        if isinstance(dt, T.StructType):
            out = []
            for f in dt.fields:
                meta = dict(f.metadata or {})
                if COLUMN_MAPPING_PHYSICAL_NAME_KEY not in meta:
                    next_id += 1
                    meta[COLUMN_MAPPING_ID_KEY] = next_id
                    meta[COLUMN_MAPPING_PHYSICAL_NAME_KEY] = f"col-{_uuid.uuid4()}"
                    meta[PARQUET_FIELD_ID_KEY] = meta[COLUMN_MAPPING_ID_KEY]
                else:
                    next_id = max(next_id, int(meta.get(COLUMN_MAPPING_ID_KEY, 0)))
                out.append(
                    T.StructField(f.name, walk_type(f.dataType), f.nullable, meta)
                )
            return T.StructType(out)
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(walk_type(dt.elementType), dt.containsNull)
        if isinstance(dt, T.MapType):
            return T.MapType(
                walk_type(dt.keyType), walk_type(dt.valueType), dt.valueContainsNull
            )
        return dt

    annotated = walk_type(schema)
    return annotated, next_id


def max_column_id(schema: T.StructType) -> int:
    """Highest assigned column-mapping id anywhere in the schema,
    nested struct fields included."""

    def walk(dt: T.DataType) -> int:
        if isinstance(dt, T.StructType):
            return max(
                (
                    max(
                        int((f.metadata or {}).get(COLUMN_MAPPING_ID_KEY, 0)),
                        walk(f.dataType),
                    )
                    for f in dt.fields
                ),
                default=0,
            )
        if isinstance(dt, T.ArrayType):
            return walk(dt.elementType)
        if isinstance(dt, T.MapType):
            return max(walk(dt.keyType), walk(dt.valueType))
        return 0

    return walk(schema)


def physical_name(field: T.StructField) -> str:
    """Physical (parquet) column name under column mapping mode ``name``.

    Reference: kernel/src/table_features/column_mapping.rs:28-34 — when the
    field carries a ``delta.columnMapping.physicalName`` metadata key, reads
    must address the parquet column by that name and rename to the logical
    name in the output.
    """
    meta = field.metadata or {}
    return meta.get(COLUMN_MAPPING_PHYSICAL_NAME_KEY, field.name)


def quoted(name: str) -> str:
    """Backtick-quote a column name for ``F.col`` — names with literal
    dots or backticks (legal in Delta; e.g. the reference's
    cdf-table-backtick-column-names fixture) would otherwise parse as
    nested-field paths."""
    return "`" + name.replace("`", "``") + "`"


def physical_data_type(dt: T.DataType) -> T.DataType:
    """Recursively apply column-mapping physical names INSIDE nested
    types: struct fields in structs/arrays/maps carry their own
    ``delta.columnMapping.physicalName`` metadata, and parquet stores
    them under those names (reference column_mapping.rs — mapping applies
    to every nested field, not just roots; caught by the golden tables
    ``table-with-columnmapping-mode-{name,id}``). Fields without the
    metadata keep their logical name, so engine-written tables (which
    map at the root only) round-trip unchanged."""
    if isinstance(dt, T.StructType):
        return T.StructType(
            [
                T.StructField(
                    physical_name(f),
                    physical_data_type(f.dataType),
                    f.nullable,
                    f.metadata,
                )
                for f in dt.fields
            ]
        )
    if isinstance(dt, T.ArrayType):
        return T.ArrayType(physical_data_type(dt.elementType), dt.containsNull)
    if isinstance(dt, T.MapType):
        return T.MapType(
            physical_data_type(dt.keyType),
            physical_data_type(dt.valueType),
            dt.valueContainsNull,
        )
    return dt
