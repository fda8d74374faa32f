"""Schema-evolution diff validation.

Mirrors the reference's schema diff rules (kernel/src/schema/diff.rs,
2,824 LoC; transaction/builder/schema_evolution.rs): an ALTER TABLE may
  * add new nullable columns,
  * widen primitive types along byte → short → int → long and
    float → double (the widening lattice at kernel/src/schema/
    mod.rs:2030-2087),
  * relax non-null to nullable,
and may NOT drop or rename columns (unless column mapping provides stable
physical identity), narrow or otherwise change types, tighten nullability,
or touch partition columns.
"""

from __future__ import annotations

from pyspark.sql import types as T

from delta_kernel_rs_spark.functions.schema_codec import physical_name


class SchemaEvolutionError(Exception):
    pass


_WIDENINGS: dict[type, tuple[type, ...]] = {
    T.ByteType: (T.ShortType, T.IntegerType, T.LongType),
    T.ShortType: (T.IntegerType, T.LongType),
    T.IntegerType: (T.LongType,),
    T.FloatType: (T.DoubleType,),
}


def is_widening(old: T.DataType, new: T.DataType) -> bool:
    allowed = _WIDENINGS.get(type(old), ())
    return isinstance(new, allowed)


def validate_schema_evolution(
    old: T.StructType,
    new: T.StructType,
    partition_columns: list[str],
    column_mapping_mode: str = "none",
) -> None:
    """Raise :class:`SchemaEvolutionError` unless ``old -> new`` is legal."""
    cm = column_mapping_mode != "none"
    key = (lambda f: physical_name(f)) if cm else (lambda f: f.name)
    old_by_key = {key(f): f for f in old.fields}
    new_by_key = {key(f): f for f in new.fields}
    if len(new_by_key) != len(new.fields):
        raise SchemaEvolutionError("duplicate field identities in new schema")

    for k, f in old_by_key.items():
        nf = new_by_key.get(k)
        if nf is None:
            if cm:
                continue  # physical identity allows drops under column mapping
            raise SchemaEvolutionError(
                f"cannot drop column {f.name!r} without column mapping"
            )
        if not cm and nf.name != f.name:
            raise SchemaEvolutionError(
                f"cannot rename column {f.name!r} without column mapping"
            )
        if nf.dataType != f.dataType and not is_widening(f.dataType, nf.dataType):
            raise SchemaEvolutionError(
                f"illegal type change for {f.name!r}: "
                f"{f.dataType.simpleString()} -> {nf.dataType.simpleString()}"
            )
        if f.nullable and not nf.nullable:
            raise SchemaEvolutionError(
                f"cannot tighten nullability of {f.name!r}"
            )

    for k, nf in new_by_key.items():
        if k not in old_by_key and not nf.nullable:
            raise SchemaEvolutionError(
                f"new column {nf.name!r} must be nullable "
                "(existing files have no values for it)"
            )

    pset = set(partition_columns)
    old_parts = [f.name for f in old.fields if f.name in pset]
    new_parts = [f.name for f in new.fields if f.name in pset]
    if old_parts != new_parts:
        raise SchemaEvolutionError("partition columns cannot be changed")
    for p in partition_columns:
        of = next((f for f in old.fields if f.name == p), None)
        nf = next((f for f in new.fields if f.name == p), None)
        if of is not None and nf is not None and of.dataType != nf.dataType:
            raise SchemaEvolutionError(f"partition column {p!r} type cannot change")


def merge_append_schema(
    old: T.StructType, incoming: T.StructType
) -> T.StructType:
    """Merged table schema for a mergeSchema append (the auto-evolution
    writers expect from Delta's ``mergeSchema`` option):

    * columns in both: keep the table's field (metadata, nullability);
      widen the type along the widening lattice when the incoming type is
      strictly wider; incoming-narrower values cast up losslessly at write;
      any other type change raises.
    * incoming-only columns: appended at the end, nullable.
    * table-only columns: kept (absent from the written files → NULL on
      read, the standard parquet-absent-column resolution).

    Matching is by (case-insensitive) column name — the incoming DataFrame
    has no column-mapping identity; new fields get physical ids from the
    normal ALTER path when column mapping is enabled.
    """
    old_by_name = {f.name.lower(): f for f in old.fields}
    inc_by_name = {f.name.lower(): f for f in incoming.fields}
    if len(inc_by_name) != len(incoming.fields):
        raise SchemaEvolutionError("incoming schema has duplicate column names")

    fields: list[T.StructField] = []
    for f in old.fields:
        inc = inc_by_name.get(f.name.lower())
        if inc is None or inc.dataType == f.dataType:
            fields.append(f)
        elif is_widening(f.dataType, inc.dataType):
            fields.append(
                T.StructField(f.name, inc.dataType, f.nullable, f.metadata)
            )
        elif is_widening(inc.dataType, f.dataType):
            fields.append(f)  # incoming is narrower: cast up at write
        else:
            raise SchemaEvolutionError(
                f"column {f.name}: incoming type "
                f"{inc.dataType.simpleString()} is incompatible with table "
                f"type {f.dataType.simpleString()}"
            )
    for f in incoming.fields:
        if f.name.lower() not in old_by_name:
            fields.append(T.StructField(f.name, f.dataType, True))
    return T.StructType(fields)
