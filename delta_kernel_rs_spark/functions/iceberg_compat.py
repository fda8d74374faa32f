"""IcebergCompat writer-feature validation (UniForm tables).

``delta.enableIcebergCompatV{N}=true`` promises that every file this
writer lands can also be committed to an Apache Iceberg table, which
constrains the table's OTHER features and its schema. This engine
implements **icebergCompatV2**; V1 and V3 enablement is refused with a
clear error (mirroring the reference, which supports exactly one
version and refuses the others — kernel/src/table_features/mod.rs:
407-448 V1/V2 FeatureInfo requirement lists, 464-482 V3; validator
plumbing kernel/src/table_features/iceberg_compat/mod.rs).

V2 requirements enforced here (PROTOCOL.md writer requirements for
icebergCompatV2; reference mod.rs:430-438):
- columnMapping must be ENABLED (field ids in parquet are how Iceberg
  readers resolve columns; the column-mapping write path already emits
  ``parquet.field.id`` — functions/schema_codec.py);
- deletionVectors must NOT be enabled (Iceberg V2 readers cannot apply
  Delta DVs);
- icebergCompatV1 / V3 must NOT be enabled (versions are exclusive);
- every schema type must sit in the V2 allowlist: the primitive types
  byte/short/integer/long/float/double/boolean/binary/string/date/
  timestamp/timestampNtz/decimal plus array/map/struct nesting — no
  variant, no void/null (reference CheckTypeInV2AllowList via
  iceberg_compat::check_only_supported_types).
"""

from __future__ import annotations

from pyspark.sql import types as T

ENABLE_KEYS = {
    1: "delta.enableIcebergCompatV1",
    2: "delta.enableIcebergCompatV2",
    3: "delta.enableIcebergCompatV3",
}

FEATURE_NAMES = {1: "icebergCompatV1", 2: "icebergCompatV2", 3: "icebergCompatV3"}


class IcebergCompatError(ValueError):
    pass


def enabled_versions(configuration: dict) -> list[int]:
    """Iceberg-compat versions enabled by table properties."""
    out = []
    for v, key in ENABLE_KEYS.items():
        if str(configuration.get(key, "")).strip().lower() == "true":
            out.append(v)
    return out


_V2_PRIMITIVES = (
    T.ByteType,
    T.ShortType,
    T.IntegerType,
    T.LongType,
    T.FloatType,
    T.DoubleType,
    T.BooleanType,
    T.BinaryType,
    T.StringType,
    T.DateType,
    T.TimestampType,
    T.TimestampNTZType,
    T.DecimalType,
)


def _first_unsupported_v2(dt: T.DataType, path: str) -> str | None:
    """Dotted path + type of the first field outside the V2 allowlist, or
    None (reference TypeAllowListVisitor — iceberg_compat/mod.rs)."""
    if isinstance(dt, T.StructType):
        for f in dt.fields:
            hit = _first_unsupported_v2(f.dataType, f"{path}.{f.name}" if path else f.name)
            if hit:
                return hit
        return None
    if isinstance(dt, T.ArrayType):
        return _first_unsupported_v2(dt.elementType, f"{path}.element")
    if isinstance(dt, T.MapType):
        return _first_unsupported_v2(dt.keyType, f"{path}.key") or _first_unsupported_v2(
            dt.valueType, f"{path}.value"
        )
    if isinstance(dt, _V2_PRIMITIVES):
        return None
    return f"{path} ({dt.simpleString()})"


def validate_iceberg_compat(
    configuration: dict, schema: T.StructType | None, cm_mode: str
) -> int | None:
    """Validate iceberg-compat enablement; returns the active version (2)
    or None. Raises :class:`IcebergCompatError` on V1/V3 enablement or a
    violated V2 requirement."""
    versions = enabled_versions(configuration)
    if not versions:
        return None
    if len(versions) > 1:
        raise IcebergCompatError(
            f"icebergCompat versions are mutually exclusive; enabled: {versions}"
        )
    (v,) = versions
    if v != 2:
        raise IcebergCompatError(
            f"icebergCompatV{v} writes are not supported by this engine "
            "(icebergCompatV2 is); remove "
            f"{ENABLE_KEYS[v]} or use delta.enableIcebergCompatV2"
        )
    if cm_mode == "none":
        raise IcebergCompatError(
            "icebergCompatV2 requires column mapping "
            "(set delta.columnMapping.mode to 'name' or 'id'): Iceberg "
            "readers resolve columns by parquet field id"
        )
    if str(configuration.get("delta.enableDeletionVectors", "")).strip().lower() == "true":
        raise IcebergCompatError(
            "icebergCompatV2 forbids deletion vectors "
            "(delta.enableDeletionVectors=true)"
        )
    if schema is not None:
        hit = _first_unsupported_v2(schema, "")
        if hit:
            raise IcebergCompatError(
                f"icebergCompatV2 does not support type at column: {hit}"
            )
    return 2
