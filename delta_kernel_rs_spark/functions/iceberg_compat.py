"""IcebergCompat writer-feature validation (UniForm tables).

``delta.enableIcebergCompatV{N}=true`` promises that every file this
writer lands can also be committed to an Apache Iceberg table, which
constrains the table's OTHER features and its schema. This engine
implements **icebergCompatV2 and V3**; V1 enablement is refused with a
clear error (the reference's requirement matrices:
kernel/src/table_features/mod.rs:407-448 V1/V2 FeatureInfo lists,
464-482 V3; validator plumbing and the V3 type/nested-id checks
kernel/src/table_features/iceberg_compat/mod.rs + v3.rs).

V2 requirements enforced here (PROTOCOL.md writer requirements for
icebergCompatV2; reference mod.rs:430-438):
- columnMapping must be ENABLED (field ids in parquet are how Iceberg
  readers resolve columns; the column-mapping write path already emits
  ``parquet.field.id`` — functions/schema_codec.py);
- deletionVectors must NOT be enabled (Iceberg V2 readers cannot apply
  Delta DVs);
- other icebergCompat versions must NOT be enabled (exclusive);
- every schema type must sit in the V2 allowlist: the primitive types
  byte/short/integer/long/float/double/boolean/binary/string/date/
  timestamp/timestampNtz/decimal plus array/map/struct nesting — no
  variant, no void/null (reference CheckTypeInV2AllowList via
  iceberg_compat::check_only_supported_types).

V3 requirements (reference mod.rs:464-482 + iceberg_compat/v3.rs):
- columnMapping AND rowTracking must be enabled; deletion vectors are
  PERMITTED (the V3 RFC allows them);
- V1/V2 must not be enabled;
- the V3 type allowlist is V2's plus VARIANT;
- no field may carry the deprecated ``parquet.field.nested.ids``
  metadata (check_no_legacy_nested_ids, delta issue #6688).
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


def _first_unsupported(
    dt: T.DataType, path: str, allow_variant: bool
) -> str | None:
    """Dotted path + type of the first field outside the allowlist, or
    None (reference TypeAllowListVisitor — iceberg_compat/mod.rs)."""
    if isinstance(dt, T.StructType):
        for f in dt.fields:
            hit = _first_unsupported(
                f.dataType, f"{path}.{f.name}" if path else f.name, allow_variant
            )
            if hit:
                return hit
        return None
    if isinstance(dt, T.ArrayType):
        return _first_unsupported(dt.elementType, f"{path}.element", allow_variant)
    if isinstance(dt, T.MapType):
        return _first_unsupported(
            dt.keyType, f"{path}.key", allow_variant
        ) or _first_unsupported(dt.valueType, f"{path}.value", allow_variant)
    if isinstance(dt, _V2_PRIMITIVES):
        return None
    if allow_variant and isinstance(dt, T.VariantType):
        return None
    return f"{path} ({dt.simpleString()})"


def _first_legacy_nested_ids(dt: T.DataType, path: str) -> str | None:
    """First field carrying deprecated ``parquet.field.nested.ids``
    metadata (reference check_no_legacy_nested_ids; delta issue #6688)."""
    if isinstance(dt, T.StructType):
        for f in dt.fields:
            p2 = f"{path}.{f.name}" if path else f.name
            if "parquet.field.nested.ids" in (f.metadata or {}):
                return p2
            hit = _first_legacy_nested_ids(f.dataType, p2)
            if hit:
                return hit
        return None
    if isinstance(dt, T.ArrayType):
        return _first_legacy_nested_ids(dt.elementType, path)
    if isinstance(dt, T.MapType):
        return _first_legacy_nested_ids(
            dt.keyType, path
        ) or _first_legacy_nested_ids(dt.valueType, path)
    return None


def validate_iceberg_compat(
    configuration: dict, schema: T.StructType | None, cm_mode: str
) -> int | None:
    """Validate iceberg-compat enablement; returns the active version
    (2 or 3) or None. Raises :class:`IcebergCompatError` on V1
    enablement or any violated requirement."""
    versions = enabled_versions(configuration)
    if not versions:
        return None
    if len(versions) > 1:
        raise IcebergCompatError(
            f"icebergCompat versions are mutually exclusive; enabled: {versions}"
        )
    (v,) = versions
    if v == 1:
        raise IcebergCompatError(
            "icebergCompatV1 writes are not supported by this engine "
            "(icebergCompatV2/V3 are); remove "
            f"{ENABLE_KEYS[1]} or use delta.enableIcebergCompatV2"
        )
    if cm_mode == "none":
        raise IcebergCompatError(
            f"icebergCompatV{v} requires column mapping "
            "(set delta.columnMapping.mode to 'name' or 'id'): Iceberg "
            "readers resolve columns by parquet field id"
        )
    dvs_on = (
        str(configuration.get("delta.enableDeletionVectors", "")).strip().lower()
        == "true"
    )
    if v == 2 and dvs_on:
        raise IcebergCompatError(
            "icebergCompatV2 forbids deletion vectors "
            "(delta.enableDeletionVectors=true)"
        )
    if v == 3:
        rt_on = (
            str(configuration.get("delta.enableRowTracking", "")).strip().lower()
            == "true"
        )
        if not rt_on:
            raise IcebergCompatError(
                "icebergCompatV3 requires row tracking "
                "(set delta.enableRowTracking=true)"
            )
        if configuration.get("delta.rowTrackingSuspended") == "true":
            # V3 requires row tracking ACTIVE — suspension cannot coexist
            # (reference builder/create_table.rs
            # maybe_enable_iceberg_compat_v3_dependencies)
            raise IcebergCompatError(
                "icebergCompatV3 cannot be enabled while "
                "delta.rowTrackingSuspended is 'true'"
            )
    if schema is not None:
        hit = _first_unsupported(schema, "", allow_variant=(v == 3))
        if hit:
            raise IcebergCompatError(
                f"icebergCompatV{v} does not support type at column: {hit}"
            )
        if v == 3:
            legacy = _first_legacy_nested_ids(schema, "")
            if legacy:
                raise IcebergCompatError(
                    f"field `{legacy}` carries deprecated "
                    "parquet.field.nested.ids metadata; use "
                    "delta.columnMapping.nested.ids instead (delta #6688)"
                )
    return v
