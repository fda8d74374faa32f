"""Write-side golden-table roundtrip (r7 verdict, next #5).

The read side passes the reference's golden corpus (test_golden_tables.py);
this suite proves the WRITER against the same expected outputs: scan a
golden table with this engine, rewrite it into a fresh directory with this
engine's transaction/write path (preserving partitioning and column-mapping
mode), re-read the new log, and verify the rows still match the corpus's
``expected/`` parquet. Checkpoint arms re-verify after a V1 and a V2 +
sidecar checkpoint write so replay-through-our-own-checkpoint is covered.
Mirrors the write suites under the reference's kernel/tests/integration/
(write.rs, v2_checkpoints.rs) but gated on the reference's own corpus data.
"""

from __future__ import annotations

import json
import os

import pytest

from delta_kernel_rs_spark.sources.snapshot import Snapshot
from delta_kernel_rs_spark.sources.table import DeltaTable

from test_golden_tables import _extract, _rows, _table_dir

#: Representative slice of the positive corpus: primitives, nested
#: struct/array/map, decimals, escaped values, timestamps, partitioned
#: tables, DV tables (scan applies the DVs; the rewrite persists the live
#: rows), column mapping in BOTH modes, and checkpointed sources.
ROUNDTRIP = [
    "data-reader-primitives",
    "data-reader-nested-struct",
    "data-reader-array-complex-objects",
    "data-reader-map",
    "basic-decimal-table",
    "data-reader-escaped-chars",
    "kernel-timestamp-timestamp_micros",
    "data-skipping-partition-and-data-column",
    "basic-with-inserts-deletes-checkpoint",
    "dv-partitioned-with-checkpoint",
    "dv-with-columnmapping",
    "table-with-columnmapping-mode-id",
    "table-with-columnmapping-mode-name",
    # r9: remaining writer features (r8 VERDICT next #7)
    "data-reader-timestamp_ntz",
    "data-reader-timestamp_ntz-name-mode",
]

#: subset that additionally re-verifies after a V2+sidecar checkpoint
#: written by THIS engine (v2_checkpoints.rs parity: the new log must
#: replay through our own checkpoint artifacts)
V2_CHECKPOINT = {
    "dv-partitioned-with-checkpoint",
    "table-with-columnmapping-mode-id",
    "data-skipping-partition-and-data-column",
    "data-reader-nested-struct",
}


def _carry_properties(src_meta) -> dict:
    """Table properties the rewrite must preserve for the write path to
    exercise the same feature (column mapping mode drives physical-name
    assignment on create)."""
    conf = src_meta.configuration or {}
    props = {}
    mode = conf.get("delta.columnMapping.mode")
    if mode and mode != "none":
        props["delta.columnMapping.mode"] = mode
    return props


def _strip_metadata(schema):
    """Logical schema without the source's column-mapping annotations —
    the rewrite assigns its OWN physical names/ids (a clone would copy
    them; a rewrite must not)."""
    import pyspark.sql.types as T

    def strip(dt):
        if isinstance(dt, T.StructType):
            return T.StructType(
                [T.StructField(f.name, strip(f.dataType), f.nullable) for f in dt.fields]
            )
        if isinstance(dt, T.ArrayType):
            return T.ArrayType(strip(dt.elementType), dt.containsNull)
        if isinstance(dt, T.MapType):
            return T.MapType(strip(dt.keyType), strip(dt.valueType), dt.valueContainsNull)
        return dt

    return strip(schema)


def _verify_against_expected(spark, table_path: str, expected_dir: str, label: str):
    snap = Snapshot.create(spark, table_path)
    actual = snap.scan().to_df()
    expected = spark.read.parquet(expected_dir)
    a_types = {f.name: f.dataType.simpleString() for f in actual.schema.fields}
    e_types = {f.name: f.dataType.simpleString() for f in expected.schema.fields}
    assert set(a_types) == set(e_types), f"{label}: column sets differ"
    for c in e_types:
        assert a_types[c] == e_types[c], f"{label}.{c}: {a_types[c]} != {e_types[c]}"
    cols = sorted(e_types)
    assert _rows(actual, cols) == _rows(expected, cols), f"{label}: values differ"
    return snap


@pytest.mark.parametrize("name", ROUNDTRIP)
def test_golden_roundtrip_rewrite(spark, name, tmp_path):
    root = _extract(name)
    src = Snapshot.create(spark, _table_dir(root))
    expected_dir = os.path.join(root, "expected")
    assert os.path.isdir(expected_dir), f"{name} has no expected/ dir"

    df = src.scan().to_df()
    dest = str(tmp_path / "rewrite")
    t = DeltaTable.create(
        spark,
        dest,
        df=df.to(_strip_metadata(df.schema)),
        partition_by=src.metadata.partition_columns or None,
        properties=_carry_properties(src.metadata),
    )
    new_snap = _verify_against_expected(spark, dest, expected_dir, f"{name}/rewrite")
    # the rewrite preserved partitioning + column-mapping mode
    assert new_snap.metadata.partition_columns == src.metadata.partition_columns
    src_mode = (src.metadata.configuration or {}).get("delta.columnMapping.mode", "none")
    new_mode = (new_snap.metadata.configuration or {}).get("delta.columnMapping.mode", "none")
    assert new_mode == src_mode

    # V1 checkpoint written by this engine; replay must resolve through it
    t.checkpoint()
    _verify_against_expected(spark, dest, expected_dir, f"{name}/ckpt-v1")

    if name in V2_CHECKPOINT:
        t.checkpoint(v2=True)
        snap3 = _verify_against_expected(spark, dest, expected_dir, f"{name}/ckpt-v2")
        assert "v2Checkpoint" in (snap3.protocol.reader_features or [])


def test_golden_roundtrip_dv_delete_after_rewrite(spark, tmp_path):
    """DV WRITE against golden data: rewrite a golden table, DV-delete a
    predicate on the copy, V2-checkpoint, and verify the surviving rows
    equal the same filter applied to the corpus's expected parquet."""
    from pyspark.sql import functions as F

    from delta_kernel_rs_spark.sources.delete import delete_with_dvs

    name = "basic-with-inserts-deletes-checkpoint"
    root = _extract(name)
    src = Snapshot.create(spark, _table_dir(root))
    expected_dir = os.path.join(root, "expected")

    df = src.scan().to_df()
    dest = str(tmp_path / "dvcopy")
    t = DeltaTable.create(spark, dest, df=df.to(_strip_metadata(df.schema)))
    v = delete_with_dvs(t, "id % 3 = 0")
    assert v >= 1
    # the delete produced deletion vectors, not a rewrite
    assert any(f.dv for f in t.snapshot().scan().files())
    t.checkpoint(v2=True)

    actual = Snapshot.create(spark, dest).scan().to_df()
    expected = spark.read.parquet(expected_dir).filter(~(F.col("id") % 3 == 0))
    cols = sorted(actual.columns)
    assert sorted(expected.columns) == cols
    assert _rows(actual, cols) == _rows(expected, cols)


def test_roundtrip_variant_reference_table(spark, tmp_path):
    """Variant writer proof against the reference's unshredded-variant
    corpus table (kernel/tests/data/unshredded-variant, expected render in
    unshredded-variant.expected.in: every row's variant decodes to
    {"key": <id>}): read with this engine, semantic-check the read against
    that expectation, rewrite with this engine's write path, V1-checkpoint,
    and verify the copy matches the source cell-for-cell."""
    from pyspark.sql import functions as F

    from delta_kernel_rs_spark.tarzst import extract_table

    root = str(tmp_path / "xt")
    src_path = extract_table(
        "/root/reference/kernel/tests/data", "unshredded-variant", root
    )

    src = Snapshot.create(spark, src_path)
    df = src.scan().to_df()
    # semantic gate from the reference's expected.in: v == {"key": id}
    bad = df.filter(
        F.expr("CAST(variant_get(v, '$.key', 'long') AS LONG) != id")
    ).count()
    assert bad == 0 and df.count() > 0

    dest = str(tmp_path / "rewrite")
    t = DeltaTable.create(spark, dest, df=df.to(_strip_metadata(df.schema)))
    copy_snap = Snapshot.create(spark, dest)
    assert "variantType" in (
        (copy_snap.protocol.reader_features or [])
        + (copy_snap.protocol.writer_features or [])
    )
    t.checkpoint()

    def canon(frame):
        # variant cells aren't directly comparable; canonicalize via JSON
        cols = [
            F.to_json(F.col(c)).alias(c)
            if "variant" in dict(frame.dtypes)[c]
            else F.col(c)
            for c in sorted(frame.columns)
        ]
        return sorted(tuple(r) for r in frame.select(cols).collect())

    assert canon(Snapshot.create(spark, dest).scan().to_df()) == canon(df)


def test_roundtrip_identity_and_generated_columns(spark, tmp_path):
    """Identity + generated-column writer roundtrip (engine-built; the
    corpus carries no identity golden table). The copy preserves the
    policy metadata, accepts the source's identity values verbatim
    (allowExplicitInsert), recomputes generated partition values to the
    same result, and continues the identity sequence past the copied
    high-water mark on a fresh append."""
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    src_path = str(tmp_path / "src")
    schema = T.StructType(
        [
            T.StructField(
                "id",
                T.LongType(),
                True,
                {"delta.identity.start": 100, "delta.identity.step": 10},
            ),
            T.StructField("x", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField(
                "year",
                T.IntegerType(),
                True,
                {"delta.generationExpression": "YEAR(ts)"},
            ),
        ]
    )
    t1 = DeltaTable.create(spark, src_path, schema=schema, partition_by=["year"])
    rows = spark.range(8).select(
        F.col("id").alias("x"),
        F.expr("timestamp(date_add(date'2020-06-01', CAST(id * 200 AS INT)))").alias("ts"),
    )
    t1.append(rows)
    src_rows = sorted(tuple(r) for r in t1.to_df().collect())
    assert {r[3] for r in src_rows} == {2020, 2021, 2022, 2023, 2024}  # generated

    # rewrite: same policy schema but explicit-insert allowed, rows verbatim
    dest = str(tmp_path / "copy")
    copy_schema = schema.json().replace(
        '"delta.identity.start"',
        '"delta.identity.allowExplicitInsert": true, "delta.identity.start"',
    )
    t2 = DeltaTable.create(
        spark,
        dest,
        schema=T.StructType.fromJson(json.loads(copy_schema)),
        partition_by=["year"],
    )
    t2.append(t1.to_df().select("id", "x", "ts"))  # generated col recomputed
    copy_rows = sorted(tuple(r) for r in t2.to_df().collect())
    assert copy_rows == src_rows
    # policy metadata survived the rewrite
    meta = t2.snapshot().schema["id"].metadata
    assert meta["delta.identity.start"] == 100
    gen = t2.snapshot().schema["year"].metadata
    assert gen["delta.generationExpression"] == "YEAR(ts)"
    # V1 checkpoint replay keeps the copy identical
    t2.checkpoint()
    assert sorted(tuple(r) for r in DeltaTable(spark, dest).to_df().collect()) == src_rows
