"""Variant type: schema round-trip + write/read a variant-bearing table.

VERDICT r3 item 6: `_type_to_json` gets a Variant branch
(kernel/src/schema/mod.rs:2298-2301) so variant schemas can be
created/evolved, with protocol gating (reader 3 / writer 7,
`variantType` feature) and an end-to-end scan.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_kernel_rs_spark.functions.schema_codec import (
    parse_schema_string,
    to_schema_string,
)
from delta_kernel_rs_spark.sources.table import DeltaTable


VARIANT_SCHEMA_JSON = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": False, "metadata": {}},
            {"name": "payload", "type": "variant", "nullable": True, "metadata": {}},
            {
                "name": "tags",
                "type": {
                    "type": "array",
                    "elementType": "variant",
                    "containsNull": True,
                },
                "nullable": True,
                "metadata": {},
            },
        ],
    },
    separators=(",", ":"),
)


def test_variant_schema_string_round_trip():
    st = parse_schema_string(VARIANT_SCHEMA_JSON)
    assert isinstance(st.fields[1].dataType, T.VariantType)
    assert isinstance(st.fields[2].dataType.elementType, T.VariantType)
    assert to_schema_string(st) == VARIANT_SCHEMA_JSON
    # and the inverse direction is identity too
    assert parse_schema_string(to_schema_string(st)) == st


def test_variant_table_write_scan(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(20).select(
        "id",
        F.parse_json(
            F.concat(F.lit('{"k": '), F.col("id").cast("string"), F.lit("}"))
        ).alias("payload"),
    )
    t = DeltaTable.create(spark, path, df=df)

    # protocol gates the feature (reader 3 / writer 7)
    proto = t.snapshot().protocol
    assert proto.min_reader_version == 3 and proto.min_writer_version == 7
    assert "variantType" in proto.reader_features
    assert "variantType" in proto.writer_features

    # schemaString persisted the variant spelling
    assert '"type":"variant"' in t.snapshot().metadata.schema_string

    got = (
        t.to_df()
        .select("id", F.to_json("payload").alias("j"))
        .orderBy("id")
        .collect()
    )
    assert [r.j for r in got] == [json.dumps({"k": i}, separators=(",", ":")) for i in range(20)]

    # append keeps working (stats collection must tolerate variant columns)
    t.append(
        spark.range(20, 25).select(
            "id", F.parse_json(F.lit('{"k": -1}')).alias("payload")
        )
    )
    assert t.to_df().count() == 25

def test_variant_shredding_roundtrip(spark, tmp_path):
    """variantShredding end-to-end: an engine-written table with
    delta.enableVariantShredding lists the feature; genuinely shredded
    parquet (forced via Spark's test conf) reads back through the kernel
    path with full variant values (Spark 4.1 reassembles typed_value
    subcolumns natively — spark.sql.variant.allowReadingShredded)."""
    from pyspark.sql import types as T

    from delta_kernel_rs_spark.sources.table import DeltaTable

    path = str(tmp_path / "tbl")
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.VariantType())]
    )
    t = DeltaTable.create(
        spark,
        path,
        schema=schema,
        properties={"delta.enableVariantShredding": "true"},
    )
    proto = t.snapshot().protocol
    assert "variantShredding" in (proto.reader_features or [])
    assert "variantShredding" in (proto.writer_features or [])

    df = spark.sql(
        "SELECT id, parse_json(concat('{\"a\": ', id, ', \"b\": \"x\"}')) AS v "
        "FROM range(10)"
    )
    spark.conf.set("spark.sql.variant.forceShreddingSchemaForTest", "a int, b string")
    try:
        t.append(df.coalesce(1))
    finally:
        spark.conf.unset("spark.sql.variant.forceShreddingSchemaForTest")

    got = sorted(
        (r.id, str(r.v)) for r in t.to_df().selectExpr("id", "v").collect()
    )
    assert got == [(i, '{"a":%d,"b":"x"}' % i) for i in range(10)]
    # typed access through the variant path works on the shredded file
    a_vals = sorted(
        r.a
        for r in t.to_df().selectExpr("variant_get(v, '$.a', 'int') AS a").collect()
    )
    assert a_vals == list(range(10))


def test_variant_shredding_requires_variant_column(spark, tmp_path):
    import pytest
    from pyspark.sql import types as T

    from delta_kernel_rs_spark.sources.table import DeltaTable

    with pytest.raises(ValueError, match="VARIANT"):
        DeltaTable.create(
            spark,
            str(tmp_path / "tbl"),
            schema=T.StructType([T.StructField("k", T.LongType())]),
            properties={"delta.enableVariantShredding": "true"},
        )
