"""Partition-value codec fuzz (round-10 fourth wave).

Partition values cross three representations — the typed column, the
hive-style directory segment Spark's writer escapes, and the UNESCAPED
string in ``add.partitionValues`` which is authoritative for readers
(reference kernel/src/partition/serialization.rs; parse via
kernel/src/expressions/mod.rs:643-666). The history fuzz (round 10,
third wave) already caught one spelling bug in this area (RESTORE's raw
vs percent-encoded add.path); this fuzz targets the VALUE codec itself:
adversarial strings (hive-escaped metacharacters ``= / % : #``, unicode,
whitespace, digit-lookalikes), every supported partition type, and NULLs,
through a full engine write -> log replay -> constant injection -> 3VL
partition pruning cycle.

Ground truth is the input DataFrame: the engine's read-back must equal it
row-for-row, and a partition-column predicate must return exactly Spark's
own filter result while never pruning a file that holds a matching row.

Found by this fuzz (fixed + pinned):
- ``F.lit(date(1, 1, 1))`` crashes in py4j's Date converter
  (``Date.valueOf(strftime('%Y-%m-%d'))`` — strftime does not zero-pad
  years < 1000), killing the skipping rewriter's partition-value compare
  for ancient dates; fixed centrally by ``expressions.safe_lit`` (ISO
  string + cast spelling), used by Literal/In/the rewriter.
- a literal STRING partition value ``__HIVE_DEFAULT_PARTITION__`` is
  written verbatim by Spark's dir escaper, and any reader that derives
  partitionValues from directory names reads it back as NULL — the
  sentinel is not injective; the writer now refuses it. See
  ``test_hive_default_partition_literal_string``.

Seeded; run count kept modest because each trial is a real table write.
"""

from __future__ import annotations

import datetime as dt
import random
from decimal import Decimal

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_kernel_rs_spark.plans import expressions as E
from delta_kernel_rs_spark.plans.expressions import safe_lit
from delta_kernel_rs_spark.sources.table import DeltaTable

SEED = 0x9A47

# hive-escaper stress set: metachars Spark escapes, chars it doesn't,
# unicode, whitespace, and values that look like other types
STRING_POOL = [
    "plain",
    "",  # empty string is a VALUE for string type, not NULL
    "a b",
    " leading",
    "trailing ",
    "a=b",
    "a/b",
    "a%b",
    "100%",
    "a:b",
    "a#b",
    "a?b*c",
    'quo"te',
    "back\\slash",
    "brack[et]{s}",
    "ünïcödé",
    "日本語",
    "0123",
    "-7",
    "true",
    "NaN",
    "null",
    "%25",  # already-percent-encoded-looking
    "a,b;c",
]

DATE_POOL = [dt.date(1970, 1, 1), dt.date(2000, 2, 29), dt.date(1969, 12, 31),
             dt.date(9999, 12, 31), dt.date(1, 1, 1)]
TS_POOL = [
    dt.datetime(2024, 5, 17, 12, 34, 56, 789000),
    dt.datetime(1970, 1, 1, 0, 0, 0),
    dt.datetime(1969, 7, 20, 20, 17, 40, 123456),
    dt.datetime(2038, 1, 19, 3, 14, 7),
    dt.datetime(999, 6, 1, 1, 2, 3),  # year < 1000: py4j strftime hazard
]
DECIMAL_POOL = [Decimal("0.00"), Decimal("-12345.67"), Decimal("99999999.99"),
                Decimal("0.01"), Decimal("-0.10")]
INT_POOL = [0, -1, 1, 2**31 - 1, -(2**31), 42]
BOOL_POOL = [True, False]

TYPES = [
    ("string", T.StringType(), STRING_POOL),
    ("date", T.DateType(), DATE_POOL),
    ("timestamp", T.TimestampType(), TS_POOL),
    ("decimal(10,2)", T.DecimalType(10, 2), DECIMAL_POOL),
    ("int", T.IntegerType(), INT_POOL),
    ("boolean", T.BooleanType(), BOOL_POOL),
]


def _rows_set(df):
    out = set()
    for r in df.collect():
        d = r.asDict()
        out.add((d["id"], d["p"], d["payload"]))
    return out


def _make_frame(spark, dtype, pool, rng, with_nulls=True):
    vals = rng.sample(pool, min(len(pool), rng.randrange(3, 7)))
    if with_nulls:
        vals = vals + [None]
    rows = []
    rid = 0
    for v in vals:
        for _ in range(rng.randrange(1, 4)):
            rows.append((rid, v, f"pay{rid}"))
            rid += 1
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("p", dtype),
            T.StructField("payload", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema), vals


@pytest.mark.parametrize("type_name", [t[0] for t in TYPES])
def test_partition_value_roundtrip_and_pruning(spark, tmp_path, type_name):
    name, dtype, pool = next(t for t in TYPES if t[0] == type_name)
    # stable per-type seed (never hash() — PYTHONHASHSEED randomization
    # would make trials differ across processes)
    rng = random.Random(SEED + sum(name.encode()))
    for trial in range(3 if name == "string" else 2):
        df_in, vals = _make_frame(spark, dtype, pool, rng)
        df = df_in
        if name == "string":
            # The hive dir sentinel covers BOTH '' and NULL, so an
            # empty-string partition value collapses to NULL on write —
            # the same documented quirk as delta-spark (both derive
            # partitionValues from directory names). The ORIGINAL frame is
            # written; ground truth is the collapsed frame, and '' is
            # dropped from predicate probes.
            df = df_in.withColumn(
                "p", F.when(F.col("p") == "", F.lit(None)).otherwise(F.col("p"))
            )
            vals = [None if v == "" else v for v in vals]
        path = str(tmp_path / f"t_{name.replace('(', '_').replace(',', '_').replace(')', '')}_{trial}")
        t = DeltaTable.create(spark, path, df=df_in, partition_by=["p"])
        got = t.to_df().select("id", "p", "payload")

        assert _rows_set(got) == _rows_set(df), f"{name} trial {trial}: roundtrip"

        snap = t.snapshot()
        all_files = snap.scan().files()
        non_null = [v for v in vals if v is not None]
        for v in rng.sample(non_null, min(2, len(non_null))):
            pred = E.col("p") == E.lit(v)
            pruned = snap.scan(predicate=pred).files()
            assert len(pruned) <= len(all_files)
            got_f = snap.to_df(predicate=pred).select("id", "p", "payload")
            exp_f = df.filter(F.col("p") == safe_lit(v)).select("id", "p", "payload")
            assert _rows_set(got_f) == _rows_set(exp_f), (
                f"{name} trial {trial}: predicate p == {v!r}"
            )
            # pruning must actually engage when other partitions exist
            if len(non_null) > 1:
                assert len(pruned) < len(all_files), (
                    f"{name} trial {trial}: p == {v!r} pruned nothing"
                )
        # NULL partition: IsNull finds exactly the null rows
        null_pred = E.IsNull(E.col("p"))
        got_n = snap.to_df(predicate=null_pred).select("id", "p", "payload")
        exp_n = df.filter(F.col("p").isNull()).select("id", "p", "payload")
        assert _rows_set(got_n) == _rows_set(exp_n), f"{name} trial {trial}: IsNull"


def test_two_level_partition_mixed_types(spark, tmp_path):
    """Nested partition dirs (string with metachars / date) survive."""
    rng = random.Random(SEED + 77)
    rows = []
    rid = 0
    svals = ["a=b", "x/y", "ünïcödé", None]
    dvals = [dt.date(2020, 1, 1), dt.date(1999, 12, 31), None]
    for s in svals:
        for d in dvals:
            rows.append((rid, s, d, f"pay{rid}"))
            rid += 1
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("p", T.StringType()),
            T.StructField("q", T.DateType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "t2")
    t = DeltaTable.create(spark, path, df=df, partition_by=["p", "q"])
    got = {tuple(r) for r in t.to_df().select("id", "p", "q", "payload").collect()}
    exp = {tuple(r) for r in df.collect()}
    assert got == exp
    # conjunctive prune on both levels
    pred = E.And(
        (E.col("p") == E.lit("a=b"), E.col("q") == E.lit(dt.date(2020, 1, 1)))
    )
    snap = t.snapshot()
    assert len(snap.scan(predicate=pred).files()) == 1
    got_f = snap.to_df(predicate=pred).select("id").collect()
    assert [r.id for r in got_f] == [0]
    _ = rng  # reserved for future widening


def test_hive_default_partition_literal_string(spark, tmp_path):
    """A literal string value '__HIVE_DEFAULT_PARTITION__' must stay a
    VALUE, not collapse into NULL.

    The hive directory sentinel is not injective: Spark's dir escaper
    writes the literal verbatim, so a reader deriving partitionValues
    from directory names cannot tell it from NULL (delta-spark has the
    same dir collision; it sidesteps it by deriving partitionValues from
    the data). Until the writer disambiguates, the engine must REFUSE the
    write rather than corrupt the value into NULL on read-back —
    reporting an error beats returning wrong rows (reference error
    posture: kernel/src/error.rs invalid-partition-value errors).
    Accepting-and-roundtripping is also a pass if the writer learns to
    escape the sentinel.
    """
    rows = [(0, "__HIVE_DEFAULT_PARTITION__", "x"), (1, None, "y"), (2, "z", "w")]
    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("p", T.StringType()),
            T.StructField("payload", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "thive")
    try:
        t = DeltaTable.create(spark, path, df=df, partition_by=["p"])
    except ValueError:
        return  # refusal is the documented safe behavior
    got = {(r.id, r.p) for r in t.to_df().select("id", "p").collect()}
    assert got == {(0, "__HIVE_DEFAULT_PARTITION__"), (1, None), (2, "z")}
