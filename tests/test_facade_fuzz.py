"""Differential fuzz of the facade's FULL predicate path.

test_skipping_fuzz.py proves the planning-time skip verdicts never drop a
matching file. This harness proves the stronger, end-to-end property for
the batch facade, whose executor-side pyarrow residual OWNS row-level
correctness under the ``predicate`` option (no Spark re-application
there): for seeded random predicate ASTs over a REAL engine-written Delta
table (partitioned, null-heavy, DV-deleted rows),

    facade read rows under predicate  ==  Spark 3VL row filter of the
    same AST over the full table      (exact set equality, by row uid)

Set EQUALITY (not ⊆) catches both unsound pruning and under-filtering —
partition 3VL short-circuits, stats skipping, per-file substitution, the
pyarrow expression compile, and DV-before-filter ordering all sit on this
one path. Skipped predicates are exactly those the facade itself rejects
(UnsupportedPredicate from coercion or the arrow compile) — the contract
is all-or-nothing, never silent unfiltered rows.

Knobs: SPARK_GRAFT_FUZZ_N (default 250), SPARK_GRAFT_FUZZ_SEED.
"""

from __future__ import annotations

import os
import random

import pytest
from pyspark.sql import types as T

from delta_kernel_rs_spark.plans import expressions as E
from delta_kernel_rs_spark.plans.py_predicate import (
    UnsupportedPredicate,
    coerce_literals,
    to_arrow_expr,
)
from delta_kernel_rs_spark.sources.delete import delete_with_dvs
from delta_kernel_rs_spark.sources.table import DeltaTable
from tests.test_skipping_fuzz import DOM, LIT_EXTRA, _pred

SEED = int(os.environ.get("SPARK_GRAFT_FUZZ_SEED", "20260815"))
N_PRED = int(os.environ.get("SPARK_GRAFT_FUZZ_N", "250"))
CHUNK = 40

SCHEMA = T.StructType(
    [
        T.StructField("uid", T.LongType()),
        T.StructField("i", T.LongType()),
        T.StructField("f", T.DoubleType()),
        T.StructField("s", T.StringType()),
        T.StructField("d", T.DateType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("p", T.StringType()),
    ]
)


def _build_table(spark, path: str, cm: bool = False):
    rng = random.Random(SEED ^ 0x5AFE)
    rows = []
    for uid in range(600):
        rows.append(
            (
                uid,
                rng.choice(DOM["i"]),
                rng.choice(DOM["f"]),
                rng.choice(DOM["s"]),
                rng.choice(DOM["d"]),
                rng.choice(DOM["ts"]),
                rng.choice(["x", "y", "z"]),  # partition values (non-null)
            )
        )
    df = spark.createDataFrame(rows, SCHEMA)
    props = {"delta.columnMapping.mode": "name"} if cm else {}
    t = DeltaTable.create(
        spark,
        path,
        df=df.filter("uid < 400").repartition(4),
        partition_by=["p"],
        properties=props,
    )
    t.append(df.filter("uid >= 400").repartition(3))
    delete_with_dvs(t, "uid % 7 = 0")  # DVs interact with the residual filter
    return t


@pytest.mark.parametrize("cm", [False, True], ids=["plain", "column-mapped"])
def test_facade_predicate_path_matches_spark_rows(spark, tmp_path, cm):
    from delta_kernel_rs_spark.functions.schema_codec import physical_name
    from delta_kernel_rs_spark.sources.batch_source import DeltaKernelBatchReader

    path = str(tmp_path / "t")
    t = _build_table(spark, path, cm=cm)
    base = t.to_df()
    # under column mapping the reader's own schema carries the cm metadata
    table_schema = t.snapshot().schema
    name_map = {f.name: physical_name(f) for f in table_schema.fields}

    rng = random.Random(SEED)
    n_pred = N_PRED // 2 if cm else N_PRED  # cm arm: same path, half depth
    preds = []
    for _ in range(n_pred):
        p = _pred(rng)
        try:
            p = coerce_literals(p, SCHEMA)
            to_arrow_expr(p, name_map, SCHEMA)  # the facade's acceptance gate
        except UnsupportedPredicate:
            continue
        except Exception:
            continue
        preds.append(p)
    assert len(preds) >= n_pred * 0.4, "too few facade-admissible predicates"

    # ground truth: one chunked Spark pass, uid sets under 3VL WHERE
    truth: list[set[int]] = []
    for lo in range(0, len(preds), CHUNK):
        chunk = preds[lo : lo + CHUNK]
        sel = base.select(
            "uid", *[p.to_spark().alias(f"m{j}") for j, p in enumerate(chunk)]
        ).collect()
        for j in range(len(chunk)):
            truth.append({r["uid"] for r in sel if r[f"m{j}"]})

    # facade: in-process read (planning worker + executor code paths)
    mismatches = []
    for k, p in enumerate(preds):
        reader = DeltaKernelBatchReader(None, {"path": path})
        reader._predicate = p  # what _parse_predicate_opt/pushFilters set
        got: set[int] = set()
        for part in reader.partitions():
            for batch in reader.read(part):
                col = batch.column(batch.schema.names.index("uid"))
                got.update(v for v in col.to_pylist())
        if got != truth[k]:
            mismatches.append(
                f"seed={SEED} pred#{k} {p!r}: facade-only="
                f"{sorted(got - truth[k])[:5]} spark-only="
                f"{sorted(truth[k] - got)[:5]}"
            )
            if len(mismatches) >= 3:
                break
    assert not mismatches, "\n".join(mismatches)


def test_facade_fuzz_literal_pools_reachable():
    """The shared generator's literal pools stay wired to this module's
    columns (guards against a rename in test_skipping_fuzz silently
    emptying the fuzz)."""
    assert set(DOM) >= {"i", "f", "s", "d", "ts", "p"}
    assert set(LIT_EXTRA) >= {"i", "f", "s", "d", "ts"}
