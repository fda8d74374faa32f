"""Regression tests for the round-3 advice fixes.

Covers: (1) lossy literal downcast in data skipping must not prune
(fractional double vs int column); (2) CDF RESTORE pattern — the same path
with file events at several versions in one range emits change rows per
version; (3) bare non-boolean column predicates stay residual-only;
(4) unreadable racing commit aborts the rebase instead of being skipped.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from delta_kernel_rs_spark.sources.cdf import table_changes
from delta_kernel_rs_spark.sources.table import DeltaTable
from delta_kernel_rs_spark.sources.transaction import (
    ConcurrentModificationError,
    Transaction,
)


def _ints(spark, lo, hi):
    return (
        spark.range(lo, hi)
        .coalesce(1)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    )


# -- (1) fractional literal vs integral stats ---------------------------


def test_fractional_literal_does_not_wrongly_prune(spark, tmp_path):
    """``k < 0.5`` on an int column must keep a file whose min is 0 —
    under non-ANSI cast the literal 0.5 truncates to 0 and the rewritten
    ``min < 0`` would silently drop matching rows (round-3 ADVICE high)."""
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 100))
    scan = t.snapshot().scan(predicate="k < 0.5")
    # File must survive skipping AND the row k=0 must come back.
    assert scan.scan_files_df().count() == 1
    assert [r.k for r in scan.to_df().collect()] == [0]

    # Equality with a fractional literal matches nothing, but the file
    # must still not be pruned by a truncated rewrite (min=max=0 case is
    # the dangerous shape for !=).
    ne = t.snapshot().scan(predicate="k != 0.5").to_df()
    assert ne.count() == 100  # every int differs from 0.5

    # IN with a fractional member: the whole IN stays unknown.
    inq = t.snapshot().scan(predicate="k IN (0.5, 3)").to_df()
    assert [r.k for r in inq.collect()] == [3]


def test_whole_valued_float_literal_still_prunes(spark, tmp_path):
    """A float literal with no fractional part casts losslessly and keeps
    its skipping power."""
    path = str(tmp_path / "tbl")
    DeltaTable.create(spark, path, df=_ints(spark, 0, 50))
    t2 = DeltaTable(spark, path)
    from delta_kernel_rs_spark.sources.transaction import Transaction

    txn = Transaction(spark, path, "WRITE", read_snapshot=t2.snapshot())
    txn.write_data(_ints(spark, 100, 150)).commit()
    scan = t2.snapshot().scan(predicate="k >= 100.0")
    assert scan.scan_files_df().count() == 1  # second file only
    assert scan.to_df().count() == 50


# -- (2) CDF events per (version, path) ---------------------------------


def test_cdf_restore_emits_per_version_changes(spark, tmp_path):
    """add@v0, remove@v1, re-add@v2 of the SAME path: the range [0,2] must
    produce insert rows at v0, delete rows at v1, and insert rows at v2 —
    keying tasks by path alone collapses to the last event (round-3
    ADVICE)."""
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(
        spark,
        path,
        df=_ints(spark, 0, 10),
        properties={"delta.enableChangeDataFeed": "true"},
    )
    # Find the add action of v0 and replay it as remove@v1 / re-add@v2.
    first = json.loads(
        "[" + ",".join(
            (tmp_path / "tbl" / "_delta_log" / "00000000000000000000.json")
            .read_text()
            .splitlines()
        ) + "]"
    )
    add = next(a["add"] for a in first if "add" in a)

    snap = t.snapshot()
    Transaction(spark, path, "DELETE", read_snapshot=snap).add_actions(
        [
            {
                "remove": {
                    "path": add["path"],
                    "deletionTimestamp": 1,
                    "dataChange": True,
                    "partitionValues": add.get("partitionValues", {}),
                    "size": add["size"],
                }
            }
        ]
    ).commit()
    Transaction(spark, path, "RESTORE", read_snapshot=t.snapshot()).add_actions(
        [{"add": add}]
    ).commit()

    changes = table_changes(spark, path, 0, 2)
    counts = {
        (r["_change_type"], r["_commit_version"]): r["n"]
        for r in changes.groupBy("_change_type", "_commit_version")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts == {
        ("insert", 0): 10,
        ("delete", 1): 10,
        ("insert", 2): 10,
    }


# -- (3) bare non-boolean column predicate ------------------------------


def test_bare_nonboolean_column_is_residual_only():
    from delta_kernel_rs_spark.plans.sql_parser import try_parse_sql_predicate
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("x", T.IntegerType()),
            T.StructField("flag", T.BooleanType()),
        ]
    )
    assert try_parse_sql_predicate("x", schema) is None
    assert try_parse_sql_predicate("x") is None  # schema-less: conservative
    parsed = try_parse_sql_predicate("flag", schema)
    assert parsed is not None  # known boolean: implicit = TRUE is sound


# -- (4) unreadable racing commit aborts rebase -------------------------


def test_unreadable_winner_commit_fails_rebase(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 10))
    snap = t.snapshot()

    # Stage a non-append (carries a remove) against v0.
    loser = Transaction(spark, path, "DELETE", read_snapshot=snap).add_actions(
        [
            {
                "remove": {
                    "path": "part-zzz.parquet",
                    "deletionTimestamp": 1,
                    "dataChange": True,
                    "partitionValues": {},
                    "size": 1,
                }
            }
        ]
    )
    # A disjoint winner lands first.
    Transaction(spark, path, "WRITE", read_snapshot=snap).write_data(
        _ints(spark, 100, 110)
    ).commit()

    real_read = loser.storage.read_text

    def flaky_read(p):
        if p.endswith("00000000000000000001.json"):
            raise OSError("simulated storage failure")
        return real_read(p)

    monkeypatch.setattr(loser.storage, "read_text", flaky_read)
    with pytest.raises(ConcurrentModificationError, match="cannot examine"):
        loser.commit()
