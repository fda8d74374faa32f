"""Committer seam: catalog-managed staged commits + publish
(sources/committer.py; reference kernel/src/committer/)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from delta_kernel_rs_spark.sources.committer import (
    FileSystemCommitter,
    InMemoryCatalogCommitter,
)
from delta_kernel_rs_spark.sources.snapshot import Snapshot
from delta_kernel_rs_spark.sources.storage import CommitConflict
from delta_kernel_rs_spark.sources.table import DeltaTable
from delta_kernel_rs_spark.sources.transaction import Transaction


def _append_via(t, committer, df):
    snap = Snapshot.create(
        t.spark, t.path, log_tail=committer.log_tail() or None
    )
    return (
        Transaction(t.spark, t.path, operation="WRITE", read_snapshot=snap)
        .write_data(df)
        .with_committer(committer)
        .commit()
    )


def test_filesystem_committer_matches_default(spark, tmp_path):
    # explicit FileSystemCommitter behaves exactly like the default path
    t = DeltaTable.create(spark, str(tmp_path / "t"), df=spark.range(3).toDF("x"))
    snap = t.snapshot()
    version = (
        Transaction(spark, t.path, operation="WRITE", read_snapshot=snap)
        .write_data(spark.range(3, 6).toDF("x"))
        .with_committer(FileSystemCommitter())
        .commit()
    )
    assert version == 1
    assert os.path.exists(
        os.path.join(t.path, "_delta_log", "00000000000000000001.json")
    )
    assert t.to_df().count() == 6


def test_catalog_commits_are_staged_and_readable_via_tail(spark, tmp_path):
    t = DeltaTable.create(spark, str(tmp_path / "t"), df=spark.range(5).toDF("x"))
    cat = InMemoryCatalogCommitter()
    v1 = _append_via(t, cat, spark.range(5, 10).toDF("x"))
    assert v1 == 1
    # nothing published: the log dir has only version 0
    log = os.path.join(t.path, "_delta_log")
    assert not os.path.exists(os.path.join(log, "00000000000000000001.json"))
    staged = os.listdir(os.path.join(log, "_staged_commits"))
    assert len(staged) == 1 and staged[0].startswith("00000000000000000001.")
    # a plain snapshot cannot see the staged commit...
    assert Snapshot.create(spark, t.path).version == 0
    # ...the catalog tail makes it visible
    snap = Snapshot.create(spark, t.path, log_tail=cat.log_tail())
    assert snap.version == 1
    assert snap.scan().to_df().count() == 10


def test_catalog_stacked_staged_commits_then_publish(spark, tmp_path):
    t = DeltaTable.create(spark, str(tmp_path / "t"), df=spark.range(2).toDF("x"))
    cat = InMemoryCatalogCommitter()
    _append_via(t, cat, spark.range(2, 4).toDF("x"))
    _append_via(t, cat, spark.range(4, 6).toDF("x"))
    snap = Snapshot.create(spark, t.path, log_tail=cat.log_tail())
    assert snap.version == 2
    assert snap.scan().to_df().count() == 6

    published = cat.publish(t.storage, t.path)
    assert len(published) == 2
    # published deltas now listable; no tail needed
    snap2 = Snapshot.create(spark, t.path)
    assert snap2.version == 2
    assert snap2.scan().to_df().count() == 6
    # idempotent: second publish is a no-op
    assert cat.publish(t.storage, t.path) == []


def test_catalog_ratification_conflict(spark, tmp_path):
    t = DeltaTable.create(spark, str(tmp_path / "t"), df=spark.range(2).toDF("x"))
    cat = InMemoryCatalogCommitter()
    # two transactions read the same snapshot; both try version 1
    snap = Snapshot.create(spark, t.path, log_tail=cat.log_tail() or None)
    t1 = (
        Transaction(spark, t.path, operation="WRITE", read_snapshot=snap)
        .write_data(spark.range(10, 12).toDF("x"))
        .with_committer(cat)
    )
    t2 = (
        Transaction(spark, t.path, operation="WRITE", read_snapshot=snap)
        .write_data(spark.range(12, 14).toDF("x"))
        .with_committer(cat)
    )
    assert t1.commit() == 1
    # blind append: loser retries against the tail-aware snapshot -> v2
    assert t2.commit() == 2
    snap = Snapshot.create(spark, t.path, log_tail=cat.log_tail())
    assert snap.scan().to_df().count() == 6


def test_filesystem_committer_refuses_publish(spark, tmp_path):
    t = DeltaTable.create(spark, str(tmp_path / "t"), df=spark.range(2).toDF("x"))
    with pytest.raises(ValueError, match="publish"):
        FileSystemCommitter().publish(t.storage, t.path)
