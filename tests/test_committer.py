"""Committer seam: catalog-managed staged commits + publish
(sources/committer.py; reference kernel/src/committer/).

Catalog-managed tables (``delta.feature.catalogManaged = supported``)
follow the reference's gating (snapshot/builder.rs:326-420): the
filesystem log alone is never authoritative, so every load needs the
catalog's ``log_tail`` + ``max_catalog_version``, and every commit must
go through the catalog's committer.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from delta_kernel_rs_spark.sources.committer import (
    FileSystemCommitter,
    InMemoryCatalogCommitter,
)
from delta_kernel_rs_spark.sources.log_segment import InvalidLogError
from delta_kernel_rs_spark.sources.snapshot import Snapshot
from delta_kernel_rs_spark.sources.storage import CommitConflict
from delta_kernel_rs_spark.sources.table import DeltaTable
from delta_kernel_rs_spark.sources.transaction import Transaction

CM_PROPS = {"delta.feature.catalogManaged": "supported"}


def _cm_table(spark, path, df):
    """Create a catalog-managed table + its (already registered) catalog."""
    t = DeltaTable.create(spark, path, df=df, properties=CM_PROPS)
    cat = InMemoryCatalogCommitter()
    cat.register(0)
    return t, cat


def _cm_snapshot(spark, t, cat, version=None):
    return Snapshot.create(
        spark,
        t.path,
        version=version,
        log_tail=cat.log_tail() or None,
        max_catalog_version=cat.max_catalog_version(),
    )


def _append_via(spark, t, cat, df):
    snap = _cm_snapshot(spark, t, cat)
    return (
        Transaction(spark, t.path, operation="WRITE", read_snapshot=snap)
        .write_data(df)
        .with_committer(cat)
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
    t, cat = _cm_table(spark, str(tmp_path / "t"), spark.range(5).toDF("x"))
    v1 = _append_via(spark, t, cat, spark.range(5, 10).toDF("x"))
    assert v1 == 1
    # nothing published: the log dir has only version 0
    log = os.path.join(t.path, "_delta_log")
    assert not os.path.exists(os.path.join(log, "00000000000000000001.json"))
    staged = os.listdir(os.path.join(log, "_staged_commits"))
    assert len(staged) == 1 and staged[0].startswith("00000000000000000001.")
    # loading without catalog context must refuse (builder.rs:397-420)
    with pytest.raises(InvalidLogError, match="catalog-managed"):
        Snapshot.create(spark, t.path)
    # ...the catalog context makes the staged commit visible
    snap = _cm_snapshot(spark, t, cat)
    assert snap.version == 1
    assert snap.scan().to_df().count() == 10


def test_catalog_stacked_staged_commits_then_publish(spark, tmp_path):
    t, cat = _cm_table(spark, str(tmp_path / "t"), spark.range(2).toDF("x"))
    _append_via(spark, t, cat, spark.range(2, 4).toDF("x"))
    _append_via(spark, t, cat, spark.range(4, 6).toDF("x"))
    snap = _cm_snapshot(spark, t, cat)
    assert snap.version == 2
    assert snap.scan().to_df().count() == 6

    published = cat.publish(t.storage, t.path)
    assert len(published) == 2
    # published deltas now listable; the catalog context is STILL required
    # (a catalog-managed table never becomes filesystem-authoritative)
    snap2 = _cm_snapshot(spark, t, cat)
    assert snap2.version == 2
    assert snap2.scan().to_df().count() == 6
    with pytest.raises(InvalidLogError, match="catalog-managed"):
        Snapshot.create(spark, t.path)
    # idempotent: second publish is a no-op
    assert cat.publish(t.storage, t.path) == []


def test_catalog_ratification_conflict(spark, tmp_path):
    t, cat = _cm_table(spark, str(tmp_path / "t"), spark.range(2).toDF("x"))
    # two transactions read the same snapshot; both try version 1
    snap = _cm_snapshot(spark, t, cat)
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
    snap = _cm_snapshot(spark, t, cat)
    assert snap.scan().to_df().count() == 6


def test_filesystem_committer_refuses_publish(spark, tmp_path):
    t = DeltaTable.create(spark, str(tmp_path / "t"), df=spark.range(2).toDF("x"))
    with pytest.raises(ValueError, match="publish"):
        FileSystemCommitter().publish(t.storage, t.path)


def test_catalog_managed_commit_requires_committer(spark, tmp_path):
    """A direct filesystem commit on a catalog-managed table would bypass
    ratification — the transaction must refuse."""
    t, cat = _cm_table(spark, str(tmp_path / "t"), spark.range(3).toDF("x"))
    snap = _cm_snapshot(spark, t, cat)
    txn = Transaction(
        spark, t.path, operation="WRITE", read_snapshot=snap
    ).write_data(spark.range(3, 6).toDF("x"))
    with pytest.raises(ValueError, match="committer"):
        txn.commit()
    # with the committer it lands (staged)
    assert txn.with_committer(cat).commit() == 1


def test_catalog_context_validation(spark, tmp_path):
    """Reference validate_catalog_managed_build_inputs/_result rules."""
    from delta_kernel_rs_spark.sources.log_segment import LogTailEntry

    # mcv on a NON-catalog-managed table is refused
    plain = DeltaTable.create(
        spark, str(tmp_path / "p"), df=spark.range(2).toDF("x")
    )
    with pytest.raises(InvalidLogError, match="non-catalog-managed"):
        Snapshot.create(spark, plain.path, max_catalog_version=0)

    t, cat = _cm_table(spark, str(tmp_path / "t"), spark.range(2).toDF("x"))
    _append_via(spark, t, cat, spark.range(2, 4).toDF("x"))
    tail = cat.log_tail()
    # staged commits without mcv
    with pytest.raises(InvalidLogError, match="max_catalog_version"):
        Snapshot.create(spark, t.path, log_tail=tail)
    # requested version above the catalog tip
    with pytest.raises(InvalidLogError, match="exceeds"):
        Snapshot.create(
            spark, t.path, version=5, log_tail=tail, max_catalog_version=1
        )
    # tail must end at the catalog tip when no time travel is requested
    with pytest.raises(InvalidLogError, match="not at max catalog version"):
        Snapshot.create(spark, t.path, log_tail=tail, max_catalog_version=7)
    # non-contiguous tail
    gap = [tail[0], LogTailEntry(tail[0].version + 2, tail[0].path)]
    with pytest.raises(InvalidLogError, match="contiguous"):
        Snapshot.create(
            spark, t.path, log_tail=gap, max_catalog_version=tail[0].version + 2
        )


def test_unknown_feature_property_refused(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown table feature"):
        DeltaTable.create(
            spark,
            str(tmp_path / "t"),
            df=spark.range(2).toDF("x"),
            properties={"delta.feature.timeTravelPlusPlus": "supported"},
        )
    # enablement keys materialize into the protocol, not the configuration
    t, cat = _cm_table(spark, str(tmp_path / "u"), spark.range(2).toDF("x"))
    snap = _cm_snapshot(spark, t, cat)
    assert "delta.feature.catalogManaged" not in snap.metadata.configuration
    assert "catalogManaged" in (snap.protocol.writer_features or [])
    assert "catalogManaged" in (snap.protocol.reader_features or [])


def test_catalog_committer_refused_on_plain_table(spark, tmp_path):
    """Staged commits need catalog context, and that context needs the
    feature — a catalog committer on a plain table must fail fast, not
    produce commits that later read back as invalid."""
    t = DeltaTable.create(spark, str(tmp_path / "t"), df=spark.range(3).toDF("x"))
    txn = Transaction(
        spark, t.path, operation="WRITE", read_snapshot=t.snapshot()
    ).write_data(spark.range(3, 6).toDF("x"))
    with pytest.raises(ValueError, match="non-catalog-managed"):
        txn.with_committer(InMemoryCatalogCommitter())
    # a filesystem committer is always fine
    assert txn.with_committer(FileSystemCommitter()).commit() == 1


def test_feature_enablement_lists_active_legacy_features(spark, tmp_path):
    """A delta.feature.* opt-in that raises the protocol to r3/w7 must
    also list every ACTIVE legacy feature (Delta spec: at the
    table-features protocol, nothing is implicit) — columnMapping here."""
    t = DeltaTable.create(
        spark,
        str(tmp_path / "t"),
        df=spark.range(3).toDF("x"),
        properties={
            "delta.columnMapping.mode": "name",
            "delta.feature.catalogManaged": "supported",
        },
    )
    cat = InMemoryCatalogCommitter()
    cat.register(0)
    snap = _cm_snapshot(spark, t, cat)
    assert "columnMapping" in (snap.protocol.writer_features or [])
    assert "columnMapping" in (snap.protocol.reader_features or [])
    assert snap.protocol.min_reader_version == 3
    assert snap.protocol.min_writer_version == 7
