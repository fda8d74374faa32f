"""Catalog log-tail hook (VERDICT r3 item 7).

Reference kernel/src/snapshot/builder.rs:149 ``with_log_tail``: a catalog
hands the reader ratified-but-unpublished commits; the snapshot must
include them even though they are not listable under ``_delta_log``.
Tables here are genuinely catalog-managed, so loads carry the full
catalog context (tail + max_catalog_version) per builder.rs:326-420.
"""

from __future__ import annotations

import pytest

from delta_kernel_rs_spark.sources.committer import InMemoryCatalogCommitter
from delta_kernel_rs_spark.sources.log_segment import InvalidLogError, LogTailEntry
from delta_kernel_rs_spark.sources.snapshot import Snapshot
from delta_kernel_rs_spark.sources.table import DeltaTable
from delta_kernel_rs_spark.sources.transaction import Transaction


@pytest.fixture()
def staged_table(spark, tmp_path):
    """Catalog-managed 3-commit table: v1 ratified AND published, v2
    ratified but still staged under _staged_commits."""
    path = str(tmp_path / "t")
    t = DeltaTable.create(
        spark,
        path,
        df=spark.range(10).toDF("x"),
        properties={"delta.feature.catalogManaged": "supported"},
    )
    cat = InMemoryCatalogCommitter()
    cat.register(0)

    def append(df):
        snap = Snapshot.create(
            spark,
            path,
            log_tail=cat.log_tail() or None,
            max_catalog_version=cat.max_catalog_version(),
        )
        Transaction(
            spark, path, operation="WRITE", read_snapshot=snap
        ).write_data(df).with_committer(cat).commit()

    append(spark.range(10, 20).toDF("x"))
    cat.publish(t.storage, path, up_to_version=1)
    append(spark.range(20, 30).toDF("x"))
    staged = cat.log_tail()[-1].path
    return path, staged, cat


def test_snapshot_requires_catalog_context(spark, staged_table):
    path, _, cat = staged_table
    # filesystem listing alone is never authoritative for this table
    with pytest.raises(InvalidLogError, match="catalog-managed"):
        Snapshot.create(spark, path)
    # catalog context without a tail is allowed (the catalog handed out no
    # staged commits) — the snapshot lands on the published tip
    snap = Snapshot.create(spark, path, max_catalog_version=2)
    assert snap.version == 1
    # a tail that does not reach the catalog tip is rejected
    with pytest.raises(InvalidLogError, match="max catalog version"):
        bad = [LogTailEntry(1, cat.log_tail()[0].path)]
        Snapshot.create(spark, path, log_tail=bad, max_catalog_version=2)


def test_snapshot_with_log_tail_reads_staged_commit(spark, staged_table):
    path, staged, cat = staged_table
    snap = Snapshot.create(
        spark,
        path,
        log_tail=[LogTailEntry(2, staged)],
        max_catalog_version=2,
    )
    assert snap.version == 2
    df = snap.to_df()
    assert df.count() == 30
    assert df.agg({"x": "max"}).collect()[0][0] == 29


def test_log_tail_entry_wins_over_listed_commit(spark, staged_table):
    """The catalog's copy of a version shadows the listed file at the same
    version (the catalog is the source of truth)."""
    path, staged, _ = staged_table
    # decoy: present v1 (published) as having the staged commit 2's content —
    # if the tail entry wins, replay sees the staged content for v1
    snap = Snapshot.create(
        spark,
        path,
        log_tail=[LogTailEntry(1, staged), LogTailEntry(2, staged)],
        max_catalog_version=2,
    )
    # v1 shadowed by commit-2 content (adds the 20..30 file), v2 staged:
    # the replay dedups identical (path, dv) keys, so rows = 10 + 10
    assert snap.version == 2
    assert snap.to_df().count() == 20


def test_log_tail_respects_version_bound(spark, staged_table):
    path, staged, _ = staged_table
    snap = Snapshot.create(
        spark,
        path,
        version=1,
        log_tail=[LogTailEntry(2, staged)],
        max_catalog_version=2,
    )
    assert snap.version == 1
    assert snap.to_df().count() == 20
