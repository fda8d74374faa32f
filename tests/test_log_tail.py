"""Catalog log-tail hook (VERDICT r3 item 7).

Reference kernel/src/snapshot/builder.rs:149 ``with_log_tail``: a catalog
can hand the reader ratified-but-unpublished commits; the snapshot must
include them even though they are not listable under ``_delta_log``.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from delta_kernel_rs_spark.sources.log_segment import LogTailEntry
from delta_kernel_rs_spark.sources.snapshot import Snapshot
from delta_kernel_rs_spark.sources.table import DeltaTable


@pytest.fixture()
def staged_table(spark, tmp_path):
    """3-commit table whose newest commit is moved out of _delta_log into
    a staged-commits dir (simulating a catalog-managed commit)."""
    path = str(tmp_path / "t")
    t = DeltaTable.create(spark, path, df=spark.range(10).toDF("x"))
    t.append(spark.range(10, 20).toDF("x"), auto_checkpoint=False)
    t.append(spark.range(20, 30).toDF("x"), auto_checkpoint=False)
    staged_dir = Path(path) / "_staged_commits"
    staged_dir.mkdir()
    published = Path(path) / "_delta_log" / f"{2:020d}.json"
    staged = staged_dir / f"{2:020d}.json"
    shutil.move(str(published), str(staged))
    return path, str(staged)


def test_snapshot_without_tail_sees_published_tip(spark, staged_table):
    path, _ = staged_table
    snap = Snapshot.create(spark, path)
    assert snap.version == 1
    assert snap.to_df().count() == 20


def test_snapshot_with_log_tail_reads_staged_commit(spark, staged_table):
    path, staged = staged_table
    snap = Snapshot.create(spark, path, log_tail=[LogTailEntry(2, staged)])
    assert snap.version == 2
    df = snap.to_df()
    assert df.count() == 30
    assert df.agg({"x": "max"}).collect()[0][0] == 29


def test_log_tail_entry_wins_over_listed_commit(spark, staged_table):
    """The catalog's copy of a version shadows the listed file at the same
    version (the catalog is the source of truth)."""
    path, staged = staged_table
    # put a decoy at version 1 that equals the staged commit 2's content —
    # if the tail entry wins, replay sees the staged content for v1
    snap = Snapshot.create(
        spark, path, log_tail=[LogTailEntry(1, staged), LogTailEntry(2, staged)]
    )
    # v1 shadowed by commit-2 content (adds the 20..30 file), v2 staged:
    # the table now shows create + two copies of the same add — the replay
    # dedups identical (path, dv) keys, so rows = 10 (create) + 10 (file)
    assert snap.version == 2
    assert snap.to_df().count() == 20


def test_log_tail_respects_version_bound(spark, staged_table):
    path, staged = staged_table
    snap = Snapshot.create(spark, path, version=1, log_tail=[LogTailEntry(2, staged)])
    assert snap.version == 1
    assert snap.to_df().count() == 20
