"""CommitRange: raw contiguous commit-range reads (reference
kernel/src/commit_range/mod.rs — raw actions, no CDF materialization,
protocol validation along the range)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from delta_kernel_rs_spark.sources.commit_range import commit_range
from delta_kernel_rs_spark.sources.delete import delete_where
from delta_kernel_rs_spark.sources.log_segment import InvalidLogError
from delta_kernel_rs_spark.sources.table import DeltaTable


def _ints(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 10).coalesce(1))
    t.append(_ints(spark, 10, 20).coalesce(1), auto_checkpoint=False)
    delete_where(t, "k < 5")  # v2: remove + re-add
    t.append(_ints(spark, 20, 30).coalesce(1), auto_checkpoint=False)
    return t


def test_range_add_remove(spark, table):
    df = commit_range(spark, table.path, 0, 3)
    rows = df.collect()
    assert {r.version for r in rows} == {0, 1, 2, 3}
    adds = [r for r in rows if r.add is not None]
    removes = [r for r in rows if r.remove is not None]
    assert {r.version for r in removes} == {2}
    assert {r.version for r in adds} == {0, 1, 2, 3}
    assert all(r.timestamp is not None for r in rows)
    # sub-range
    sub = commit_range(spark, table.path, 1, 2).collect()
    assert {r.version for r in sub} == {1, 2}
    # end defaults to newest
    assert {r.version for r in commit_range(spark, table.path, 2).collect()} == {2, 3}


def test_range_other_action_kinds(spark, table):
    meta = commit_range(spark, table.path, 0, 0, actions=("metaData", "protocol")).collect()
    kinds = {("metaData" if r.metaData is not None else "protocol") for r in meta}
    assert kinds == {"metaData", "protocol"}
    ci = commit_range(spark, table.path, 0, 3, actions=("commitInfo",)).collect()
    assert len(ci) == 4 and all(r.commitInfo is not None for r in ci)


def test_range_from_snapshot_reuses_listing(spark, table):
    snap = table.snapshot()
    df = commit_range(spark, table.path, 0, 2, snapshot=snap)
    assert {r.version for r in df.collect()} == {0, 1, 2}
    other = str(os.path.dirname(table.path)) + "/elsewhere"
    with pytest.raises(ValueError, match="belongs to"):
        commit_range(spark, other, 0, 1, snapshot=snap)


def test_range_validation_errors(spark, table):
    with pytest.raises(ValueError, match="at least one"):
        commit_range(spark, table.path, 0, 1, actions=())
    with pytest.raises(ValueError, match="duplicate"):
        commit_range(spark, table.path, 0, 1, actions=("add", "add"))
    with pytest.raises(ValueError, match="unknown"):
        commit_range(spark, table.path, 0, 1, actions=("sidecar",))
    with pytest.raises(InvalidLogError, match="missing|contiguous"):
        commit_range(spark, table.path, 0, 9)
    with pytest.raises(ValueError, match="start"):
        commit_range(spark, table.path, 3, 1)


def test_range_rejects_unsupported_protocol(spark, table):
    log = os.path.join(table.path, "_delta_log")
    with open(os.path.join(log, "00000000000000000004.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {"minReaderVersion": 9, "minWriterVersion": 9}}) + "\n")
    with pytest.raises(InvalidLogError, match="minReaderVersion"):
        commit_range(spark, table.path, 0, 4).collect()
    # a range that stops BEFORE the upgrade still reads fine
    assert commit_range(spark, table.path, 0, 3).count() > 0


def test_range_below_checkpoint_with_snapshot_falls_back(spark, tmp_path):
    """A snapshot's segment only lists post-checkpoint commits; ranges
    reaching below the checkpoint fall back to a log listing instead of
    claiming the commits are missing (they are still on disk)."""
    path = str(tmp_path / "t")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 5).coalesce(1))
    for i in range(4):
        t.append(_ints(spark, 5 + i, 6 + i).coalesce(1), auto_checkpoint=False)
    t.checkpoint()
    snap = t.snapshot()
    df = commit_range(spark, path, 0, 2, snapshot=snap)
    assert {r.version for r in df.collect()} == {0, 1, 2}


def test_range_with_compacted_segment_and_default_end(spark, tmp_path):
    """A snapshot segment containing a compacted file is not a raw-commit
    lister for the covered versions; with end_version defaulted the range
    must fall back to the disk listing instead of raising."""
    path = str(tmp_path / "t")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 5).coalesce(1))
    for i in range(5):
        t.append(_ints(spark, 5 + i, 6 + i).coalesce(1), auto_checkpoint=False)
    t.compact_log(1, 3)
    snap = t.snapshot()
    df = commit_range(spark, path, 0, snapshot=snap)  # end defaults to tip
    assert {r.version for r in df.collect()} == set(range(6))
