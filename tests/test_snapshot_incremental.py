"""Incremental snapshot update — ``Snapshot.create_from`` parity with the
reference's ``Snapshot::builder_from(existing).build(engine)``
(kernel/src/snapshot/incremental.rs:34-199, case taxonomy A-F).

The point at scale: a long-lived reader refreshing per commit must pay
O(new commits) for P&M resolution, never re-read the whole commit tail
(the reference's 300k-add log is ~46 MB of JSON per full rebuild). The
read-counting test pins that contract, not just the result values.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_kernel_rs_spark.sources.log_segment import InvalidLogError
from delta_kernel_rs_spark.sources.snapshot import Snapshot
from delta_kernel_rs_spark.sources.table import DeltaTable


def _mk(spark, path, commits=3):
    df = spark.range(10).select(F.col("id").alias("k"))
    t = DeltaTable.create(spark, path, df=df)
    for _ in range(commits - 1):
        t.append(df, auto_checkpoint=False)
    return t


def test_case_a_same_version_returns_existing(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    snap = t.snapshot()
    assert Snapshot.create_from(snap, version=snap.version) is snap


def test_case_b_backwards_errors(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    snap = t.snapshot()
    with pytest.raises(InvalidLogError, match="forward"):
        Snapshot.create_from(snap, version=snap.version - 1)


def test_case_e_no_new_commits_returns_existing(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    snap = t.snapshot()
    assert Snapshot.create_from(snap) is snap


def test_case_f_advances_and_reads_only_new_commits(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _mk(spark, path, commits=3)
    base = t.snapshot()
    t.append(spark.range(5).select(F.col("id").alias("k")), auto_checkpoint=False)
    t.append(spark.range(5).select(F.col("id").alias("k")), auto_checkpoint=False)
    # drop the CRC chain so P&M resolution must walk commits (the CRC fast
    # path would otherwise serve P&M without reading any commit at all)
    for crc in (tmp_path / "t" / "_delta_log").glob("*.crc"):
        crc.unlink()

    read_paths: list[str] = []
    orig = base.storage.read_text

    def counting_read(p):
        read_paths.append(p)
        return orig(p)

    base.storage.read_text = counting_read
    try:
        snap2 = Snapshot.create_from(base)
    finally:
        base.storage.read_text = orig
    assert snap2.version == base.version + 2
    # P&M resolution touched ONLY commits newer than the baseline
    touched = [p for p in read_paths if p.endswith(".json") and "_delta_log" in p]
    import re

    versions = {int(re.search(r"(\d{20})\.json$", p).group(1)) for p in touched}
    assert versions and all(v > base.version for v in versions)
    # and the result matches a from-scratch snapshot
    fresh = Snapshot.create(spark, path)
    assert snap2.version == fresh.version
    assert {f.path for f in snap2.scan().files()} == {
        f.path for f in fresh.scan().files()
    }
    assert snap2.metadata.schema == fresh.metadata.schema


def test_case_f_picks_up_newer_metadata(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _mk(spark, path)
    base = t.snapshot()
    t.set_properties({"delta.appendOnly": "true"})
    snap2 = Snapshot.create_from(base)
    assert snap2.metadata.configuration.get("delta.appendOnly") == "true"
    # baseline object untouched
    assert "delta.appendOnly" not in base.metadata.configuration


def test_case_f_picks_up_schema_evolution(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _mk(spark, path)
    base = t.snapshot()
    t.add_column("extra", T.LongType())
    snap2 = Snapshot.create_from(base)
    assert "extra" in [f.name for f in snap2.metadata.schema.fields]
    assert "extra" not in [f.name for f in base.metadata.schema.fields]


def test_case_d1_checkpoint_ahead_rebuilds(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _mk(spark, path)
    base = t.snapshot()
    t.append(spark.range(5).select(F.col("id").alias("k")), auto_checkpoint=False)
    t.set_properties({"delta.appendOnly": "true"})
    t.checkpoint()
    snap2 = Snapshot.create_from(base)
    fresh = Snapshot.create(spark, path)
    assert snap2.version == fresh.version
    assert snap2.log_segment.checkpoint_version == fresh.log_segment.checkpoint_version
    assert snap2.metadata.configuration.get("delta.appendOnly") == "true"
    assert {f.path for f in snap2.scan().files()} == {
        f.path for f in fresh.scan().files()
    }


def test_refresh_loop_matches_full_scan(spark, tmp_path):
    """The long-lived reader loop: create_from + scan_files_df_from per
    commit equals a from-scratch scan at every step."""
    path = str(tmp_path / "t")
    t = _mk(spark, path, commits=2)
    snap = t.snapshot()
    prior = snap.scan().scan_files_df().persist()
    prior.count()
    for i in range(3):
        t.append(
            spark.range(4).select(F.col("id").alias("k")), auto_checkpoint=False
        )
        if i == 1:
            t.delete(F.col("k") == 2)
        tip = Snapshot.create_from(snap)
        merged = tip.scan_files_df_from(snap.version, prior)
        fresh_files = {
            f.path for f in Snapshot.create(spark, path).scan().files()
        }
        got = {r.file_path for r in merged.select("file_path").collect()}
        assert got == fresh_files, f"step {i}"
        prior.unpersist()
        prior = merged.persist()
        prior.count()
        snap = tip
