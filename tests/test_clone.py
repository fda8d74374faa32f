"""SHALLOW CLONE: zero-copy tables referencing another table's files."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_kernel_rs_spark.sources.clone import CloneError
from delta_kernel_rs_spark.sources.delete import delete_with_dvs
from delta_kernel_rs_spark.sources.table import DeltaTable


def _ints(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


@pytest.fixture()
def src(spark, tmp_path):
    t = DeltaTable.create(spark, str(tmp_path / "src"), df=_ints(spark, 0, 20))
    t.append(_ints(spark, 20, 30))
    return t


def test_clone_basic_and_versioned(spark, src, tmp_path):
    c = src.shallow_clone(str(tmp_path / "c1"))
    assert {r.k for r in c.to_df().collect()} == set(range(30))
    # no data files under the clone root (zero-copy)
    import os

    entries = {
        e for e in os.listdir(str(tmp_path / "c1")) if not e.startswith("_delta_log")
    }
    assert entries == set()
    # clone pinned at v0 sees only the first commit
    c0 = src.shallow_clone(str(tmp_path / "c0"), version=0)
    assert {r.k for r in c0.to_df().collect()} == set(range(20))


def test_clone_carries_dvs(spark, tmp_path):
    t = DeltaTable.create(spark, str(tmp_path / "s"), df=_ints(spark, 0, 10))
    delete_with_dvs(t, "k IN (1, 2)")
    c = t.shallow_clone(str(tmp_path / "c"))
    assert {r.k for r in c.to_df().collect()} == set(range(10)) - {1, 2}
    # portable descriptor: absolute-path storage, resolvable from the clone
    dvs = [f.dv for f in c.snapshot().scan().files() if f.dv]
    assert dvs and all(d["storageType"] == "p" for d in dvs)


def test_clone_is_independent(spark, src, tmp_path):
    c = src.shallow_clone(str(tmp_path / "c"))
    c.append(_ints(spark, 100, 105))
    c.delete("k < 5")
    assert {r.k for r in c.to_df().collect()} == set(range(5, 30)) | set(range(100, 105))
    # the source never changed
    assert {r.k for r in src.to_df().collect()} == set(range(30))
    assert src.snapshot().version == 1


def test_clone_column_mapped_source(spark, tmp_path):
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") % 2).cast("string").alias("p")
    )
    t = DeltaTable.create(
        spark,
        str(tmp_path / "cm"),
        df=df,
        partition_by=["p"],
        properties={"delta.columnMapping.mode": "name"},
    )
    c = t.shallow_clone(str(tmp_path / "cmc"))
    got = {(r.k, r.p) for r in c.to_df().collect()}
    assert got == {(i, str(i % 2)) for i in range(10)}
    # physical names preserved — the cloned files resolve under the same ids
    src_phys = {
        f.metadata.get("delta.columnMapping.physicalName")
        for f in t.snapshot().schema.fields
    }
    clone_phys = {
        f.metadata.get("delta.columnMapping.physicalName")
        for f in c.snapshot().schema.fields
    }
    assert src_phys == clone_phys


def test_clone_refuses_existing_dest(spark, src, tmp_path):
    src.shallow_clone(str(tmp_path / "c"))
    with pytest.raises(CloneError, match="already has a _delta_log"):
        src.shallow_clone(str(tmp_path / "c"))


def test_dv_delete_on_clone_merges_portable_dv(spark, tmp_path):
    """A DV delete on the clone must merge with the source's portable 'p'
    descriptor and write the new DV under the CLONE's root."""
    t = DeltaTable.create(spark, str(tmp_path / "s"), df=_ints(spark, 0, 10))
    delete_with_dvs(t, "k IN (1, 2)")
    c = t.shallow_clone(str(tmp_path / "c"))
    delete_with_dvs(c, "k IN (3, 4)")
    assert {r.k for r in c.to_df().collect()} == set(range(10)) - {1, 2, 3, 4}
    # source unaffected
    assert {r.k for r in t.to_df().collect()} == set(range(10)) - {1, 2}
    # files touched by the clone's delete carry a fresh DV (uuid-relative
    # or inline) while untouched files keep the source's portable 'p' form
    dvs = [f.dv for f in c.snapshot().scan().files() if f.dv]
    assert any(d["storageType"] in ("u", "i") for d in dvs)
    assert any(d["storageType"] == "p" for d in dvs)


def test_clone_commit_streams_without_full_collect(spark, tmp_path, monkeypatch):
    """Clone assembles its commit from toLocalIterator chunks — a full
    collect() of the file frame (the round-5 driver-buffer ceiling) must
    never happen on this path."""
    src = str(tmp_path / "src")
    t = DeltaTable.create(
        spark, src, df=spark.range(100).toDF("k").repartition(5)
    )

    df_cls = type(spark.range(1))

    def forbid_collect(self):
        raise AssertionError("clone must stream, not collect()")

    monkeypatch.setattr(df_cls, "collect", forbid_collect)
    dest = str(tmp_path / "dest")
    c = t.shallow_clone(dest)
    monkeypatch.undo()
    assert sorted(r.k for r in c.to_df().collect()) == list(range(100))
