"""CRC version-checksum tests (reference kernel/src/crc/mod.rs,
snapshot/incremental.rs)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from delta_kernel_rs_spark.sources.crc import read_crc, update_crc_incremental
from delta_kernel_rs_spark.sources.storage import LocalStorage
from delta_kernel_rs_spark.sources.table import DeltaTable


def _ints(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def test_full_crc_write_and_shape(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 50))
    # the commit path maintains the CRC chain automatically from v0 (r8);
    # the explicit full write refuses to overwrite it
    assert t.write_crc() is False
    crc = json.loads((tmp_path / "tbl" / "_delta_log" / f"{0:020d}.crc").read_text())
    assert crc["numMetadata"] == 1 and crc["numProtocol"] == 1
    files = t.snapshot().scan().files()
    assert crc["numFiles"] == len(files)
    assert crc["tableSizeBytes"] == sum(f.size for f in files)
    assert crc["metadata"]["schemaString"] == t.snapshot().metadata.schema_string
    # a fresh table dir with the CRC removed: the explicit full write lands
    (tmp_path / "tbl" / "_delta_log" / f"{0:020d}.crc").unlink()
    assert t.write_crc() is True


def test_incremental_crc_on_append(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 50))
    t.write_crc()
    v = t.append(_ints(spark, 50, 70))  # maybe_write_crc extends v-1's CRC
    storage = LocalStorage()
    crc = read_crc(storage, path, v)
    assert crc is not None
    files = t.snapshot().scan().files()
    assert crc["numFiles"] == len(files)
    assert crc["tableSizeBytes"] == sum(f.size for f in files)


def test_incremental_crc_tracks_cow_delete(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 50))
    t.write_crc()
    t.delete("k >= 25")
    storage = LocalStorage()
    v = t.snapshot().version
    assert update_crc_incremental(spark, path, storage, v) in (True, False)
    crc = read_crc(storage, path, v)
    if crc is not None:
        files = t.snapshot().scan().files()
        assert crc["numFiles"] == len(files)


def test_crc_fast_path_resolves_pm(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 30))
    t.write_crc()

    # With the CRC present, snapshot construction must not read commit
    # files for P&M resolution.
    import delta_kernel_rs_spark.sources.snapshot as snap_mod

    calls = []
    orig = snap_mod._scan_commit_for_pm

    def spy(text):
        calls.append(1)
        return orig(text)

    monkeypatch.setattr(snap_mod, "_scan_commit_for_pm", spy)
    snap = t.snapshot()
    assert snap.metadata.schema_string
    assert calls == []  # P&M came from the CRC, not from commit replay
    assert snap.to_df().count() == 30


def test_corrupt_crc_falls_back(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 10))
    crc_file = tmp_path / "tbl" / "_delta_log" / f"{0:020d}.crc"
    crc_file.write_text("{not json")
    snap = t.snapshot()  # replay fallback, no error
    assert snap.to_df().count() == 10
    with pytest.raises(Exception):
        json.loads(crc_file.read_text())


def test_crc_chain_maintained_across_mixed_dml(spark, tmp_path):
    """The commit path maintains the CRC chain automatically (r8): after
    create + append + CoW delete + DV delete + update, every version has
    a CRC whose numFiles/tableSizeBytes match a full recompute — the
    invariant that makes the P&M fast path trustworthy."""
    from delta_kernel_rs_spark.sources.delete import delete_with_dvs

    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 100))
    t.append(_ints(spark, 100, 200))
    t.delete("k >= 180")
    delete_with_dvs(t, "k % 10 = 0")
    t.update("k < 5", {"k": "k + 1000"})
    # streamed maintenance commits skip the inline CRC; the wrapper's
    # full-compute fallback must re-seed the chain (numbers still exact,
    # incl. dataChange=false removes shrinking the live set)
    t.optimize(small_file_threshold=1 << 30)
    t.purge_deletion_vectors()

    storage = LocalStorage()
    tip = t.snapshot().version
    assert tip >= 4
    for v in range(tip + 1):
        crc = read_crc(storage, path, v)
        assert crc is not None, f"missing CRC at v{v} — chain broke"
        snap = t.snapshot(version=v)
        files = snap.scan().files()
        assert crc["numFiles"] == len(files), f"v{v} file count"
        assert crc["tableSizeBytes"] == sum(f.size for f in files), f"v{v} bytes"
    # and the tip CRC is what snapshot construction reads (P&M fast path)
    assert read_crc(storage, path, tip)["metadata"]["schemaString"] == (
        t.snapshot().metadata.schema_string
    )


def test_crc_carries_complete_txn_and_domain_state(spark, tmp_path):
    """Reference CrcRaw optional fields (crc/mod.rs:142-168): a PRESENT
    setTransactions/domainMetadata array is the authoritative complete
    state. The incremental fold maintains both; the app-txn and domain
    lookups answer from the tip CRC and agree exactly with full replay."""
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(
        spark, path, df=_ints(spark, 0, 10),
        properties={"delta.enableRowTracking": "true"},
    )
    t.append_with_txn(_ints(spark, 10, 20), "appA", 7)
    t.append_with_txn(_ints(spark, 20, 30), "appA", 9)  # newest wins
    t.append_with_txn(_ints(spark, 30, 40), "appB", 1)

    storage = LocalStorage()
    tip = t.snapshot().version
    crc = read_crc(storage, path, tip)
    assert {x["appId"]: x["version"] for x in crc["setTransactions"]} == {
        "appA": 9, "appB": 1,
    }
    domains = {d["domain"] for d in crc["domainMetadata"]}
    assert "delta.rowTracking" in domains
    assert not any(d.get("removed") for d in crc["domainMetadata"])

    # fast-path answers == replay answers (delete the CRCs to force replay)
    fast = {a: t.latest_txn_version(a) for a in ("appA", "appB", "appC")}
    dm_fast = t.snapshot().get_domain_metadata("delta.rowTracking")
    for f in (tmp_path / "tbl" / "_delta_log").iterdir():
        if f.name.endswith(".crc"):
            f.unlink()
    assert fast == {a: t.latest_txn_version(a) for a in ("appA", "appB", "appC")}
    assert dm_fast == t.snapshot().get_domain_metadata("delta.rowTracking")


# ---------------------------------------------------------------------------
# Foreign commits + concurrency (r8 VERDICT next #6): the incremental
# fold assumed this engine's own commit shapes — adversarial cases here.


def _foreign_commit(path, version, lines):
    commit = f"{path}/_delta_log/{version:020d}.json"
    with open(commit, "w") as fh:
        fh.write("\n".join(json.dumps(x) for x in lines) + "\n")


def test_crc_fold_bails_on_unknown_action_kind(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 20))
    _foreign_commit(path, 1, [
        {"commitInfo": {"operation": "FOREIGN"}},
        {"futureAction": {"payload": 1}},  # unknown kind: effect unknowable
        {"add": {"path": "x.parquet", "partitionValues": {}, "size": 10,
                 "modificationTime": 0, "dataChange": True}},
    ])
    storage = LocalStorage()
    assert update_crc_incremental(spark, path, storage, 1) is False
    assert read_crc(storage, path, 1) is None


def test_crc_fold_bails_on_remove_without_size(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 20))
    rel = t.snapshot().scan().files()[0].path.rsplit("/", 1)[-1]
    _foreign_commit(path, 1, [
        {"commitInfo": {"operation": "FOREIGN DELETE"}},
        {"remove": {"path": rel, "dataChange": True}},  # no extended metadata
    ])
    storage = LocalStorage()
    assert update_crc_incremental(spark, path, storage, 1) is False
    assert read_crc(storage, path, 1) is None


def test_crc_fold_bails_on_duplicate_remove_in_commit(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 20))
    f = t.snapshot().scan().files()[0]
    rel = f.path.rsplit("/", 1)[-1]
    rm = {"path": rel, "dataChange": True, "size": f.size,
          "extendedFileMetadata": True, "partitionValues": {}}
    _foreign_commit(path, 1, [
        {"commitInfo": {"operation": "FOREIGN"}},
        {"remove": rm},
        {"remove": dict(rm)},  # double tombstone: must not double-decrement
    ])
    storage = LocalStorage()
    assert update_crc_incremental(spark, path, storage, 1) is False
    assert read_crc(storage, path, 1) is None


def test_crc_fold_bails_when_counts_go_negative(spark, tmp_path):
    """Cross-commit duplicate tombstone: a remove whose key was not live
    drives numFiles below zero — definite corruption, never written."""
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 20).coalesce(1))
    files = t.snapshot().scan().files()
    assert len(files) == 1  # single tombstone must empty the table
    f = files[0]
    rel = f.path.rsplit("/", 1)[-1]
    rm = {"path": rel, "dataChange": True, "size": f.size,
          "extendedFileMetadata": True, "partitionValues": {}}
    _foreign_commit(path, 1, [{"commitInfo": {}}, {"remove": rm}])
    _foreign_commit(path, 2, [{"commitInfo": {}}, {"remove": dict(rm)}])
    storage = LocalStorage()
    assert update_crc_incremental(spark, path, storage, 1) is True  # legit
    assert update_crc_incremental(spark, path, storage, 2) is False
    assert read_crc(storage, path, 2) is None


def test_crc_fold_accepts_dv_swap_commit(spark, tmp_path):
    """remove+add of the same path with different DVs (a DV delete) is
    NOT a duplicate remove — the fold nets to zero file-count change."""
    from delta_kernel_rs_spark.sources.delete import delete_with_dvs

    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 50))
    delete_with_dvs(t, "k % 5 = 0")
    storage = LocalStorage()
    crc = read_crc(storage, path, 1)
    assert crc is not None
    files = t.snapshot().scan().files()
    assert crc["numFiles"] == len(files)
    assert crc["tableSizeBytes"] == sum(f.size for f in files)


def test_crc_concurrent_fold_race_single_winner(spark, tmp_path):
    """Two writers folding v -> v+1 concurrently: put-if-absent keeps the
    chain consistent — exactly one write wins, and the surviving file is
    byte-identical to what either writer computed."""
    import threading

    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 30))
    v = t.append(_ints(spark, 30, 60))
    storage = LocalStorage()
    crc_file = tmp_path / "tbl" / "_delta_log" / f"{v:020d}.crc"
    crc_file.unlink()  # re-open the race the commit path already won

    results = []
    barrier = threading.Barrier(4)

    def fold():
        barrier.wait()
        results.append(update_crc_incremental(spark, path, storage, v))

    threads = [threading.Thread(target=fold) for _ in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    # every fold reports success-or-already-present, never an error; the
    # file exists exactly once and matches the true state
    assert all(r in (True, False) for r in results)
    crc = read_crc(storage, path, v)
    files = t.snapshot().scan().files()
    assert crc["numFiles"] == len(files)
    assert crc["tableSizeBytes"] == sum(f.size for f in files)
