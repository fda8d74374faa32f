"""`_last_checkpoint` hint: rich-field writing, retained parsing, identity
check, and reader fast paths.

Mirrors the reference's last_checkpoint_hint.rs: the base writer fields
(version/size/parts/sizeInBytes/numOfAddFiles, checkpoint/mod.rs:302-314),
the LastCheckpointV2 read model (:60-91), applies_to identity (:110-138),
oversized-field dropping (:141-178), and the checkpoint_shape.rs hint
consumption that skips reading the checkpoint file.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from delta_kernel_rs_spark.sources.log_segment import (
    HINT_NON_FILE_ACTIONS_THRESHOLD,
    HINT_SIDECARS_THRESHOLD,
    _retain_hint,
    build_log_segment,
)
from delta_kernel_rs_spark.sources.snapshot import Snapshot
from delta_kernel_rs_spark.sources.storage import storage_for
from delta_kernel_rs_spark.sources.table import DeltaTable
from tests.conftest import SF_SMOKE


@pytest.fixture()
def orders(spark):
    return spark.read.parquet(f"{SF_SMOKE}/orders.parquet")


def _hint(tmp_path):
    with open(str(tmp_path / "t/_delta_log/_last_checkpoint")) as fh:
        return json.load(fh)


def _make_table(spark, tmp_path, orders, n_appends=3):
    t = DeltaTable.create(spark, str(tmp_path / "t"), df=orders.limit(50))
    for i in range(n_appends):
        t.append(orders.limit(20), auto_checkpoint=False)
    return t


def test_classic_hint_base_fields(spark, tmp_path, orders):
    t = _make_table(spark, tmp_path, orders)
    t.checkpoint()
    hint = _hint(tmp_path)
    assert hint["version"] == 3
    assert "parts" not in hint  # classic: single-part, field omitted
    assert hint["numOfAddFiles"] == 4  # one add per commit
    storage = storage_for(spark, str(tmp_path / "t"))
    ckpt = f"{tmp_path}/t/_delta_log/{3:020d}.checkpoint.parquet"
    assert hint["sizeInBytes"] == storage.stat(ckpt).size
    assert hint["size"] >= 4 + 2  # adds + P&M at least


def test_multipart_hint_fields_and_applies(spark, tmp_path, orders):
    t = _make_table(spark, tmp_path, orders)
    t.checkpoint(parts=3)
    hint = _hint(tmp_path)
    assert hint["parts"] == 3
    assert hint["numOfAddFiles"] == 4
    seg = build_log_segment(storage_for(spark, t.path), t.path)
    assert seg.checkpoint_hint is not None  # identity matches -> retained
    assert seg.hint_sidecar_files() is None  # no v2Checkpoint object


def test_v2_hint_carries_sidecars_and_non_file_actions(spark, tmp_path, orders):
    t = _make_table(spark, tmp_path, orders)
    t.append_with_txn(orders.limit(5), "writer-app", 7)
    t.checkpoint(v2=True)
    hint = _hint(tmp_path)
    v2 = hint["v2Checkpoint"]
    ckpt_name = v2["path"]
    assert ckpt_name.endswith(".parquet") and ".checkpoint." in ckpt_name
    [sc] = v2["sidecarFiles"]
    assert sc["path"].endswith(".parquet") and sc["sizeInBytes"] > 0
    kinds = [next(iter(a)) for a in v2["nonFileActions"]]
    assert "protocol" in kinds and "metaData" in kinds and "checkpointMetadata" in kinds
    assert any(a.get("txn", {}).get("appId") == "writer-app" for a in v2["nonFileActions"])

    seg = build_log_segment(storage_for(spark, t.path), t.path)
    assert seg.checkpoint_hint is not None
    assert [s["path"] for s in seg.hint_sidecar_files()] == [sc["path"]]
    assert seg.hint_non_file_actions() == v2["nonFileActions"]


def test_v2_reader_never_opens_the_checkpoint_file(spark, tmp_path, orders):
    """With an applicable v2Checkpoint hint, replay reads the sidecars and
    P&M/txn/domain come from nonFileActions — the top-level checkpoint file
    is never opened (reference checkpoint_shape.rs:113-135). Proven by
    corrupting the file after the hint is written."""
    t = _make_table(spark, tmp_path, orders)
    expected = t.to_df().count()
    t.checkpoint(v2=True)
    hint = _hint(tmp_path)
    top = f"{t.path}/_delta_log/{hint['v2Checkpoint']['path']}"
    storage = storage_for(spark, t.path)
    storage.put_overwrite(top, b"not parquet at all")
    # CRC would answer P&M without the hint — remove it to isolate the path
    for e in storage.list_dir(f"{t.path}/_delta_log"):
        if e.path.endswith(".crc"):
            storage.delete(e.path)

    snap = Snapshot.create(spark, t.path)
    assert snap.log_segment.checkpoint_hint is not None
    assert snap.to_df().count() == expected
    assert snap.get_domain_metadata("no.such.domain") is None


def test_mismatched_hint_is_dropped_and_file_read_wins(spark, tmp_path, orders):
    """applies_to: a hint naming a DIFFERENT uuid checkpoint at the same
    version must not be trusted — the reader falls back to the file."""
    t = _make_table(spark, tmp_path, orders)
    expected = t.to_df().count()
    t.checkpoint(v2=True)
    storage = storage_for(spark, t.path)
    hint = _hint(tmp_path)
    hint["v2Checkpoint"]["path"] = "00000000000000000003.checkpoint.0000-dead-beef.parquet"
    hint["v2Checkpoint"]["sidecarFiles"] = [{"path": "does-not-exist.parquet"}]
    storage.put_overwrite(
        f"{t.path}/_delta_log/_last_checkpoint", json.dumps(hint).encode()
    )
    seg = build_log_segment(storage, t.path)
    assert seg.checkpoint_hint is None  # identity mismatch -> untrusted
    assert Snapshot.create(spark, t.path).to_df().count() == expected


def test_oversized_hint_fields_dropped_whole():
    base = {
        "version": 5,
        "size": 10,
        "v2Checkpoint": {
            "path": "c.parquet",
            "sidecarFiles": [
                {"path": f"s{i}.parquet"} for i in range(HINT_SIDECARS_THRESHOLD + 1)
            ],
            "nonFileActions": [{"protocol": {"minReaderVersion": 1}}],
        },
    }
    kept = _retain_hint(base)
    assert "sidecarFiles" not in kept["v2Checkpoint"]  # dropped, not truncated
    assert kept["v2Checkpoint"]["nonFileActions"]  # under-threshold field kept

    base["v2Checkpoint"]["sidecarFiles"] = [{"path": "s.parquet"}]
    base["v2Checkpoint"]["nonFileActions"] = [
        {"txn": {"appId": str(i)}} for i in range(HINT_NON_FILE_ACTIONS_THRESHOLD + 1)
    ]
    kept = _retain_hint(base)
    assert "nonFileActions" not in kept["v2Checkpoint"]
    assert kept["v2Checkpoint"]["sidecarFiles"]


def test_unrecognized_hint_action_fails_whole_parse():
    """An unknown action key in nonFileActions fails the WHOLE hint parse
    (reference HintAction docs: serde failure -> try_read swallows it, the
    reader falls back to reading the checkpoint)."""
    hint = {
        "version": 5,
        "size": 10,
        "v2Checkpoint": {
            "path": "c.parquet",
            "nonFileActions": [{"protocol": {"minReaderVersion": 1}}, {"add": {}}],
        },
    }
    assert _retain_hint(hint) is None
    assert _retain_hint({"version": "not-an-int"}) is None
    assert _retain_hint({"version": 5, "v2Checkpoint": {"path": 3}}) is None


def test_checkpoint_writer_reads_prior_state_from_hint(spark, tmp_path, orders):
    """A second checkpoint after more commits folds the prior checkpoint's
    txn/domain state in via the hint's nonFileActions (live_txns_and_domains
    fast path) — and the resulting table still reads correctly."""
    t = _make_table(spark, tmp_path, orders)
    t.append_with_txn(orders.limit(5), "app-a", 1)
    t.checkpoint(v2=True)
    t.append(orders.limit(5), auto_checkpoint=False)
    t.checkpoint(v2=True)  # prior txn state must survive via the hint
    # drop CRCs so latest_txn_version resolves through replay/checkpoint
    storage = storage_for(spark, t.path)
    for e in storage.list_dir(f"{t.path}/_delta_log"):
        if e.path.endswith(".crc"):
            storage.delete(e.path)
    snap = Snapshot.create(spark, t.path)
    hint_actions = snap.log_segment.hint_non_file_actions()
    assert any(a.get("txn", {}).get("appId") == "app-a" for a in hint_actions)
    assert snap.to_df().count() == t.to_df().count()
