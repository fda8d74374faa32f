"""The reference's canonical read/write cross-product sweep, re-expressed.

Mirrors `kernel/tests/integration/cross_product/mod.rs` +
`test-utils/src/table_builder.rs`: build a table with THIS engine across
{LogState x FeatureSet x (DataLayout, TableConfig)}, then resolve every
VersionTarget against it and assert the version/row-count contract
(snapshot at version v holds exactly v * ROWS_PER_COMMIT rows) plus
row-id uniqueness where row tracking is enabled.

Axes (reference names kept):

- LogState (all 17 sweep rows): commits_only, checkpoint_at_end[_no_hint],
  checkpoint_mid[_no_hint], two_checkpoints_stale_hint, crc_at_end/mid,
  checkpoint_at_end_crc_at_end, and the post-cleanup variants (commits
  before MID removed — MID stays reachable via its checkpoint).
- FeatureSet: no_features / all_features_cm_id / all_features_cm_name
  (cm + ICT + v2Checkpoint + DVs + appendOnly + CDF + typeWidening +
  domainMetadata + vacuumProtocolCheck + rowTracking).
- (DataLayout, TableConfig) bundled axis, reference
  layout_config_values: unpartitioned/partitioned/clustered crossed
  with checkpoint-stats encodings (json/struct/none) and data-skipping
  knobs (numIndexedCols 0/2/-1, statsColumns empty/reordered).
- VersionTarget: latest, at MID, incremental MID->latest, incremental
  MID->pre-latest, at-timestamp(max) — all 5 run per built table.

The Rust sweep crosses all axes (2805 cases); a Spark build costs ~15 s,
so this suite keeps every LogState row and rotates the other axes across
them (plus full FeatureSet anchors on three representative log shapes) —
every axis value appears several times, every LogState exactly once+.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from delta_kernel_rs_spark.sources.table import DeltaTable

ROWS_PER_COMMIT = 10
LATEST = 10  # DEFAULT_SWEEP_LATEST_VERSION
MID = 5  # DEFAULT_SWEEP_MID_VERSION


# --- LogState ---------------------------------------------------------------


class LogState:
    def __init__(
        self,
        checkpoints=(),
        crcs=(),
        hint="fresh",  # fresh | missing | stale
        cleanup_before=None,
        compactions=(),
    ):
        self.checkpoints = tuple(checkpoints)
        self.crcs = frozenset(crcs)
        self.hint = hint
        self.cleanup_before = cleanup_before
        self.compactions = tuple(compactions)


LOG_STATES = {
    "commits_only": LogState(),
    "checkpoint_at_end": LogState(checkpoints=[LATEST]),
    "checkpoint_at_end_no_hint": LogState(checkpoints=[LATEST], hint="missing"),
    "checkpoint_mid": LogState(checkpoints=[MID]),
    "checkpoint_mid_no_hint": LogState(checkpoints=[MID], hint="missing"),
    "two_checkpoints_stale_hint": LogState(checkpoints=[MID, LATEST], hint="stale"),
    "crc_at_end": LogState(crcs=[LATEST]),
    "crc_at_mid": LogState(crcs=[MID]),
    "checkpoint_at_end_crc_at_end": LogState(checkpoints=[LATEST], crcs=[LATEST]),
    "checkpoint_at_end_post_cleanup": LogState(
        checkpoints=[MID, LATEST], cleanup_before=MID
    ),
    "checkpoint_at_end_no_hint_post_cleanup": LogState(
        checkpoints=[MID, LATEST], hint="missing", cleanup_before=MID
    ),
    "checkpoint_mid_post_cleanup": LogState(checkpoints=[MID], cleanup_before=MID),
    "checkpoint_mid_no_hint_post_cleanup": LogState(
        checkpoints=[MID], hint="missing", cleanup_before=MID
    ),
    "two_checkpoints_stale_hint_post_cleanup": LogState(
        checkpoints=[MID, LATEST], hint="stale", cleanup_before=MID
    ),
    "checkpoint_mid_crc_at_mid_post_cleanup": LogState(
        checkpoints=[MID], crcs=[MID], cleanup_before=MID
    ),
    "checkpoint_mid_crc_above_mid_post_cleanup": LogState(
        checkpoints=[MID], crcs=[8], cleanup_before=MID
    ),
    "checkpoint_mid_crc_at_end_post_cleanup": LogState(
        checkpoints=[MID], crcs=[LATEST], cleanup_before=MID
    ),
    # Beyond the reference sweep (its own TODO #2337: log compaction axis):
    # replay must consume a compacted range in place of raw commits, and
    # one sitting above a checkpoint.
    "compacted_2_6": LogState(compactions=[(2, 6)]),
    "compacted_6_9_checkpoint_mid": LogState(
        checkpoints=[MID], compactions=[(6, 9)]
    ),
}


# --- FeatureSet -------------------------------------------------------------


def _all_features(cm_mode: str) -> dict:
    return {
        "delta.columnMapping.mode": cm_mode,
        "delta.enableInCommitTimestamps": "true",
        "delta.checkpointPolicy": "v2",
        "delta.feature.v2Checkpoint": "supported",
        "delta.enableDeletionVectors": "true",
        "delta.appendOnly": "true",
        "delta.enableChangeDataFeed": "true",
        "delta.enableTypeWidening": "true",
        "delta.feature.domainMetadata": "supported",
        "delta.feature.vacuumProtocolCheck": "supported",
        "delta.enableRowTracking": "true",
    }


FEATURE_SETS = {
    "no_features": {},
    "all_features_cm_id": _all_features("id"),
    "all_features_cm_name": _all_features("name"),
}


# --- (DataLayout, TableConfig) bundled axis ---------------------------------

_JSON = {
    "delta.checkpoint.writeStatsAsJson": "true",
    "delta.checkpoint.writeStatsAsStruct": "false",
}
_STRUCT = {
    "delta.checkpoint.writeStatsAsJson": "false",
    "delta.checkpoint.writeStatsAsStruct": "true",
}
_NONE = {
    "delta.checkpoint.writeStatsAsJson": "false",
    "delta.checkpoint.writeStatsAsStruct": "false",
}

# layout: None (unpartitioned) | "partitioned" | "clustered"
LAYOUT_CONFIGS = [
    ("unpart_nostats", None, _NONE),
    ("part_json_zero", "partitioned", {**_JSON, "delta.dataSkippingNumIndexedCols": "0"}),
    ("clust_struct_zero", "clustered", {**_STRUCT, "delta.dataSkippingNumIndexedCols": "0"}),
    ("unpart_json_narrow", None, {**_JSON, "delta.dataSkippingNumIndexedCols": "2"}),
    ("part_struct_narrow", "partitioned", {**_STRUCT, "delta.dataSkippingNumIndexedCols": "2"}),
    ("clust_json_all", "clustered", {**_JSON, "delta.dataSkippingNumIndexedCols": "-1"}),
    ("unpart_struct_all", None, {**_STRUCT, "delta.dataSkippingNumIndexedCols": "-1"}),
    ("part_json_cols_empty", "partitioned", {**_JSON, "delta.dataSkippingStatsColumns": ""}),
    ("clust_struct_cols_empty", "clustered", {**_STRUCT, "delta.dataSkippingStatsColumns": ""}),
    # reverse schema order (reference stats_columns_reordered)
    ("unpart_json_cols_reord", None, {**_JSON, "delta.dataSkippingStatsColumns": "s, c_double, id"}),
    ("part_struct_cols_reord", "partitioned", {**_STRUCT, "delta.dataSkippingStatsColumns": "s, c_double, id"}),
]


# --- sweep case list ---------------------------------------------------------
# Every LogState once, rotating the other axes; plus full FeatureSet anchors
# on three representative log shapes so each feature set also meets a
# checkpointed, a cleaned-up, and a plain log.

_FEATURES = list(FEATURE_SETS)
CASES = [
    (ls, _FEATURES[i % 3], i % len(LAYOUT_CONFIGS))
    for i, ls in enumerate(LOG_STATES)
]
CASES += [
    ("compacted_2_6", "all_features_cm_name", 8),
    ("compacted_6_9_checkpoint_mid", "no_features", 10),
    ("commits_only", "all_features_cm_id", 3),
    ("commits_only", "all_features_cm_name", 6),
    ("checkpoint_at_end", "no_features", 2),
    ("checkpoint_at_end", "all_features_cm_name", 5),
    ("checkpoint_mid_post_cleanup", "no_features", 9),
    ("checkpoint_mid_post_cleanup", "all_features_cm_id", 2),
]


def _df_for_commit(spark, v: int):
    base = (v - 1) * ROWS_PER_COMMIT
    return (
        spark.range(base, base + ROWS_PER_COMMIT)
        .coalesce(1)
        .select(
            F.col("id"),
            (F.col("id") % 2).cast("int").alias("part_int"),
            F.concat(F.lit("g"), (F.col("id") % 2)).alias("part_str"),
            F.col("id").alias("c_long"),
            (F.col("id") * 1.5).alias("c_double"),
            F.concat(F.lit("row-"), F.col("id")).alias("s"),
        )
    )


def _build(spark, path: str, log_state: LogState, props: dict, layout):
    kw = {}
    if layout == "partitioned":
        kw["partition_by"] = ["part_int", "part_str"]
    elif layout == "clustered":
        kw["cluster_by"] = ["c_long", "c_double"]
    t = DeltaTable.create(
        spark, path, df=None, schema=_df_for_commit(spark, 1).schema,
        properties=props, **kw
    )
    log_dir = f"{t.path}/_delta_log"
    stale_hint = None
    for v in range(1, LATEST + 1):
        t.append(_df_for_commit(spark, v), auto_checkpoint=False)
        if v in log_state.checkpoints:
            t.checkpoint()
            if v == MID:
                hint_p = f"{log_dir}/_last_checkpoint"
                if os.path.exists(hint_p):
                    stale_hint = open(hint_p, "rb").read()

    for lo, hi in log_state.compactions:
        t.compact_log(lo, hi)
    # sculpt the log into the target LogState (the reference's builder
    # writes these states directly; we post-process our writer's output)
    if log_state.cleanup_before is not None:
        for v in range(0, log_state.cleanup_before):
            for suffix in (".json", ".crc"):
                p = f"{log_dir}/{v:020d}{suffix}"
                if os.path.exists(p):
                    os.remove(p)
    # CRC presence is part of the axis: keep exactly the specified ones
    # (the engine's automatic CRC chain writes one per commit)
    for name in os.listdir(log_dir):
        if name.endswith(".crc"):
            v = int(name.split(".")[0])
            if v not in log_state.crcs:
                os.remove(f"{log_dir}/{name}")
    hint_p = f"{log_dir}/_last_checkpoint"
    if log_state.hint == "missing" and os.path.exists(hint_p):
        os.remove(hint_p)
    elif log_state.hint == "stale":
        assert stale_hint is not None, "stale hint requires a MID checkpoint"
        open(hint_p, "wb").write(stale_hint)
    return t


def _max_effective_timestamp(t) -> int:
    """Non-ICT time travel is file-mtime-based (delta semantics), ICT
    tables use the in-commit timestamp — take the max across both."""
    rows = t.history().select("timestamp", "inCommitTimestamp").collect()
    ts = max(
        (r["inCommitTimestamp"] if r["inCommitTimestamp"] is not None else r["timestamp"])
        for r in rows
    )
    log_dir = f"{t.path}/_delta_log"
    for name in os.listdir(log_dir):
        if name.endswith(".json") and name[:-5].isdigit():
            ts = max(ts, int(os.path.getmtime(f"{log_dir}/{name}") * 1000))
    return ts


@pytest.mark.parametrize(
    "ls_name,fs_name,layout_idx",
    CASES,
    ids=[f"{ls}__{fs}__{LAYOUT_CONFIGS[i][0]}" for ls, fs, i in CASES],
)
def test_cross_product_read_write(spark, tmp_path, ls_name, fs_name, layout_idx):
    log_state = LOG_STATES[ls_name]
    layout_name, layout, cfg = LAYOUT_CONFIGS[layout_idx]
    props = {**FEATURE_SETS[fs_name], **cfg}
    t = _build(spark, str(tmp_path / "t"), log_state, props, layout)
    row_tracking = fs_name != "no_features"

    def check(df, expected_rows):
        assert df.count() == expected_rows
        got = {r["id"] for r in df.select("id").collect()}
        assert got == set(range(expected_rows))

    # 1. latest
    snap = t.snapshot()
    assert snap.version == LATEST
    check(snap.to_df(), LATEST * ROWS_PER_COMMIT)
    if row_tracking:
        ids = [r["row_id"] for r in snap.to_df(with_row_ids=True).select("row_id").collect()]
        assert len(ids) == len(set(ids)), "row ids must be unique"

    # 2. at MID (post-cleanup states keep MID reachable via its checkpoint)
    mid_snap = t.snapshot(version=MID)
    assert mid_snap.version == MID
    check(mid_snap.to_df(), MID * ROWS_PER_COMMIT)

    # 3. incremental MID -> latest (frame-shaped scan_metadata_from)
    prior = mid_snap.scan().scan_files_df()
    refreshed = snap.scan_files_df_from(MID, prior)
    check(snap.scan().with_files_df(refreshed).to_df(), LATEST * ROWS_PER_COMMIT)

    # 4. incremental MID -> pre-latest
    pre = t.snapshot(version=LATEST - 1)
    refreshed_pre = pre.scan_files_df_from(MID, mid_snap.scan().scan_files_df())
    check(pre.scan().with_files_df(refreshed_pre).to_df(), (LATEST - 1) * ROWS_PER_COMMIT)

    # 5. at-timestamp (max) — ICT-aware where enabled
    ts_snap = t.snapshot(timestamp_ms=_max_effective_timestamp(t))
    assert ts_snap.version == LATEST
    check(ts_snap.to_df(), LATEST * ROWS_PER_COMMIT)

    # 6. CDF across the same log shapes (all-features sets enable it);
    # ranges must start at a still-present commit after cleanup
    if row_tracking:
        lo = 1 if log_state.cleanup_before is None else log_state.cleanup_before + 1
        cdc = t.changes(lo, LATEST)
        inserts = cdc.filter(F.col("_change_type") == "insert")
        assert inserts.count() == (LATEST - lo + 1) * ROWS_PER_COMMIT

        # 6b. the facade CDF read (readChangeFeed option, r9) must agree
        # with table_changes over the SAME log shape — cm modes, ICT,
        # checkpoints, and cleanup all crossed here for free
        from delta_kernel_rs_spark.sources.batch_source import (
            register_batch_source,
        )

        register_batch_source(spark)
        facade = (
            spark.read.format("delta_kernel")
            .option("path", t.path)
            .option("readChangeFeed", "true")
            .option("startingVersion", lo)
            .option("endingVersion", LATEST)
            .load()
        )
        fa = sorted(
            (r["id"], r["_change_type"], r["_commit_version"])
            for r in facade.select("id", "_change_type", "_commit_version").collect()
        )
        tb = sorted(
            (r["id"], r["_change_type"], r["_commit_version"])
            for r in cdc.select("id", "_change_type", "_commit_version").collect()
        )
        assert fa == tb


# --- DML phase over the same axes (reference write-suite crossings) ----------

def _dml_features(cm_mode: str | None) -> dict:
    if cm_mode is None:
        return {}
    f = _all_features(cm_mode)
    del f["delta.appendOnly"]  # DML needs removes
    return f


DML_CASES = [
    ("commits_only", None, 0),
    ("checkpoint_mid", "id", 1),
    ("checkpoint_at_end", "name", 2),
    ("checkpoint_mid_post_cleanup", "id", 4),
    ("crc_at_end", "name", 5),
    ("two_checkpoints_stale_hint", None, 7),
]


@pytest.mark.parametrize(
    "ls_name,cm_mode,layout_idx",
    DML_CASES,
    ids=[f"{ls}__cm_{cm or 'none'}__{LAYOUT_CONFIGS[i][0]}" for ls, cm, i in DML_CASES],
)
def test_cross_product_dml(spark, tmp_path, ls_name, cm_mode, layout_idx):
    """DML over sweep-built tables: DELETE, UPDATE, OPTIMIZE, CDF, and
    time travel keep the version/row-count contract across checkpoint
    states, column-mapping modes, and layouts."""
    log_state = LOG_STATES[ls_name]
    _, layout, cfg = LAYOUT_CONFIGS[layout_idx]
    props = {**_dml_features(cm_mode), **cfg}
    t = _build(spark, str(tmp_path / "t"), log_state, props, layout)

    v_del = t.delete("id < 20")
    assert t.to_df().count() == 80
    assert {r["id"] for r in t.to_df().select("id").collect()} == set(range(20, 100))

    t.update("id >= 95", {"s": "concat(s, '!')"})
    assert t.to_df().filter("s LIKE '%!'").count() == 5
    assert t.to_df().count() == 80

    if cm_mode is not None:  # row tracking enabled in the feature sets
        ids = [
            r["row_id"]
            for r in t.to_df(with_row_ids=True).select("row_id").collect()
        ]
        assert len(ids) == len(set(ids))

    # row tracking must be SUSPENDED for a layout rewrite (the spec's
    # escape hatch — maintenance without row-id preservation)
    if cm_mode is not None:
        t.set_properties({"delta.rowTrackingSuspended": "true"})
    t.optimize()
    assert t.to_df().count() == 80
    if cm_mode is not None:
        t.set_properties({"delta.rowTrackingSuspended": "false"})

    # CDF: the delete commit shows exactly the 20 removed rows
    if cm_mode is not None:  # CDF enabled in the feature sets
        cdc = t.changes(v_del, v_del)
        deletes = cdc.filter(F.col("_change_type") == "delete")
        assert {r["id"] for r in deletes.select("id").collect()} == set(range(20))

    # time travel: pre-delete snapshot still shows all 100 rows
    pre = t.snapshot(version=v_del - 1)
    assert pre.to_df().count() == 100


# --- Schema history (reference sweep TODO: add/drop/rename axis) --------------

@pytest.mark.parametrize("cm_mode", [None, "id", "name"])
def test_cross_product_schema_history(spark, tmp_path, cm_mode):
    """Mid-history schema evolution: every version target resolves with the
    schema THAT version had. ADD COLUMN for all modes; RENAME + DROP under
    column mapping (physical data survives logical renames)."""
    from pyspark.sql import types as T

    props = {"delta.columnMapping.mode": cm_mode} if cm_mode else {}
    t = DeltaTable.create(
        spark, str(tmp_path / "t"),
        schema=_df_for_commit(spark, 1).schema, properties=props,
    )
    for v in range(1, MID + 1):
        t.append(_df_for_commit(spark, v), auto_checkpoint=False)

    v_add = t.add_column("added", T.LongType())
    for v in range(MID + 1, LATEST):  # 4 more data commits
        t.append(
            _df_for_commit(spark, v).withColumn("added", F.col("id") * 2),
            auto_checkpoint=False,
        )
    t.checkpoint()

    latest = t.snapshot()
    assert "added" in latest.schema.fieldNames()
    df = latest.to_df()
    assert df.count() == (LATEST - 1) * ROWS_PER_COMMIT
    assert df.filter("added IS NOT NULL").count() == 4 * ROWS_PER_COMMIT
    assert df.filter("added = id * 2 OR added IS NULL").count() == df.count()

    # pre-evolution time travel: the column does not exist at MID
    mid = t.snapshot(version=MID)
    assert "added" not in mid.schema.fieldNames()
    assert mid.to_df().count() == MID * ROWS_PER_COMMIT

    if cm_mode:
        v_ren = t.rename_column("added", "added2")
        df2 = t.to_df()
        assert "added2" in df2.columns and "added" not in df2.columns
        # physical data survives the logical rename
        assert df2.filter("added2 IS NOT NULL").count() == 4 * ROWS_PER_COMMIT
        # pre-rename travel still shows the old name
        assert "added" in t.snapshot(version=v_ren - 1).schema.fieldNames()

        v_drop = t.drop_column("added2")
        assert "added2" not in t.to_df().columns
        assert t.to_df().count() == (LATEST - 1) * ROWS_PER_COMMIT
        # pre-drop travel still reads the dropped column's values
        pre = t.snapshot(version=v_drop - 1).to_df()
        assert pre.filter("added2 IS NOT NULL").count() == 4 * ROWS_PER_COMMIT
