"""Change Data Feed: change rows between two versions.

Mirrors the reference's table_changes module (kernel/src/table_changes/
mod.rs:1-170 — output columns ``_change_type``/``_commit_version``/
``_commit_timestamp`` :164-166; log_replay.rs — cdc actions supersede
add/remove within a commit; resolve_dvs.rs — DV add/remove sibling pairs
become row-level deltas; physical_to_logical.rs — column injection).

Arms per commit:
  * commits WITH cdc actions → read the cdc parquet files; they physically
    contain ``_change_type`` (insert/delete/update_preimage/update_postimage)
  * plain adds (dataChange)   → whole file as 'insert'
  * plain removes (dataChange)→ whole (still-present) file as 'delete'
  * DV swap (remove+add of the same path with different DVs) → row-level
    diff of the two bitmaps: newly-deleted row indexes → 'delete',
    restored indexes → 'insert'
"""

from __future__ import annotations

import json
import urllib.parse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_kernel_rs_spark.functions.dv import read_dv_row_indexes
from delta_kernel_rs_spark.functions.partition_codec import parse_partition_column
from delta_kernel_rs_spark.functions.schema_codec import physical_name
from delta_kernel_rs_spark.sources.scan import normalize_file_path
from delta_kernel_rs_spark.sources.snapshot import Snapshot
from delta_kernel_rs_spark.sources.storage import storage_for

CHANGE_TYPE_COL = "_change_type"
COMMIT_VERSION_COL = "_commit_version"
COMMIT_TIMESTAMP_COL = "_commit_timestamp"


class ChangeDataFeedError(Exception):
    pass


def _abs_path(table_path: str, rel: str) -> str:
    rel = urllib.parse.unquote(rel)
    if "://" in rel or rel.startswith("/"):
        return rel
    return f"{table_path.rstrip('/')}/{rel}"


def _physical_fields(snapshot) -> list[T.StructField]:
    pcols = set(snapshot.metadata.partition_columns)
    return [
        T.StructField(physical_name(f), f.dataType, True, f.metadata)
        for f in snapshot.schema.fields
        if f.name not in pcols
    ]


def table_changes(
    spark: SparkSession,
    table_path: str,
    start_version: int,
    end_version: int | None = None,
) -> DataFrame:
    """Change rows for versions in [start_version, end_version]."""
    table_path = table_path.rstrip("/")
    snapshot = Snapshot.create(spark, table_path, version=end_version)
    end_version = snapshot.version
    if start_version > end_version:
        raise ChangeDataFeedError(
            f"start {start_version} > end {end_version}"
        )
    if not snapshot.metadata.cdf_enabled:
        raise ChangeDataFeedError(
            "change data feed is not enabled (delta.enableChangeDataFeed)"
        )
    # CDF must have been enabled for the WHOLE range, not just at the end
    # snapshot (reference table_changes/mod.rs:90-162). Commits inside the
    # range that carry a metaData action are checked in the replay loop
    # below, but commits written while CDF was off carry no metaData at
    # all — so also resolve the table metadata AS OF start_version.
    if start_version < snapshot.version:
        start_snap = Snapshot.create(spark, table_path, version=start_version)
        if not start_snap.metadata.cdf_enabled:
            raise ChangeDataFeedError(
                f"change data feed was not enabled at version {start_version}; "
                "the requested range cannot be served"
            )
    storage = storage_for(spark, table_path)
    log_dir = f"{table_path}/_delta_log"

    pcols = snapshot.metadata.partition_columns
    phys_fields = _physical_fields(snapshot)

    def with_lineage(df: DataFrame) -> DataFrame:
        return df.withColumn(
            "__file_path", normalize_file_path(F.col("_metadata.file_path"))
        ).withColumn("__row_index", F.col("_metadata.row_index"))

    def join_constants(df: DataFrame, pv_by_path: dict[str, dict]) -> DataFrame:
        """Per-file partition values via one broadcast join (not per-file
        DataFrame arms — a commit adding thousands of files must stay one
        read with one plan node)."""
        consts = spark.createDataFrame(
            [(p, pv or {}) for p, pv in pv_by_path.items()],
            "__const_path STRING, __pv MAP<STRING,STRING>",
        )
        return df.join(
            F.broadcast(consts), df["__file_path"] == F.col("__const_path"), "left"
        )

    def logical_projection(df: DataFrame, change_type: str | None) -> DataFrame:
        cols = []
        for f in snapshot.schema.fields:
            if f.name in set(pcols):
                raw = F.col("__pv").getItem(physical_name(f))
                cols.append(parse_partition_column(raw, f.dataType).alias(f.name))
            else:
                cols.append(F.col(physical_name(f)).cast(f.dataType).alias(f.name))
        ct = F.lit(change_type) if change_type is not None else F.col(CHANGE_TYPE_COL)
        cols.append(ct.alias(CHANGE_TYPE_COL))
        return df.select(*cols)

    def idx_df(pairs: list[tuple[str, int]]) -> DataFrame:
        import pandas as pd

        pdf = pd.DataFrame(
            {"p": [p for p, _ in pairs], "ri": [ri for _, ri in pairs]}
        )
        return spark.createDataFrame(pdf, "p STRING, ri LONG")

    def idx_join(df: DataFrame, pairs: list[tuple[str, int]], how: str) -> DataFrame:
        idx = idx_df(pairs)
        return df.join(
            idx,
            (df["__file_path"] == idx["p"]) & (df["__row_index"] == idx["ri"]),
            how,
        )

    read_schema = T.StructType(phys_fields)
    arms: list[DataFrame] = []
    for v in range(start_version, end_version + 1):
        commit_path = f"{log_dir}/{v:020d}.json"
        try:
            commit_text = storage.read_text(commit_path)
        except OSError as exc:
            raise ChangeDataFeedError(
                f"commit {v} is missing from the log — the requested CDF "
                f"range [{start_version}, {end_version}] is unavailable "
                "(log retention may have expired it)"
            ) from exc
        adds, removes, cdcs = [], [], []
        ict = None
        for line in commit_text.splitlines():
            line = line.strip()
            if not line:
                continue
            try:
                action = json.loads(line)
            except ValueError:
                continue
            if "add" in action:
                adds.append(action["add"])
            elif "remove" in action:
                removes.append(action["remove"])
            elif "cdc" in action:
                cdcs.append(action["cdc"])
            elif "commitInfo" in action:
                ict = action["commitInfo"].get("inCommitTimestamp")
            elif "metaData" in action:
                # CDF must be enabled across the WHOLE range, not just at
                # the end snapshot (reference table_changes/mod.rs:90-162).
                conf = action["metaData"].get("configuration") or {}
                if conf.get("delta.enableChangeDataFeed", "false").lower() != "true":
                    raise ChangeDataFeedError(
                        f"change data feed was not enabled at version {v}; "
                        "the requested range cannot be served"
                    )
        ts_ms = ict if ict is not None else storage.stat(commit_path).last_modified_ms
        ts_col = F.timestamp_millis(F.lit(ts_ms))

        def stamp(df: DataFrame) -> DataFrame:
            return df.withColumn(COMMIT_VERSION_COL, F.lit(v).cast("long")).withColumn(
                COMMIT_TIMESTAMP_COL, ts_col
            )

        if cdcs:
            # cdc supersedes add/remove for this commit: ONE read over all
            # cdc files, partition values joined per file.
            cdc_schema = T.StructType(
                phys_fields + [T.StructField(CHANGE_TYPE_COL, T.StringType(), True)]
            )
            pv_by_path = {
                _abs_path(table_path, c["path"]): c.get("partitionValues") or {}
                for c in cdcs
            }
            df = with_lineage(
                spark.read.schema(cdc_schema).parquet(*pv_by_path.keys())
            )
            df = join_constants(df, pv_by_path)
            arms.append(stamp(logical_projection(df, None)))
            continue

        adds_by_path = {a["path"]: a for a in adds if a.get("dataChange")}
        removes_by_path = {r["path"]: r for r in removes if r.get("dataChange")}

        # Classify into whole-file arms + row-level DV work, then build at
        # most four reads for the entire commit regardless of file count.
        insert_paths: dict[str, dict] = {}  # abs path -> pv
        insert_excl: list[tuple[str, int]] = []  # DV'd rows hidden on add
        delete_paths: dict[str, dict] = {}
        delete_excl: list[tuple[str, int]] = []
        swap_deleted: list[tuple[str, int]] = []
        swap_restored: list[tuple[str, int]] = []
        swap_pv: dict[str, dict] = {}

        for path, add in adds_by_path.items():
            remove = removes_by_path.pop(path, None)
            abs_p = _abs_path(table_path, path)
            pv = add.get("partitionValues") or {}
            if remove is None:
                insert_paths[abs_p] = pv
                if add.get("deletionVector"):
                    insert_excl.extend(
                        (abs_p, ri)
                        for ri in read_dv_row_indexes(
                            storage, table_path, add["deletionVector"]
                        )
                    )
                continue
            # DV swap: same path removed+added → row-level diff
            old_dv = set(
                read_dv_row_indexes(storage, table_path, remove["deletionVector"])
                if remove.get("deletionVector")
                else []
            )
            new_dv = set(
                read_dv_row_indexes(storage, table_path, add["deletionVector"])
                if add.get("deletionVector")
                else []
            )
            swap_pv[abs_p] = pv
            swap_deleted.extend((abs_p, ri) for ri in sorted(new_dv - old_dv))
            swap_restored.extend((abs_p, ri) for ri in sorted(old_dv - new_dv))

        for path, remove in removes_by_path.items():
            abs_p = _abs_path(table_path, path)
            delete_paths[abs_p] = remove.get("partitionValues") or {}
            if remove.get("deletionVector"):
                delete_excl.extend(
                    (abs_p, ri)
                    for ri in read_dv_row_indexes(
                        storage, table_path, remove["deletionVector"]
                    )
                )

        if insert_paths:
            df = with_lineage(spark.read.schema(read_schema).parquet(*insert_paths))
            if insert_excl:
                df = idx_join(df, insert_excl, "left_anti")
            df = join_constants(df, insert_paths)
            arms.append(stamp(logical_projection(df, "insert")))
        if delete_paths:
            df = with_lineage(spark.read.schema(read_schema).parquet(*delete_paths))
            if delete_excl:
                df = idx_join(df, delete_excl, "left_anti")
            df = join_constants(df, delete_paths)
            arms.append(stamp(logical_projection(df, "delete")))
        if swap_deleted or swap_restored:
            swap_df = with_lineage(
                spark.read.schema(read_schema).parquet(*swap_pv)
            )
            swap_df = join_constants(swap_df, swap_pv)
            if swap_deleted:
                arms.append(
                    stamp(
                        logical_projection(
                            idx_join(swap_df, swap_deleted, "left_semi"), "delete"
                        )
                    )
                )
            if swap_restored:
                arms.append(
                    stamp(
                        logical_projection(
                            idx_join(swap_df, swap_restored, "left_semi"), "insert"
                        )
                    )
                )

    if not arms:
        fields = list(snapshot.schema.fields) + [
            T.StructField(CHANGE_TYPE_COL, T.StringType(), True),
            T.StructField(COMMIT_VERSION_COL, T.LongType(), True),
            T.StructField(COMMIT_TIMESTAMP_COL, T.TimestampType(), True),
        ]
        return spark.createDataFrame([], T.StructType(fields))
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out


def net_changes(changes: DataFrame, key_columns: list[str]) -> DataFrame:
    """Collapse a CDF range to the latest post-image per key (reference
    table_changes/net_changes.rs): the newest change wins; a final 'delete'
    removes the key. Output: key columns + the latest non-key values."""
    value_cols = [
        c
        for c in changes.columns
        if not c.startswith("_") and c not in set(key_columns)
    ]
    w = F.max_by(
        F.struct(CHANGE_TYPE_COL, *value_cols),
        F.struct(
            COMMIT_VERSION_COL,
            F.when(F.col(CHANGE_TYPE_COL) == "update_postimage", 1).otherwise(0),
        ),
    )
    latest = (
        changes.filter(F.col(CHANGE_TYPE_COL) != "update_preimage")
        .groupBy(*key_columns)
        .agg(w.alias("w"))
    )
    return (
        latest.filter(F.col(f"w.{CHANGE_TYPE_COL}") != "delete")
        .select(*key_columns, *[F.col(f"w.{c}").alias(c) for c in value_cols])
    )


def changes_by_row_tracking(
    spark: SparkSession,
    table_path: str,
    base_version: int,
    end_version: int | None = None,
) -> DataFrame:
    """Net change rows reconstructed from row lineage instead of cdc files
    (reference CdfMode by-row-tracking, table_changes/mod.rs:90-162).

    Requires row tracking: joins the base and end snapshots full-outer on
    the stable ``row_id``. A row id present only in the end snapshot is an
    insert; only in the base snapshot, a delete; present in both with
    different values, an update pre/post-image pair. Rows that appear and
    disappear entirely inside the range are invisible — this is the NET
    view, which is exactly what row-lineage CDF provides when no cdc files
    were written.
    """
    snapshot = Snapshot.create(spark, table_path, version=end_version)
    end_version = snapshot.version
    base = Snapshot.create(spark, table_path, version=base_version)
    data_cols = [f.name for f in snapshot.schema.fields]

    pre = base.to_df(with_row_ids=True).select(
        F.col("row_id"), F.struct(*data_cols).alias("pre")
    )
    post = snapshot.to_df(with_row_ids=True).select(
        F.col("row_id"), F.struct(*data_cols).alias("post")
    )
    joined = pre.join(post, "row_id", "full_outer")
    ct = (
        F.when(F.col("pre").isNull(), F.lit("insert"))
        .when(F.col("post").isNull(), F.lit("delete"))
        .when(~F.col("pre").eqNullSafe(F.col("post")), F.lit("update"))
    )
    changed = joined.withColumn("__ct", ct).filter(F.col("__ct").isNotNull())
    version_col = F.lit(end_version).cast("long")

    def arm(src: str, change: str, only: str) -> DataFrame:
        return (
            changed.filter(F.col("__ct") == only)
            .select(
                *[F.col(f"{src}.{c}").alias(c) for c in data_cols],
                F.lit(change).alias(CHANGE_TYPE_COL),
                version_col.alias(COMMIT_VERSION_COL),
            )
        )

    return (
        arm("post", "insert", "insert")
        .unionByName(arm("pre", "delete", "delete"))
        .unionByName(arm("pre", "update_preimage", "update"))
        .unionByName(arm("post", "update_postimage", "update"))
    )
