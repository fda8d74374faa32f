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
    storage = storage_for(spark, table_path)
    log_dir = f"{table_path}/_delta_log"

    pcols = snapshot.metadata.partition_columns
    phys_fields = _physical_fields(snapshot)
    ptypes = {f.name: f.dataType for f in snapshot.schema.fields}

    def logical_projection(df: DataFrame, pv: dict, change_type=None) -> DataFrame:
        cols = []
        for f in snapshot.schema.fields:
            if f.name in set(pcols):
                raw = F.lit(pv.get(f.name))
                cols.append(parse_partition_column(raw, f.dataType).alias(f.name))
            else:
                cols.append(F.col(physical_name(f)).cast(f.dataType).alias(f.name))
        ct = F.lit(change_type) if change_type is not None else F.col(CHANGE_TYPE_COL)
        cols.append(ct.alias(CHANGE_TYPE_COL))
        return df.select(*cols)

    arms: list[DataFrame] = []
    for v in range(start_version, end_version + 1):
        commit_path = f"{log_dir}/{v:020d}.json"
        adds, removes, cdcs = [], [], []
        ict = None
        for line in storage.read_text(commit_path).splitlines():
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
        ts_ms = ict if ict is not None else _mtime_ms(storage, commit_path)
        ts_col = F.timestamp_millis(F.lit(ts_ms))

        def stamp(df: DataFrame) -> DataFrame:
            return df.withColumn(COMMIT_VERSION_COL, F.lit(v).cast("long")).withColumn(
                COMMIT_TIMESTAMP_COL, ts_col
            )

        if cdcs:
            # cdc supersedes add/remove for this commit
            cdc_schema = T.StructType(
                phys_fields + [T.StructField(CHANGE_TYPE_COL, T.StringType(), True)]
            )
            for c in cdcs:
                df = spark.read.schema(cdc_schema).parquet(
                    _abs_path(table_path, c["path"])
                )
                arms.append(stamp(logical_projection(df, c.get("partitionValues") or {})))
            continue

        adds_by_path = {a["path"]: a for a in adds if a.get("dataChange")}
        removes_by_path = {r["path"]: r for r in removes if r.get("dataChange")}
        read_schema = T.StructType(phys_fields)

        for path, add in adds_by_path.items():
            remove = removes_by_path.pop(path, None)
            abs_p = _abs_path(table_path, path)
            if remove is None:
                if add.get("deletionVector"):
                    # add with DV but no sibling remove: live rows are inserts
                    dv_rows = read_dv_row_indexes(storage, table_path, add["deletionVector"])
                    df = _rows_excluding(spark, abs_p, read_schema, dv_rows)
                else:
                    df = spark.read.schema(read_schema).parquet(abs_p)
                arms.append(
                    stamp(
                        logical_projection(df, add.get("partitionValues") or {}, "insert")
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
            pv = add.get("partitionValues") or {}
            newly_deleted = sorted(new_dv - old_dv)
            restored = sorted(old_dv - new_dv)
            if newly_deleted:
                df = _rows_at(spark, abs_p, read_schema, newly_deleted)
                arms.append(stamp(logical_projection(df, pv, "delete")))
            if restored:
                df = _rows_at(spark, abs_p, read_schema, restored)
                arms.append(stamp(logical_projection(df, pv, "insert")))

        for path, remove in removes_by_path.items():
            abs_p = _abs_path(table_path, path)
            if remove.get("deletionVector"):
                dv_rows = read_dv_row_indexes(storage, table_path, remove["deletionVector"])
                df = _rows_excluding(spark, abs_p, read_schema, dv_rows)
            else:
                df = spark.read.schema(read_schema).parquet(abs_p)
            arms.append(
                stamp(
                    logical_projection(df, remove.get("partitionValues") or {}, "delete")
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
    removes the key."""
    w = F.max_by(
        F.struct(CHANGE_TYPE_COL, *[c for c in changes.columns if not c.startswith("_")]),
        F.struct(COMMIT_VERSION_COL, F.when(F.col(CHANGE_TYPE_COL) == "update_postimage", 1).otherwise(0)),
    )
    latest = (
        changes.filter(F.col(CHANGE_TYPE_COL) != "update_preimage")
        .groupBy(*key_columns)
        .agg(w.alias("w"))
    )
    return (
        latest.filter(F.col(f"w.{CHANGE_TYPE_COL}") != "delete")
        .select(*key_columns, "w.*")
        .drop(CHANGE_TYPE_COL)
    )


def _rows_at(spark, path: str, schema: T.StructType, row_indexes: list[int]) -> DataFrame:
    import pandas as pd

    idx = spark.createDataFrame(
        pd.DataFrame({"ri": row_indexes}), "ri LONG"
    )
    df = spark.read.schema(schema).parquet(path).withColumn(
        "__ri", F.col("_metadata.row_index")
    )
    return df.join(F.broadcast(idx), df["__ri"] == idx["ri"], "left_semi").drop("__ri")


def _rows_excluding(spark, path: str, schema: T.StructType, row_indexes: list[int]) -> DataFrame:
    import pandas as pd

    idx = spark.createDataFrame(pd.DataFrame({"ri": row_indexes}), "ri LONG")
    df = spark.read.schema(schema).parquet(path).withColumn(
        "__ri", F.col("_metadata.row_index")
    )
    return df.join(F.broadcast(idx), df["__ri"] == idx["ri"], "left_anti").drop("__ri")


def _mtime_ms(storage, path: str) -> int:
    import os

    local = path[len("file://") :] if path.startswith("file://") else path
    try:
        return int(os.stat(local).st_mtime * 1000)
    except OSError:
        return 0
