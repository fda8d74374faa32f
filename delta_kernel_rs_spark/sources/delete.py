"""Row-level DELETE: copy-on-write rewrite or deletion-vector write.

Reference equivalents: remove+add file rewrite via
``Transaction.remove_files`` (kernel/src/transaction/update.rs) and DV
updates (``update_deletion_vectors``, DV writer kernel/src/actions/
deletion_vector_writer.rs).

Both paths start from a predicate-pruned scan: files whose stats prove they
cannot contain matching rows are never touched (that is the same skipping
rewrite that drives reads — plans/data_skipping.py).
"""

from __future__ import annotations

import urllib.parse

from pyspark.sql import functions as F

from delta_kernel_rs_spark.functions.dv import encode_treemap, write_dv_file
from delta_kernel_rs_spark.plans.expressions import Predicate
from delta_kernel_rs_spark.sources.scan import normalize_file_path
from delta_kernel_rs_spark.sources.transaction import Transaction, _now_ms

def _dv_protocol_upgrade(snapshot) -> dict | None:
    """Protocol action enabling deletionVectors, or None if already enabled.

    Merges the feature into the snapshot's existing protocol instead of
    replacing it (clobbering would strip features like changeDataFeed /
    columnMapping from upgraded tables); emitted only when an upgrade is
    actually needed (reference ensure_deletion_vectors_enabled).
    """
    p = snapshot.protocol
    readers = set(p.reader_features or [])
    writers = set(p.writer_features or [])
    if (
        p.min_reader_version >= 3
        and p.min_writer_version >= 7
        and "deletionVectors" in readers
        and "deletionVectors" in writers
    ):
        return None
    return {
        "protocol": {
            "minReaderVersion": max(3, p.min_reader_version),
            "minWriterVersion": max(7, p.min_writer_version),
            "readerFeatures": sorted(readers | {"deletionVectors"}),
            "writerFeatures": sorted(writers | {"deletionVectors"}),
        }
    }


def _pred_to_column(predicate):
    if isinstance(predicate, Predicate):
        return predicate.to_spark()
    if isinstance(predicate, str):
        return F.expr(predicate)
    return predicate


def _typed_predicate(predicate, schema=None):
    """Typed AST for file pruning: Predicate as-is; strings through the SQL
    parser (None outside the grammar — every candidate file is then read,
    which is safe, just unpruned)."""
    if isinstance(predicate, Predicate):
        return predicate
    if isinstance(predicate, str):
        from delta_kernel_rs_spark.plans.sql_parser import try_parse_sql_predicate

        return try_parse_sql_predicate(predicate, schema)
    return None


def _rel_path(table_path: str, abs_path: str) -> str:
    """Log path string for a file action: table-relative when the file
    lives under the table root; the absolute form otherwise (shallow-clone
    adds reference foreign roots — a remove must spell the path EXACTLY
    like the add it cancels, or replay never pairs them)."""
    root = table_path.rstrip("/") + "/"
    if not abs_path.startswith(root):
        return "/".join(urllib.parse.quote(seg) for seg in abs_path.split("/"))
    rel = abs_path[len(root):]
    return "/".join(urllib.parse.quote(seg) for seg in rel.split("/"))


def _candidate_df_with_lineage(scan, files=None):
    """Scan DataFrame that keeps ``__file_path``/``__row_index`` visible.

    ``files`` narrows the read to an explicit subset (the rewrite phase
    passes the matched files so the second pass reads ONLY them — a
    filter on the derived ``__file_path`` column could not prune files,
    Catalyst doesn't push ``_metadata``-derived predicates to the scan).

    Rows already hidden by a file's deletion vector are excluded up front:
    a rewrite or DV update must never resurrect them (reference keys replay
    by FileActionKey(path, dv_unique_id) — log_replay/mod.rs:32 — so the
    live rows are always "file minus current DV").
    """
    snapshot = scan.snapshot
    spark = snapshot.spark
    if files is None:
        files = scan.files()
    if not files:
        return None, files
    df = spark.read.schema(scan._physical_read_schema()).parquet(
        *[f.path for f in files]
    )
    df = df.withColumn("__file_path", normalize_file_path(F.col("_metadata.file_path")))
    df = df.withColumn("__row_index", F.col("_metadata.row_index"))
    if any(f.dv for f in files):
        from delta_kernel_rs_spark.functions.dv import deleted_rows_df

        deleted = deleted_rows_df(spark, files, snapshot.table_path)
        df = df.join(
            deleted,
            (df["__file_path"] == deleted["dv_file_path"])
            & (df["__row_index"] == deleted["dv_row_index"]),
            "left_anti",
        )
    from delta_kernel_rs_spark.functions.schema_codec import physical_name as _pn

    pcols = snapshot.metadata.partition_columns
    if pcols:
        from delta_kernel_rs_spark.functions.partition_codec import parse_partition_column
        from delta_kernel_rs_spark.sources.scan import file_constants_df

        df = df.join(
            F.broadcast(file_constants_df(spark, files)),
            df["__file_path"] == F.col("__const_path"),
            "left",
        )
        fields = {f.name: f for f in snapshot.schema.fields}
        for p in pcols:
            df = df.withColumn(
                p,
                parse_partition_column(
                    F.col("__pv").getItem(_pn(fields[p])), fields[p].dataType
                ),
            )
        df = df.drop("__const_path", "__pv")
    # Present logical column names to the predicate/caller (data columns
    # were read under their physical parquet names).
    proj = [
        F.col(_pn(f)).alias(f.name) if f.name not in set(pcols) else F.col(f.name)
        for f in snapshot.schema.fields
    ]
    df = df.select(*proj, "__file_path", "__row_index")
    return df, files


def delete_where(table, predicate) -> int:
    """Copy-on-write delete; returns the committed version."""
    snap = table.snapshot()
    scan = snap.scan(predicate=_typed_predicate(predicate, snap.schema))
    df, files = _candidate_df_with_lineage(scan)
    pred_col = _pred_to_column(predicate)
    if df is None:
        return snap.version  # nothing can match — no-op

    matched_paths = {
        r.p for r in df.filter(pred_col).select(F.col("__file_path").alias("p")).distinct().collect()
    }
    if not matched_paths:
        return snap.version

    # Rewrite phase reads ONLY the matched files — a second targeted scan,
    # not a __file_path filter over the full candidate set (which Catalyst
    # cannot use for file pruning).
    touched_df, _ = _candidate_df_with_lineage(
        scan, files=[f for f in files if f.path in matched_paths]
    )
    kept = touched_df.filter(~pred_col.eqNullSafe(F.lit(True))).select(
        *[f.name for f in snap.schema.fields]
    )
    cdc_actions: list[dict] = []
    if snap.metadata.cdf_enabled:
        # A rewrite commit would surface kept rows as spurious CDF
        # insert/delete pairs; when CDF is on, the deleted rows must be
        # recorded as cdc files, which supersede add/remove in the reader
        # (reference table_changes/log_replay.rs — cdc wins).
        deleted_rows = touched_df.filter(pred_col).select(
            *[f.name for f in snap.schema.fields]
        )
        cdc_actions = _write_cdc_files(table, deleted_rows, snap, "delete")
    file_info = {f.path: f for f in files}
    removes = []
    for p in sorted(matched_paths):
        info = file_info[p]
        removes.append(
            {
                "remove": {
                    "path": _rel_path(table.path, p),
                    "deletionTimestamp": _now_ms(),
                    "dataChange": True,
                    "extendedFileMetadata": True,
                    "partitionValues": info.partition_values,
                    "size": info.size,
                    # Replay keys are (path, dv_unique_id): the remove must
                    # carry the file's current DV or it never cancels the
                    # live add (reference log_replay/mod.rs:32).
                    "deletionVector": info.dv,
                }
            }
        )
    txn = Transaction(table.spark, table.path, operation="DELETE", read_snapshot=snap)
    txn.write_data(kept)
    txn.add_actions(removes + cdc_actions)
    return txn.commit()


def _write_cdc_files(table, rows_df, snap, change_type: str) -> list[dict]:
    """Write change rows under ``_change_data/`` and return cdc actions."""
    import uuid

    from delta_kernel_rs_spark.functions.schema_codec import physical_name

    pcols = snap.metadata.partition_columns
    fields = {f.name: f for f in snap.schema.fields}
    phys_parts = [physical_name(fields[p]) for p in pcols]
    phys_cols = [
        F.col(f.name).alias(physical_name(f))
        for f in snap.schema.fields
        if f.name not in set(pcols)
    ]
    out = rows_df.select(
        *[F.col(p).alias(physical_name(fields[p])) for p in pcols],
        *phys_cols,
        F.lit(change_type).alias("_change_type"),
    )
    staging = f"{table.path}/.cdc-staging-{uuid.uuid4().hex}"
    writer = out.write.mode("overwrite")
    if pcols:
        writer = writer.partitionBy(*phys_parts)
    writer.parquet(staging)
    from delta_kernel_rs_spark.functions.partition_codec import parse_hive_partition_path
    from delta_kernel_rs_spark.sources.transaction import _cleanup_dir

    import pyarrow.fs as pafs
    import pyarrow.parquet as pq

    actions = []
    for entry in table.storage.list_recursive(staging):
        if not entry.path.endswith(".parquet"):
            continue
        uri = entry.path if "://" in entry.path else f"file://{entry.path}"
        fs, fs_rel = pafs.FileSystem.from_uri(uri)
        if pq.read_metadata(fs_rel, filesystem=fs).num_rows == 0:
            continue  # schema-only part file — no change rows to publish
        rel = entry.path[len(staging.rstrip("/")) + 1 :]
        final_rel = f"_change_data/{rel}"
        table.storage.rename(entry.path, f"{table.path}/{final_rel}")
        dirpart = rel.rsplit("/", 1)[0] if "/" in rel else ""
        raw_pv = parse_hive_partition_path(dirpart) if dirpart else {}
        actions.append(
            {
                "cdc": {
                    "path": _rel_path(table.path, f"{table.path}/{final_rel}"),
                    "partitionValues": {k: raw_pv.get(k) for k in phys_parts},
                    "size": entry.size,
                    "dataChange": False,
                }
            }
        )
    _cleanup_dir(table.storage, staging)
    return actions


def delete_with_dvs(table, predicate) -> int:
    """DV-based delete: no data rewrite — write roaring bitmaps and swap
    the ``add`` entries to carry DV descriptors."""
    snap = table.snapshot()
    from delta_kernel_rs_spark.functions.iceberg_compat import (
        IcebergCompatError,
        enabled_versions,
    )

    if 2 in enabled_versions(snap.metadata.configuration):
        # icebergCompatV2 forbids DVs (reference mod.rs:430-438) — use
        # the copy-on-write delete; V3 permits them per its RFC
        raise IcebergCompatError(
            "deletion vectors are forbidden on icebergCompatV2 tables; "
            "use the copy-on-write delete"
        )
    scan = snap.scan(predicate=_typed_predicate(predicate, snap.schema))
    df, files = _candidate_df_with_lineage(scan)
    if df is None:
        return snap.version
    pred_col = _pred_to_column(predicate)

    hit_rows = (
        df.filter(pred_col)
        .groupBy("__file_path")
        .agg(F.sort_array(F.collect_list("__row_index")).alias("rows"))
        .collect()
    )
    if not hit_rows:
        return snap.version

    from delta_kernel_rs_spark.functions.dv import read_dv_row_indexes

    file_info = {f.path: f for f in files}
    scan_rows = {
        r.file_path: r
        for r in scan.scan_files_df().collect()
        if r.file_path in {h["__file_path"] for h in hit_rows}
    }

    blobs, descriptors = [], []
    for h in hit_rows:
        info = file_info[h["__file_path"]]
        indexes = set(h["rows"])
        if info.dv:  # merge with the file's existing DV
            indexes.update(read_dv_row_indexes(table.storage, table.path, info.dv))
        blobs.append(encode_treemap(sorted(indexes)))
        descriptors.append((h["__file_path"], len(indexes)))

    uuid_enc, spans = write_dv_file(table.storage, table.path, blobs)

    upgrade = _dv_protocol_upgrade(snap)
    actions = [upgrade] if upgrade else []
    for (abs_path, cardinality), (offset, size) in zip(descriptors, spans):
        info = file_info[abs_path]
        row = scan_rows[abs_path]
        rel = _rel_path(table.path, abs_path)
        old_dv = info.dv if info.dv else None
        actions.append(
            {
                "remove": {
                    "path": rel,
                    "deletionTimestamp": _now_ms(),
                    "dataChange": True,
                    "extendedFileMetadata": True,
                    "partitionValues": info.partition_values,
                    "size": info.size,
                    "deletionVector": old_dv,
                }
            }
        )
        actions.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": info.partition_values,
                    "size": info.size,
                    "modificationTime": row.modification_time,
                    "dataChange": True,
                    "stats": row.stats,
                    # Preserve row-tracking lineage across the DV swap.
                    "baseRowId": info.base_row_id,
                    "defaultRowCommitVersion": info.default_row_commit_version,
                    "deletionVector": {
                        "storageType": "u",
                        "pathOrInlineDv": uuid_enc,
                        "offset": offset,
                        "sizeInBytes": size,
                        "cardinality": cardinality,
                    },
                }
            }
        )
    txn = Transaction(table.spark, table.path, operation="DELETE", read_snapshot=snap)
    txn.add_actions(actions)
    return txn.commit()
