"""Table-layout maintenance: OPTIMIZE (small-file compaction) and
deletion-vector purge (REORG ... APPLY (PURGE) semantics).

Both are pure file-layout rewrites: every remove+add carries
``dataChange: false``, so CDF readers and incremental consumers see no
change (our cdf.py classification filters on ``dataChange == true``,
matching the reference table_changes/log_replay.rs). The rewrite reads
ONLY the selected files through the same targeted-scan machinery DELETE
uses (`_candidate_df_with_lineage`), applying current DVs so hidden rows
are never resurrected.

Scale shape: selection is a driver pass over file *metadata* only; the
data rewrite is one distributed job whose output partition count is sized
from the selected bytes, so a 100 TB table compacts partition-by-partition
without ever shuffling untouched files.
"""

from __future__ import annotations

from delta_kernel_rs_spark.sources.delete import _candidate_df_with_lineage, _rel_path
from delta_kernel_rs_spark.sources.transaction import Transaction, _now_ms

DEFAULT_TARGET_FILE_SIZE = 256 << 20


class MaintenanceError(Exception):
    pass


def _check_supported(snap) -> None:
    if snap.metadata.configuration.get("delta.enableRowTracking", "false").lower() == "true":
        raise MaintenanceError(
            "OPTIMIZE/PURGE on a row-tracking table is not supported: a "
            "layout rewrite must preserve materialized row ids, which this "
            "engine does not implement yet"
        )


def _rewrite_files(table, snap, files, operation: str, target_bytes: int) -> int:
    """Rewrite ``files`` into ~target-sized files; dataChange=false."""
    scan = snap.scan()
    df, _ = _candidate_df_with_lineage(scan, files=files)
    kept = df.select(*[f.name for f in snap.schema.fields])
    total = sum(f.size or 0 for f in files)
    n_out = max(1, (total + target_bytes - 1) // target_bytes)
    pcols = snap.metadata.partition_columns
    if snap.clustering_columns():
        pass  # the transaction's clustered layout shuffle re-clusters
    elif pcols:
        from pyspark.sql import functions as F

        kept = kept.repartition(int(n_out), *[F.col(p) for p in pcols])
    else:
        kept = kept.repartition(int(n_out))
    removes = [
        {
            "remove": {
                "path": _rel_path(table.path, f.path),
                "deletionTimestamp": _now_ms(),
                "dataChange": False,
                "extendedFileMetadata": True,
                "partitionValues": f.partition_values,
                "size": f.size,
                "deletionVector": f.dv,
            }
        }
        for f in files
    ]
    txn = Transaction(table.spark, table.path, operation=operation, read_snapshot=snap)
    txn.data_change = False
    txn.write_data(kept)
    txn.add_actions(removes)
    return txn.commit()


def optimize(
    table,
    target_file_size: int = DEFAULT_TARGET_FILE_SIZE,
    small_file_threshold: int | None = None,
) -> int:
    """Bin-pack small files into ~``target_file_size`` outputs, per
    partition. Only partitions holding 2+ small files are rewritten; the
    rewrite also drops those files' deletion vectors (a compaction is a
    purge for the files it touches). Returns the committed version (the
    read version when nothing qualifies)."""
    snap = table.snapshot()
    _check_supported(snap)
    threshold = small_file_threshold if small_file_threshold is not None else target_file_size // 2
    files = snap.scan().files()
    by_part: dict[tuple, list] = {}
    for f in files:
        if (f.size or 0) < threshold or f.dv:
            key = tuple(sorted((f.partition_values or {}).items()))
            by_part.setdefault(key, []).append(f)
    selected = [f for group in by_part.values() if len(group) >= 2 for f in group]
    if not selected:
        return snap.version
    return _rewrite_files(table, snap, selected, "OPTIMIZE", target_file_size)


def purge_deletion_vectors(
    table, min_cardinality: int = 1, target_file_size: int = DEFAULT_TARGET_FILE_SIZE
) -> int:
    """Materialize deletion vectors: rewrite every file whose DV hides at
    least ``min_cardinality`` rows into a clean file with no DV
    (REORG TABLE ... APPLY (PURGE)). Returns the committed version."""
    snap = table.snapshot()
    _check_supported(snap)
    files = [
        f
        for f in snap.scan().files()
        if f.dv and (f.dv.get("cardinality") or 0) >= min_cardinality
    ]
    if not files:
        return snap.version
    return _rewrite_files(table, snap, files, "PURGE", target_file_size)
