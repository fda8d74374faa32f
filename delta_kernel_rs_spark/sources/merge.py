"""UPSERT (merge-by-key): copy-on-write update + insert in one commit.

The reference exposes the building blocks (remove+add rewrite via
``Transaction`` staging — kernel/src/transaction/update.rs — and cdc
emission for CDF); this composes them into the user-facing operation:

    upsert(table, source_df, keys)

* target rows in files containing a matching key are rewritten: matched
  rows take the source's values (update), unmatched rows pass through;
* source rows whose key exists nowhere in the target are inserted;
* untouched files are left in place (pruned exactly like DELETE);
* with CDF enabled, cdc files record update_preimage / update_postimage /
  insert rows so the change feed shows row-level semantics instead of
  file-level rewrite noise.

Source keys must be unique (the classic multiple-matches MERGE error).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from delta_kernel_rs_spark.sources.delete import (
    _candidate_df_with_lineage,
    _rel_path,
    _write_cdc_files,
)
from delta_kernel_rs_spark.sources.transaction import Transaction, _now_ms


class MergeError(Exception):
    pass


def upsert(table, source_df: DataFrame, keys: list[str]) -> int:
    """Merge ``source_df`` into the table by ``keys``; returns the version."""
    snap = table.snapshot()
    cols = [f.name for f in snap.schema.fields]
    missing = [c for c in cols if c not in source_df.columns]
    if missing:
        raise MergeError(f"source is missing table columns {missing}")
    src = source_df.select(*cols)

    dup = src.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).collect()
    if dup:
        raise MergeError(
            f"source has multiple rows for key {tuple(dup[0][k] for k in keys)}; "
            "merge keys must be unique in the source"
        )

    scan = snap.scan()
    df, files = _candidate_df_with_lineage(scan)

    if df is None:  # empty table: pure insert
        txn = Transaction(table.spark, table.path, operation="MERGE", read_snapshot=snap)
        txn.write_data(src)
        return txn.commit()

    key_cols = [F.col(k) for k in keys]
    src_keys = src.select(*key_cols).distinct()
    matched_paths = {
        r.p
        for r in df.join(src_keys, keys, "left_semi")
        .select(F.col("__file_path").alias("p"))
        .distinct()
        .collect()
    }

    # Rows being inserted: source keys present nowhere in the target.
    inserts = src.join(df.select(*key_cols).distinct(), keys, "left_anti")

    if not matched_paths and inserts.isEmpty():
        return snap.version  # nothing to update, nothing to insert

    cdc_actions: list[dict] = []
    removes: list[dict] = []
    if matched_paths:
        # Second, targeted read of only the matched files (a __file_path
        # filter over the full scan cannot prune files in Catalyst).
        touched, _ = _candidate_df_with_lineage(
            scan, files=[f for f in files if f.path in matched_paths]
        )
        s_cols = [F.col(f"s.{c}").alias(f"__s_{c}") for c in cols]
        joined = touched.alias("t").join(
            src.alias("s"), [F.col(f"t.{k}") == F.col(f"s.{k}") for k in keys], "left"
        )
        is_matched = F.col(f"__s_{keys[0]}").isNotNull()
        staged = joined.select(*[F.col(f"t.{c}").alias(c) for c in cols], *s_cols)
        rewritten = staged.select(
            *[
                F.when(is_matched, F.col(f"__s_{c}")).otherwise(F.col(c)).alias(c)
                for c in cols
            ]
        )
        out = rewritten.unionByName(inserts)

        if snap.metadata.cdf_enabled:
            pre = staged.filter(is_matched).select(*cols)
            post = staged.filter(is_matched).select(
                *[F.col(f"__s_{c}").alias(c) for c in cols]
            )
            cdc_actions += _write_cdc_files(table, pre, snap, "update_preimage")
            cdc_actions += _write_cdc_files(table, post, snap, "update_postimage")
            cdc_actions += _write_cdc_files(table, inserts, snap, "insert")

        file_info = {f.path: f for f in files}
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
                        "deletionVector": info.dv,
                    }
                }
            )
    else:
        out = inserts
        if snap.metadata.cdf_enabled:
            cdc_actions += _write_cdc_files(table, inserts, snap, "insert")

    txn = Transaction(table.spark, table.path, operation="MERGE", read_snapshot=snap)
    txn.write_data(out)
    txn.add_actions(removes + cdc_actions)
    version = txn.commit()
    table.maybe_write_crc(version)
    return version
