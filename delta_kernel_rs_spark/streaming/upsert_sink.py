"""Streaming MERGE (upsert) sink: the canonical Delta pattern for keyed
streams — ``foreachBatch`` + idempotent transactions.

Every micro-batch merges into the target by key. Exactly-once comes from
the Delta protocol's set-transaction actions (reference
``kernel/src/actions/set_transaction.rs``): each batch commit carries a
``txn`` action ``(appId=query name, version=batchId)``, and a replayed
batch — Spark re-delivers the last batch after a restart from the
checkpoint — sees ``latest_txn_version >= batchId`` and no-ops before
planning a single job. This is the same idempotence contract the batch
``append_with_txn`` path uses, applied to MERGE.

Scale shape: each micro-batch is one targeted merge — matched-file
discovery + rewrite of only those files (sources/merge.py), so per-trigger
cost is O(touched files), not table size. State lives in the Delta log
(txn actions) and Spark's own checkpoint; the sink itself is stateless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_upsert(
    sdf: DataFrame,
    table_path: str,
    keys: list[str],
    checkpoint_dir: str,
    app_id: str | None = None,
    committer=None,
    **start_options,
):
    """Start a streaming query that upserts each micro-batch by ``keys``.

    ``sdf`` must be a streaming DataFrame containing every target column.
    ``app_id`` defaults to a stable id derived from the checkpoint
    location (restarts resume the same txn ledger). Returns the
    StreamingQuery.
    """
    from delta_kernel_rs_spark.sources.merge import upsert
    from delta_kernel_rs_spark.sources.table import DeltaTable

    if not sdf.isStreaming:
        raise ValueError("streaming_upsert needs a streaming DataFrame")
    txn_app = app_id or f"streaming_upsert:{checkpoint_dir.rstrip('/')}"

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        t = DeltaTable(batch_df.sparkSession, table_path, committer=committer)
        upsert(t, batch_df, keys, txn_app_id=txn_app, txn_version=batch_id)

    return (
        sdf.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
        .start(**start_options)
    )
