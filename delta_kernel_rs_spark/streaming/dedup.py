"""Streaming deduplication: cross-micro-batch stateful operators.

A streaming ingest pipeline (e.g. ``readStream.format("delta_kernel")``
tailing a table's appends) needs dedup that remembers keys across
micro-batches. Two tiers:

- :func:`streaming_first_seen` — built-in path. ``dropDuplicates`` on the
  key columns: Spark's own streaming dedup state store, exactly the JVM
  operator, no Python crossing. State grows with distinct keys; pass
  ``within_watermark`` (+ an event-time watermark on the input) to bound
  it when the dedup window is time-limited.

- :func:`dedup_ordinals` — custom stateful path via
  ``applyInPandasWithState`` (Arrow-batched, one Python crossing per
  group-batch). Emits EVERY row tagged with ``dup_ordinal`` — how many
  rows with the same key were seen before it (0 = first occurrence ever).
  Built-in streaming dedup cannot express this: it can only drop, not
  tag, and an ``update``-mode count aggregate loses the row payload.
  Downstream, ``dup_ordinal = 0`` selects survivors while ``> 0`` routes
  duplicates to a quarantine sink with their ordinal for audit.

Scale posture: state is per-key (the state store shards by the groupBy
key across executors); per micro-batch each key's rows move once through
an Arrow batch. The ordinal assignment within a single micro-batch
follows the Arrow batch order — deterministic for a given plan, but as
with any streaming tie, two same-key rows in ONE batch have no inherent
order; callers needing a total order sort by an event column downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_first_seen(
    sdf: DataFrame, keys: list[str], within_watermark: bool = False
) -> DataFrame:
    """First occurrence per key, cross-batch (built-in state store).

    ``within_watermark=True`` uses ``dropDuplicatesWithinWatermark`` so
    state for keys older than the input's watermark is evicted — required
    for unbounded streams where the dedup guarantee is time-windowed.
    """
    if within_watermark:
        return sdf.dropDuplicatesWithinWatermark(keys)
    return sdf.dropDuplicates(keys)


#: State: one long — rows with this key seen in earlier batches.
_STATE_SCHEMA = T.StructType([T.StructField("n_seen", T.LongType())])


def dedup_ordinals(sdf: DataFrame, key: str = "text_md5") -> DataFrame:
    """Tag every streamed row with its per-key duplicate ordinal.

    Output = input columns + ``dup_ordinal`` (long): 0 for the first row
    ever seen with this key, 1 for the next, ... persisting across
    micro-batches and across restarts (state checkpointed with the query).
    """
    out_schema = T.StructType(
        list(sdf.schema.fields) + [T.StructField("dup_ordinal", T.LongType())]
    )

    def tag(key_tuple, pdfs, state: GroupState):
        (n_seen,) = state.get if state.exists else (0,)
        for pdf in pdfs:
            pdf = pdf.copy()
            pdf["dup_ordinal"] = range(n_seen, n_seen + len(pdf))
            n_seen += len(pdf)
            yield pdf
        state.update((n_seen,))

    return sdf.groupBy(key).applyInPandasWithState(
        tag,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
