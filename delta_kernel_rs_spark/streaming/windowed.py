"""Watermarked event-time windowed aggregation for streaming ingestion.

The streaming twin of the batch tumbling aggregate (queries/analytics.py
q11): ``readStream`` → event-time watermark → tumbling-window groupBy.
In append output mode a window only emits once the watermark passes its
end — i.e. when it can never change again — and rows later than the
watermark are dropped, which is exactly the bounded-state contract a
100 TB ingest needs: state per open window, not per event, and the
watermark is what lets Spark finalize + evict windows.

Reference scope note: the reference kernel streams table CHANGES (our
sources/incremental.py + streaming sources) and leaves aggregation to
the engine; here Spark IS the engine, so the windowed aggregate is the
Structured Streaming operator itself, configured for the late-data
semantics the pipeline brief requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_event_counts(
    sdf: DataFrame,
    ts_col: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    keys: "list[str] | None" = None,
    value_col: "str | Column | None" = None,
) -> DataFrame:
    """Tumbling-window counts (+ optional exact value sum) with a
    late-data watermark.

    Output columns: ``window_start``/``window_end`` (epoch seconds, so
    sinks and oracles agree engine-independently), the ``keys``,
    ``n_events``, and ``sum_value`` when ``value_col`` is given (integer-
    scaled exact sum — the same order-independent construction the batch
    oracle suite uses).

    Scale: one shuffle on (window, keys); partial aggregation map-side;
    state bounded by open windows × keys and evicted at the watermark.
    """
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        v = F.col(value_col) if isinstance(value_col, str) else value_col
        cents = F.round(v * F.lit(100.0), 0).cast("long")
        aggs.append(
            (F.sum(cents) / F.lit(100.0)).cast("double").alias("sum_value")
        )
    grouped = (
        sdf.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window), *(keys or []))
        .agg(*aggs)
    )
    return grouped.select(
        F.unix_timestamp(F.col("window.start")).alias("window_start"),
        F.unix_timestamp(F.col("window.end")).alias("window_end"),
        *(keys or []),
        *[c for c in ("n_events", "sum_value") if c in grouped.columns],
    )
