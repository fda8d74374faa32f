"""Driver-side full backfill under ``Trigger.AvailableNow``.

LIBRARY LIMITATION being worked around (pinned in
tests/test_streaming_cdf.py::test_available_now_with_rate_limit_is_one_
bounded_run): the Python ``DataSourceStreamReader`` API has no
``SupportsTriggerAvailableNow`` hook, so Spark captures ONE
``latestOffset()`` per AvailableNow run — a RATE-LIMITED stream
(``maxCommitsPerTrigger`` / ``maxFilesPerTrigger`` / ``maxBytesPerTrigger``)
processes exactly one bounded micro-batch per run instead of a full
backfill. JVM sources (delta-spark) solve this with
``SupportsTriggerAvailableNow``; until Spark grows the Python hook, this
helper loops bounded AvailableNow runs against ONE checkpoint until the
source's committed offset stops advancing, so one call == one full
backfill. Each run resumes exactly where the previous ended (the sources
keep a Spark-authoritative consumed floor; nothing is lost or
re-emitted), so the loop is a pure driver-side pacing shim — it changes
no data semantics.

If Spark ever adds the hook, the pinned caveat test breaks and this
helper reduces to a single run.
"""

from __future__ import annotations

from typing import Callable

__all__ = ["available_now_backfill"]


def _offset_state(checkpoint_location: str) -> tuple[int, str] | None:
    """(latest offset batch id, offset file content) for a streaming
    checkpoint, or None before the first planned batch.

    The offset WAL is the source of truth for "did the source advance":
    numInputRows can read 0 on a batch that only crossed empty commits
    (property changes, whole-file deletes outside the filter), so row
    counts cannot terminate the loop correctly — offsets can."""
    from delta_kernel_rs_spark.sources.storage import storage_for_uri

    storage = storage_for_uri(checkpoint_location)
    offsets_dir = f"{checkpoint_location.rstrip('/')}/offsets"
    try:
        entries = storage.list_dir(offsets_dir)
    except (FileNotFoundError, OSError):
        return None
    ids = []
    for e in entries:
        name = e.path.rsplit("/", 1)[-1]
        if name.isdigit():
            ids.append(int(name))
    if not ids:
        return None
    latest = max(ids)
    return latest, storage.read_text(f"{offsets_dir}/{latest}")


def available_now_backfill(
    spark,
    path: str,
    *,
    checkpoint_location: str,
    sink_format: str,
    sink_options: dict | None = None,
    source_format: str = "delta_cdf",
    source_options: dict | None = None,
    transform: Callable | None = None,
    max_runs: int = 1000,
    run_timeout_sec: int = 600,
) -> int:
    """Run bounded ``Trigger.AvailableNow`` passes against one checkpoint
    until the committed source offset stops advancing. Returns the number
    of runs it took, INCLUDING the final verification run that observed no
    offset movement (so an already-caught-up checkpoint returns 1, an
    unlimited source returns 2, a rate-limited N-batch backfill N+1).

    ``source_format`` is ``"delta_cdf"`` (the change feed) or
    ``"delta_kernel"`` (the append stream; pass
    ``{"readChangeFeed": "true"}`` in ``source_options`` for its CDF
    spelling). ``transform`` optionally reshapes the stream DataFrame
    before the sink (filter/projection — keep it deterministic, it
    re-applies every run). All other options ride through verbatim.
    """
    from delta_kernel_rs_spark.sources.batch_source import register_batch_source
    from delta_kernel_rs_spark.streaming.cdf_source import register_cdf_source

    register_cdf_source(spark)
    register_batch_source(spark)

    runs = 0
    before = _offset_state(checkpoint_location)
    while runs < max_runs:
        reader = spark.readStream.format(source_format).option("path", path)
        for k, v in (source_options or {}).items():
            reader = reader.option(k, v)
        df = reader.load()
        if transform is not None:
            df = transform(df)
        writer = (
            df.writeStream.format(sink_format)
            .option("checkpointLocation", checkpoint_location)
            .trigger(availableNow=True)
        )
        for k, v in (sink_options or {}).items():
            writer = writer.option(k, v)
        q = writer.start()
        if not q.awaitTermination(run_timeout_sec):
            q.stop()
            raise TimeoutError(
                f"availableNow run {runs + 1} did not terminate within "
                f"{run_timeout_sec}s"
            )
        runs += 1
        after = _offset_state(checkpoint_location)
        if after == before:
            return runs
        before = after
    raise RuntimeError(
        f"backfill did not converge within max_runs={max_runs}; the source "
        "offset is still advancing (writer racing the backfill?)"
    )
