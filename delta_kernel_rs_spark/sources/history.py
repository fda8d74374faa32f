"""Timestamp-based time travel (reference kernel/src/history_manager/ —
``latest_version_as_of`` :531, ``first_version_after`` :572,
``timestamp_range_to_versions`` :632; binary search history_manager/search.rs).

Commit timestamps default to log-file modification times; when a commit's
``commitInfo`` carries ``inCommitTimestamp`` (ICT feature) it wins — ICT is
monotonic by construction, mtimes are made monotonic by clamping
(the same adjustment Delta's history manager applies).
"""

from __future__ import annotations

import bisect
import json

from delta_kernel_rs_spark.sources.log_segment import build_log_segment
from delta_kernel_rs_spark.sources.storage import storage_for


def _commit_timestamps(spark, table_path: str) -> list[tuple[int, int]]:
    """Ascending [(version, effective_ts_ms)] for every commit in the log."""
    storage = storage_for(spark, table_path)
    segment = build_log_segment(storage, table_path)
    out: list[tuple[int, int]] = []
    log_dir = segment.log_dir
    for v in segment.all_commit_versions:
        ts = segment.commit_timestamps.get(v, 0)
        path = f"{log_dir}/{v:020d}.json"
        try:
            first = storage.read_text(path).split("\n", 1)[0]
            action = json.loads(first)
            ict = (action.get("commitInfo") or {}).get("inCommitTimestamp")
            if ict is not None:
                ts = ict
        except (ValueError, OSError):
            pass
        out.append((v, ts))
    # clamp to monotonic
    for i in range(1, len(out)):
        if out[i][1] < out[i - 1][1]:
            out[i] = (out[i][0], out[i - 1][1])
    return out


def version_at_timestamp(spark, table_path: str, timestamp_ms: int) -> int:
    """Latest version committed at or before ``timestamp_ms``
    (reference ``latest_version_as_of``)."""
    commits = _commit_timestamps(spark, table_path)
    ts_list = [t for _, t in commits]
    idx = bisect.bisect_right(ts_list, timestamp_ms) - 1
    if idx < 0:
        raise ValueError(
            f"no commit at or before timestamp {timestamp_ms} for {table_path}"
        )
    return commits[idx][0]


def first_version_after(spark, table_path: str, timestamp_ms: int) -> int:
    """Earliest version committed at or after ``timestamp_ms``."""
    commits = _commit_timestamps(spark, table_path)
    ts_list = [t for _, t in commits]
    idx = bisect.bisect_left(ts_list, timestamp_ms)
    if idx >= len(commits):
        raise ValueError(f"no commit at or after timestamp {timestamp_ms}")
    return commits[idx][0]


def timestamp_range_to_versions(
    spark, table_path: str, start_ms: int, end_ms: int
) -> tuple[int, int]:
    """Version range covering [start_ms, end_ms] (reference :632)."""
    return (
        first_version_after(spark, table_path, start_ms),
        version_at_timestamp(spark, table_path, end_ms),
    )
