"""Timestamp-based time travel (reference kernel/src/history_manager/ —
``latest_version_as_of`` :531, ``first_version_after`` :572,
``timestamp_range_to_versions`` :632; binary search history_manager/search.rs,
region strategy history_manager/mod.rs:71-100).

Commit timestamps default to log-file modification times — already in hand
from the one directory listing, zero commit reads. When the table uses
in-commit timestamps (ICT feature) the search reads the first line of
O(log n) probed commits instead of indexing the whole log: ICT is monotonic
by construction, so a plain binary search over the probe function is exact.
Tables without ICT pay exactly ONE commit read (the newest commit, to learn
ICT is absent) and search the in-memory clamped-mtime list.

Mid-history ICT enablement splits the log into two independently-monotonic
regions — clamped mtimes below the enablement boundary, ICT at and above it.
The combined sequence is NOT guaranteed monotonic (the first ICT is wall
clock, not clamped to the preceding mtime), so each region is searched
separately and the ICT region wins ties, exactly the reference's strategy
(history_manager/mod.rs:71-100). The boundary itself is found with O(log n)
probes — zero extra probes for the common ICT-since-creation case.
"""

from __future__ import annotations

import bisect
import json

from delta_kernel_rs_spark.sources.log_segment import build_log_segment
from delta_kernel_rs_spark.sources.storage import storage_for


class _TimestampIndex:
    """Lazy (version → effective timestamp) over the commit list.

    Effective timestamp = the commit's ``inCommitTimestamp`` when present,
    else its clamped-monotonic file mtime. Probes read at most one commit
    each and are cached, so a binary search costs O(log n) reads
    (reference history_manager/search.rs).
    """

    def __init__(self, storage, log_dir: str, versions: list[int], mtimes: dict[int, int]):
        self.storage = storage
        self.log_dir = log_dir
        self.versions = versions
        # clamp mtimes to monotonic in memory (same adjustment Delta's
        # history manager applies); listing already paid for these.
        clamped: list[int] = []
        for v in versions:
            t = mtimes.get(v, 0)
            if clamped and t < clamped[-1]:
                t = clamped[-1]
            clamped.append(t)
        self.mtimes = clamped
        self._ict_cache: dict[int, int | None] = {}
        self._boundary: int | None = None
        # ONE read: the newest commit decides whether ICT probing is needed
        # at all. A table that never enabled ICT stays mtime-indexed with no
        # further reads; once ICT is enabled it stays enabled, so the newest
        # commit carrying no ICT implies the whole log carries none.
        self._has_ict = versions and self._read_ict(versions[-1]) is not None

    def _read_ict(self, version: int) -> int | None:
        if version in self._ict_cache:
            return self._ict_cache[version]
        path = f"{self.log_dir}/{version:020d}.json"
        ict: int | None = None
        try:
            first = self.storage.read_text(path).split("\n", 1)[0]
            ict = (json.loads(first).get("commitInfo") or {}).get("inCommitTimestamp")
        except (ValueError, OSError):
            ict = None
        self._ict_cache[version] = ict
        return ict

    def ts(self, i: int) -> int:
        """Effective timestamp of ``versions[i]``."""
        if self._has_ict:
            ict = self._read_ict(self.versions[i])
            if ict is not None:
                return ict
        return self.mtimes[i]

    def _full_effective_index(self) -> list[int]:
        """Exact fallback for the pathological ICT disable/re-enable log:
        read every commit once, clamp the mixed ICT/mtime sequence to
        monotonic (the same adjustment Delta applies to mtimes), and
        bisect that. O(n) reads, but only ever paid when a probe actually
        hits a gap — spec-following tables never take this path."""
        if getattr(self, "_full_index", None) is None:
            vals: list[int] = []
            for i, v in enumerate(self.versions):
                ict = self._read_ict(v)
                t = ict if ict is not None else self.mtimes[i]
                if vals and t < vals[-1]:
                    t = vals[-1]
                vals.append(t)
            self._full_index = vals
        return self._full_index

    def _ict_boundary(self) -> int:
        """Index of the first commit carrying ICT. Presence is monotonic
        over versions (once enabled, stays enabled), so the boundary binary-
        searches in O(log n) probes; the common ICT-since-creation case is
        settled by ONE probe of the oldest commit."""
        if self._boundary is None:
            if self._read_ict(self.versions[0]) is not None:
                self._boundary = 0
            else:
                lo, hi = 0, len(self.versions) - 1  # [lo] no ICT, [hi] has it
                while hi - lo > 1:
                    mid = (lo + hi) // 2
                    if self._read_ict(self.versions[mid]) is not None:
                        hi = mid
                    else:
                        lo = mid
                self._boundary = hi
        return self._boundary

    def rightmost_at_or_before(self, target_ms: int) -> int | None:
        """Index of the latest commit with ts <= target, or None.

        Mixed logs search the ICT region first (it holds the latest
        versions); only when every ICT exceeds the target does the answer
        fall back to the clamped-mtime region below the boundary."""
        if not self._has_ict:
            idx = bisect.bisect_right(self.mtimes, target_ms) - 1
            return idx if idx >= 0 else None
        b = self._ict_boundary()
        lo, hi, ans = b, len(self.versions) - 1, None
        while lo <= hi:
            mid = (lo + hi) // 2
            probe = self._read_ict(self.versions[mid])
            if probe is None:
                # ICT disabled and re-enabled mid-history: the region is
                # not monotonic, so a binary search would silently return
                # a wrong version — fall back to the exact O(n) index
                eff = self._full_effective_index()
                idx = bisect.bisect_right(eff, target_ms) - 1
                return idx if idx >= 0 else None
            if probe <= target_ms:
                ans = mid
                lo = mid + 1
            else:
                hi = mid - 1
        if ans is not None:
            return ans
        idx = bisect.bisect_right(self.mtimes, target_ms, 0, b) - 1
        return idx if idx >= 0 else None

    def leftmost_at_or_after(self, target_ms: int) -> int | None:
        """Index of the earliest commit with ts >= target, or None.

        Mirror of rightmost_at_or_before: the mtime region holds the
        earliest versions, so it is consulted first; the ICT region only
        answers when no pre-boundary mtime reaches the target."""
        if not self._has_ict:
            idx = bisect.bisect_left(self.mtimes, target_ms)
            return idx if idx < len(self.mtimes) else None
        b = self._ict_boundary()
        idx = bisect.bisect_left(self.mtimes, target_ms, 0, b)
        if idx < b:
            return idx
        lo, hi, ans = b, len(self.versions) - 1, None
        while lo <= hi:
            mid = (lo + hi) // 2
            probe = self._read_ict(self.versions[mid])
            if probe is None:
                eff = self._full_effective_index()
                j = bisect.bisect_left(eff, target_ms)
                return j if j < len(eff) else None
            if probe >= target_ms:
                ans = mid
                hi = mid - 1
            else:
                lo = mid + 1
        return ans


def index_for_storage(storage, table_path: str) -> _TimestampIndex:
    """SparkSession-free index — used by the Python Data Source facade,
    which resolves storage from the table URI."""
    segment = build_log_segment(storage, table_path)
    return _TimestampIndex(
        storage,
        segment.log_dir,
        segment.all_commit_versions,
        segment.commit_timestamps,
    )


def version_at_timestamp_for_storage(storage, table_path: str, timestamp_ms: int) -> int:
    idx = index_for_storage(storage, table_path)
    i = idx.rightmost_at_or_before(timestamp_ms)
    if i is None:
        raise ValueError(
            f"no commit at or before timestamp {timestamp_ms} for {table_path}"
        )
    return idx.versions[i]


def first_version_after_for_storage(storage, table_path: str, timestamp_ms: int) -> int:
    idx = index_for_storage(storage, table_path)
    i = idx.leftmost_at_or_after(timestamp_ms)
    if i is None:
        raise ValueError(
            f"no commit at or after timestamp {timestamp_ms} for {table_path}"
        )
    return idx.versions[i]


def _index(spark, table_path: str) -> _TimestampIndex:
    return index_for_storage(storage_for(spark, table_path), table_path)


def version_at_timestamp(spark, table_path: str, timestamp_ms: int) -> int:
    """Latest version committed at or before ``timestamp_ms``
    (reference ``latest_version_as_of``)."""
    idx = _index(spark, table_path)
    i = idx.rightmost_at_or_before(timestamp_ms)
    if i is None:
        raise ValueError(
            f"no commit at or before timestamp {timestamp_ms} for {table_path}"
        )
    return idx.versions[i]


def first_version_after(spark, table_path: str, timestamp_ms: int) -> int:
    """Earliest version committed at or after ``timestamp_ms``."""
    idx = _index(spark, table_path)
    i = idx.leftmost_at_or_after(timestamp_ms)
    if i is None:
        raise ValueError(f"no commit at or after timestamp {timestamp_ms}")
    return idx.versions[i]


def timestamp_range_to_versions(
    spark, table_path: str, start_ms: int, end_ms: int
) -> tuple[int, int]:
    """Version range covering [start_ms, end_ms] (reference :632)."""
    return (
        first_version_after(spark, table_path, start_ms),
        version_at_timestamp(spark, table_path, end_ms),
    )
