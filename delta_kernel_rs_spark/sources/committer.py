"""Commit strategies: filesystem PUT-if-absent vs catalog-managed staging.

Reference: ``kernel/src/committer/mod.rs`` — the ``Committer`` trait lets a
catalog define what "commit transaction at version V" means. Two shapes:

- :class:`FileSystemCommitter` — non-catalog tables: atomically create the
  published delta ``_delta_log/{V:020}.json`` (PUT-if-absent is the commit
  primitive; a loser of the race gets a conflict and retries at V+1).
- :class:`InMemoryCatalogCommitter` — an in-process stand-in for a
  catalog-managed table (``kernel/src/committer/commit_types.rs``,
  ``publish_types.rs``): commits land as STAGED files under
  ``_delta_log/_staged_commits/{V:020}.{uuid}.json`` and are ratified by
  the catalog (here: this object's in-memory state — the component a real
  deployment replaces with its catalog client). Readers see staged commits
  via ``Snapshot.create(..., log_tail=committer.log_tail())``; ``publish``
  later copies ratified commits to the Delta log as published files so
  maintenance (checkpoints, log compaction) can run on them.

The transaction hands the committer a fully-serialized action payload and
a target version; all staging/row-id/ICT logic stays in the transaction —
the committer owns only the atomic-placement step, mirroring the
reference's separation.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass

from delta_kernel_rs_spark.sources.delta_paths import LOG_DIR, commit_filename
from delta_kernel_rs_spark.sources.log_segment import LogTailEntry
from delta_kernel_rs_spark.sources.storage import CommitConflict


@dataclass
class CommitResponse:
    """Where a commit landed (reference CommitResponse)."""

    version: int
    path: str
    is_staged: bool


class Committer:
    """Strategy interface for placing a serialized commit at a version."""

    def commit(self, storage, table_path: str, version: int, payload: bytes) -> CommitResponse:
        raise NotImplementedError

    def is_catalog_committer(self) -> bool:
        raise NotImplementedError

    def publish(self, storage, table_path: str, up_to_version: int | None = None) -> list[str]:
        """Copy ratified catalog commits into the Delta log as published
        deltas, in version order. Filesystem committers refuse."""
        raise NotImplementedError

    def log_tail(self) -> list[LogTailEntry]:
        """Catalog-ratified commits not yet published (empty for
        filesystem committers)."""
        return []

    def max_catalog_version(self) -> int | None:
        """The catalog's ratified tip, or None for filesystem committers.
        Required context for loading catalog-managed tables
        (reference snapshot/builder.rs with_max_catalog_version)."""
        return None


class FileSystemCommitter(Committer):
    """Direct object-store commit via atomic PUT-if-absent (reference
    committer/filesystem.rs)."""

    def commit(self, storage, table_path: str, version: int, payload: bytes) -> CommitResponse:
        path = f"{table_path}/{LOG_DIR}/{commit_filename(version)}"
        storage.put_if_absent(path, payload)  # raises CommitConflict on loss
        return CommitResponse(version=version, path=path, is_staged=False)

    def is_catalog_committer(self) -> bool:
        return False

    def publish(self, storage, table_path: str, up_to_version: int | None = None) -> list[str]:
        raise ValueError("filesystem committer has no catalog commits to publish")


class InMemoryCatalogCommitter(Committer):
    """Catalog-managed commits with an in-process ratification ledger.

    The ledger (version -> staged path) models the catalog server's
    source-of-truth commit list; a real integration implements the same
    four methods against its catalog API. Ratification is atomic on the
    ledger: the first transaction to claim version V wins, any other
    attempt at V conflicts and retries against the refreshed snapshot
    (``Transaction._revalidate`` consults ``log_tail()``).
    """

    def __init__(self) -> None:
        self._ratified: dict[int, LogTailEntry] = {}
        self._published: set[int] = set()
        self._registered_tip: int | None = None

    def register(self, published_tip: int) -> None:
        """Catalog registration: record the table's published tip so
        ``max_catalog_version`` is defined before any staged commit exists
        (a real catalog learns this when the table is enrolled)."""
        self._registered_tip = published_tip

    def max_catalog_version(self) -> int | None:
        ratified = max(self._ratified, default=None)
        if ratified is None:
            return self._registered_tip
        if self._registered_tip is None:
            return ratified
        return max(ratified, self._registered_tip)

    def commit(self, storage, table_path: str, version: int, payload: bytes) -> CommitResponse:
        if version in self._ratified:
            raise CommitConflict(f"catalog already ratified version {version}")
        staged_name = f"{version:020d}.{uuid.uuid4()}.json"
        path = f"{table_path}/{LOG_DIR}/_staged_commits/{staged_name}"
        # Staged file names are UUID-unique, so a plain write suffices;
        # atomicity lives in the ledger insert below.
        storage.put_if_absent(path, payload)
        entry = LogTailEntry(version=version, path=path, last_modified_ms=storage.stat(path).last_modified_ms)
        self._ratified[version] = entry
        return CommitResponse(version=version, path=path, is_staged=True)

    def is_catalog_committer(self) -> bool:
        return True

    def log_tail(self) -> list[LogTailEntry]:
        return [
            self._ratified[v]
            for v in sorted(self._ratified)
            if v not in self._published
        ]

    def publish(self, storage, table_path: str, up_to_version: int | None = None) -> list[str]:
        """Copy ratified staged commits to published ``NNN.json`` in order
        (reference Committer::publish contract: V-1 before V, idempotent
        under PUT-if-absent races with other publishers)."""
        published: list[str] = []
        for v in sorted(self._ratified):
            if v in self._published:
                continue
            if up_to_version is not None and v > up_to_version:
                break
            entry = self._ratified[v]
            target = f"{table_path}/{LOG_DIR}/{commit_filename(v)}"
            try:
                storage.put_if_absent(target, storage.read_bytes(entry.path))
            except CommitConflict:
                pass  # another publisher won; the published file is the same commit
            self._published.add(v)
            published.append(target)
        return published
