"""LogSegment — the contiguous slice of the ``_delta_log`` that defines a
snapshot: an optional checkpoint plus every commit after it.

Mirrors the reference's ``LogSegment`` (kernel/src/log_segment/mod.rs,
invariants at :98-113), ``_last_checkpoint`` hint handling
(kernel/src/last_checkpoint_hint.rs) and compacted-commit substitution
(kernel/src/log_segment_files/, exported via lib.rs:199).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from delta_kernel_rs_spark.sources.delta_paths import (
    LAST_CHECKPOINT_NAME,
    LOG_DIR,
    LogFileKind,
    ParsedLogPath,
    parse_log_filename,
)


class InvalidLogError(Exception):
    pass


class TableNotFoundError(Exception):
    pass


@dataclass
class LogTailEntry:
    """One catalog-provided commit for ``log_tail`` (reference
    kernel/src/snapshot/builder.rs:149 ``with_log_tail``): a commit that a
    catalog has ratified but that may not (yet) be listable under
    ``_delta_log`` — e.g. a staged commit file awaiting publication. The
    path may live anywhere the storage handler can read."""

    version: int
    path: str
    last_modified_ms: int = 0


@dataclass
class LogSegment:
    table_path: str
    log_dir: str
    version: int
    checkpoint_version: int | None
    checkpoint_parts: list[str]  # parquet paths forming the checkpoint
    commit_files: list[ParsedLogPath]  # ascending, versions in (ckpt, version]
    # commit-file modification times (ms) keyed by version — commit timestamps
    commit_timestamps: dict[int, int] = field(default_factory=dict)
    # ascending list of ALL commit versions seen in the listing (history)
    all_commit_versions: list[int] = field(default_factory=list)
    # the retained ``_last_checkpoint`` hint, stored ONLY when it describes
    # the checkpoint this segment selected (reference
    # LastCheckpointHint::applies_to, last_checkpoint_hint.rs:110-123 —
    # multiple checkpoints can share a version, so a matching version alone
    # is not enough); callers may trust its fields
    checkpoint_hint: dict | None = None

    def hint_sidecar_files(self) -> list[dict] | None:
        """The hint's V2 ``sidecarFiles``, when the hint describes the
        selected checkpoint (reference ``checkpoint_hint_sidecars``,
        log_segment/mod.rs:274-281). ``Some(empty)`` means a definitive
        inline leaf; ``None`` is a missing optimization, never a signal."""
        v2 = (self.checkpoint_hint or {}).get("v2Checkpoint") or {}
        return v2.get("sidecarFiles")

    def hint_non_file_actions(self) -> list[dict] | None:
        """The hint's ``nonFileActions`` — the checkpoint's COMPLETE
        non-file action set when present (reference LastCheckpointV2
        docs, last_checkpoint_hint.rs:87-91: lets a reader obtain them
        without reading the checkpoint file)."""
        v2 = (self.checkpoint_hint or {}).get("v2Checkpoint") or {}
        return v2.get("nonFileActions")


#: per-field count cap on a retained hint's sidecarFiles / nonFileActions
#: (reference last_checkpoint_hint.rs:27-28, matching Delta-Spark's
#: lastCheckpoint.{sidecars,nonFileActions}.threshold defaults): drop the
#: WHOLE field above the cap, never truncate — absence only loses an
#: optimization, while a truncated list would be silently wrong.
HINT_SIDECARS_THRESHOLD = 30
HINT_NON_FILE_ACTIONS_THRESHOLD = 30

#: the action kinds a hint's nonFileActions may carry (reference HintAction
#: enum, last_checkpoint_hint.rs:93-107). An unrecognized key fails the
#: whole-hint parse, and the reader falls back to reading the checkpoint.
HINT_ACTION_KEYS = frozenset(
    {"metaData", "protocol", "txn", "domainMetadata", "checkpointMetadata"}
)


def _retain_hint(hint: dict) -> dict | None:
    """Validate + trim a parsed hint so callers never hold an untrimmed one
    (reference ``from_bytes_with_oversized_fields_dropped``)."""
    if not isinstance(hint, dict) or not isinstance(hint.get("version"), int):
        return None
    v2 = hint.get("v2Checkpoint")
    if v2 is None:
        return hint
    if not isinstance(v2, dict) or not isinstance(v2.get("path"), str):
        return None  # malformed v2Checkpoint fails the whole-hint parse
    nfa = v2.get("nonFileActions")
    if nfa is not None:
        for entry in nfa:
            if not isinstance(entry, dict) or set(entry) - HINT_ACTION_KEYS:
                return None  # unrecognized action: whole hint is untrusted
        if len(nfa) > HINT_NON_FILE_ACTIONS_THRESHOLD:
            v2 = {k: val for k, val in v2.items() if k != "nonFileActions"}
    sidecars = v2.get("sidecarFiles")
    if sidecars is not None and len(sidecars) > HINT_SIDECARS_THRESHOLD:
        v2 = {k: val for k, val in v2.items() if k != "sidecarFiles"}
    return {**hint, "v2Checkpoint": v2}


def read_last_checkpoint_hint(storage, log_dir: str) -> dict | None:
    path = f"{log_dir}/{LAST_CHECKPOINT_NAME}"
    if not storage.exists(path):
        return None
    try:
        return _retain_hint(json.loads(storage.read_text(path)))
    except (ValueError, OSError):
        return None  # corrupt hint is advisory only


def _hint_applies(hint: dict, ckpt_version: int | None, ckpt_parts: list[str]) -> bool:
    """Whether the hint describes the checkpoint this segment selected
    (reference ``LastCheckpointHint::applies_to`` + ``implied_instance``,
    last_checkpoint_hint.rs:110-138, mirroring Delta-Spark's
    ``getFormatEnum``): a ``v2Checkpoint`` object means uuid-named (the
    hint's own path must equal the selected file's name — several V2
    checkpoints can share a version), else ``parts`` means multi-part,
    else classic-named. On a mismatch, callers read the checkpoint file
    itself instead of trusting the hint's fields."""
    if not ckpt_parts or hint.get("version") != ckpt_version:
        return False
    first = parse_log_filename(ckpt_parts[0])
    if first is None:
        return False
    v2 = hint.get("v2Checkpoint")
    if v2 is not None:
        return first.kind == LogFileKind.V2_CHECKPOINT and first.filename == v2.get("path")
    parts = hint.get("parts")
    if parts is not None:
        return (
            first.kind == LogFileKind.MULTIPART_CHECKPOINT
            and len(ckpt_parts) == parts
        )
    return first.kind == LogFileKind.CLASSIC_CHECKPOINT


def build_log_segment(
    storage,
    table_path: str,
    at_version: int | None = None,
    use_compacted: bool = True,
    log_tail: list[LogTailEntry] | None = None,
) -> LogSegment:
    """List ``_delta_log`` and assemble the snapshot's log segment.

    The ``_last_checkpoint`` hint lets us start the listing at the
    checkpoint instead of version 0 (reference: last_checkpoint_hint.rs) —
    on object stores that turns an O(versions) LIST into O(tail).
    """
    table_path = table_path.rstrip("/")
    log_dir = f"{table_path}/{LOG_DIR}"

    hint = read_last_checkpoint_hint(storage, log_dir)
    start_name = ""
    if hint and isinstance(hint.get("version"), int):
        hint_v = hint["version"]
        if at_version is None or hint_v <= at_version:
            start_name = f"{hint_v:020d}."

    entries = storage.list_from(log_dir, start_name) if start_name else storage.list_dir(log_dir)
    if not entries and start_name:
        entries = storage.list_dir(log_dir)  # stale hint — fall back to full listing
    parsed = [p for e in entries if (p := parse_log_filename(e.path)) is not None]
    mtimes = {e.path: e.last_modified_ms for e in entries}
    if not parsed:
        raise TableNotFoundError(f"no Delta log found at {log_dir}")

    commits = sorted(
        (p for p in parsed if p.kind == LogFileKind.COMMIT), key=lambda p: p.version
    )
    if at_version is not None:
        commits = [c for c in commits if c.version <= at_version]

    # --- catalog log tail: staged commits merged over the listing --------
    # (reference snapshot/builder.rs:149) — the catalog's view of a version
    # wins over a same-version listed file, and tail entries may extend the
    # log past the newest listable commit.
    if log_tail:
        by_v = {c.version: c for c in commits}
        for e in log_tail:
            if at_version is not None and e.version > at_version:
                continue
            by_v[e.version] = ParsedLogPath(
                path=e.path,
                filename=e.path.rsplit("/", 1)[-1],
                version=e.version,
                kind=LogFileKind.COMMIT,
            )
            mtimes[by_v[e.version].path] = e.last_modified_ms
        commits = sorted(by_v.values(), key=lambda c: c.version)

    # --- choose the newest complete checkpoint at or below the target ---
    ckpt_version: int | None = None
    ckpt_parts: list[str] = []
    classic = [p for p in parsed if p.kind == LogFileKind.CLASSIC_CHECKPOINT]
    v2 = [
        p
        for p in parsed
        if p.kind == LogFileKind.V2_CHECKPOINT
        # V2 checkpoints come in parquet AND json flavors (protocol
        # spec; reference log_path.rs) — both carry sidecar pointers
        and p.filename.endswith((".parquet", ".json"))
    ]
    multi = [p for p in parsed if p.kind == LogFileKind.MULTIPART_CHECKPOINT]
    candidates: dict[int, list[str]] = {}
    for p in classic:
        candidates.setdefault(p.version, []).append(p.path)
    for p in v2:
        candidates.setdefault(p.version, [p.path])
    by_version: dict[int, tuple[int, dict[int, str]]] = {}
    for p in multi:
        num_parts = p.part[1]
        by_version.setdefault(p.version, (num_parts, {}))[1][p.part[0]] = p.path
    for v, (num_parts, parts) in by_version.items():
        if len(parts) == num_parts and set(parts) == set(range(1, num_parts + 1)):
            candidates.setdefault(v, [parts[i] for i in range(1, num_parts + 1)])
    eligible = [v for v in candidates if at_version is None or v <= at_version]
    if eligible:
        ckpt_version = max(eligible)
        ckpt_parts = candidates[ckpt_version]

    # --- commits strictly after the checkpoint ---
    tail = [c for c in commits if ckpt_version is None or c.version > ckpt_version]

    # --- contiguity validation (log_segment/mod.rs:98-106) ---
    expected = 0 if ckpt_version is None else ckpt_version + 1
    for c in tail:
        if c.version != expected:
            raise InvalidLogError(
                f"log is not contiguous: expected commit {expected}, found {c.version}"
            )
        expected += 1

    if ckpt_version is None and (not tail or tail[0].version != 0):
        raise InvalidLogError("log must start at version 0 or a checkpoint")

    version = tail[-1].version if tail else ckpt_version
    if at_version is not None and version != at_version:
        raise InvalidLogError(
            f"requested version {at_version} not available (latest usable: {version})"
        )

    # --- compacted-commit substitution (optimization) ---
    if use_compacted and tail:
        compacted = sorted(
            (
                p
                for p in parsed
                if p.kind == LogFileKind.COMPACTED
                and p.version >= tail[0].version
                and p.end_version is not None
                and p.end_version <= tail[-1].version
            ),
            key=lambda p: (p.version, -(p.end_version or 0)),
        )
        if compacted:
            out: list[ParsedLogPath] = []
            i = 0
            by_start = {p.version: p for p in compacted}
            while i < len(tail):
                sub = by_start.get(tail[i].version)
                if sub is not None and sub.end_version <= tail[-1].version:
                    out.append(sub)
                    i += sub.end_version - sub.version + 1
                else:
                    out.append(tail[i])
                    i += 1
            tail = out

    return LogSegment(
        table_path=table_path,
        log_dir=log_dir,
        version=version,
        checkpoint_version=ckpt_version,
        checkpoint_parts=ckpt_parts,
        commit_files=tail,
        commit_timestamps={c.version: mtimes.get(c.path, 0) for c in commits},
        all_commit_versions=[c.version for c in commits],
        checkpoint_hint=(
            hint if hint and _hint_applies(hint, ckpt_version, ckpt_parts) else None
        ),
    )
