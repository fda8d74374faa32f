"""CRC (version checksum) files: ``{version:020d}.crc`` table-state summaries.

Mirrors the reference crc module (kernel/src/crc/mod.rs — wire format
``CrcRaw`` at :142-168: tableSizeBytes, numFiles, numMetadata=1,
numProtocol=1, metadata, protocol, optional setTransactions /
domainMetadata; reader kernel/src/crc/reader.rs; incremental update
kernel/src/snapshot/incremental.rs). Two jobs:

* **write**: full compute from a snapshot (one distributed agg over the
  live file list), or the O(1) incremental path — prior ``{v-1}.crc`` plus
  the single commit's actions — which is what keeps commit-time CRC
  maintenance flat at any table size.
* **read fast path**: snapshot construction reads ``{v}.crc`` to resolve
  protocol & metadata without replaying the commit tail.

CRC files are advisory: corrupt/missing files fall back to log replay, and
writes never overwrite (put-if-absent).
"""

from __future__ import annotations

import json
import urllib.parse

from pyspark.sql import functions as F

from delta_kernel_rs_spark.sources.delta_paths import LOG_DIR
from delta_kernel_rs_spark.sources.storage import CommitConflict

#: incremental CRC reads the commit text on the driver; beyond this size
#: the distributed full compute is the right path (write_crc_full)
MAX_INCREMENTAL_COMMIT_BYTES = 16 << 20

#: commit action kinds whose state effect the incremental fold models
#: (the Delta action vocabulary, kernel/src/actions/mod.rs:46-72 minus
#: the checkpoint-only kinds which never appear in commits); anything
#: else makes the fold bail rather than risk a wrong CRC
_KNOWN_ACTION_KINDS = frozenset(
    {"add", "remove", "metaData", "protocol", "txn", "commitInfo", "cdc",
     "domainMetadata"}
)


def _dv_uid(dv: dict | None) -> str:
    if not dv or not dv.get("storageType"):
        return ""
    return f"{dv.get('storageType')}{dv.get('pathOrInlineDv')}@{dv.get('offset')}"


def crc_path(table_path: str, version: int) -> str:
    return f"{table_path.rstrip('/')}/{LOG_DIR}/{version:020d}.crc"


def read_crc(storage, table_path: str, version: int) -> dict | None:
    """Parse ``{version}.crc`` or None (missing/corrupt — advisory only)."""
    path = crc_path(table_path, version)
    if not storage.exists(path):
        return None
    try:
        raw = json.loads(storage.read_text(path))
    except (ValueError, OSError):
        return None
    if raw.get("numMetadata") != 1 or raw.get("numProtocol") != 1:
        return None  # spec: both MUST be 1 (reference mod.rs:174-185)
    if "metadata" not in raw or "protocol" not in raw:
        return None
    return raw


def write_crc_full(spark, table_path: str, snapshot) -> bool:
    """Full CRC compute from a snapshot; returns False if one already
    existed (never overwrite — reference writer contract). Carries the
    COMPLETE setTransaction/domainMetadata state (reference crc writer)
    so the tip CRC can answer app-txn and domain lookups without replay."""
    from delta_kernel_rs_spark.sources.checkpoint import live_txns_and_domains

    files_df = snapshot.scan().scan_files_df()
    agg = files_df.agg(
        F.count(F.lit(1)).alias("n"), F.sum("size").alias("bytes")
    ).collect()[0]
    txns, domains = live_txns_and_domains(snapshot)
    doc = _crc_doc(
        n_files=agg.n or 0,
        size_bytes=agg.bytes or 0,
        metadata=_metadata_dict(snapshot),
        protocol=_protocol_dict(snapshot),
        set_transactions=sorted(txns.values(), key=lambda t: t["appId"]),
        domain_metadata=sorted(domains.values(), key=lambda d: d["domain"]),
        ict=_commit_ict(snapshot.storage, table_path, snapshot.version),
    )
    return _put(snapshot.storage, table_path, snapshot.version, doc)


def _commit_ict(storage, table_path: str, version: int) -> int | None:
    """inCommitTimestamp from the commit's leading commitInfo, if present
    (ICT tables only; the first line is commitInfo by construction)."""
    path = f"{table_path.rstrip('/')}/{LOG_DIR}/{version:020d}.json"
    try:
        # optional field: skip rather than pull a huge commit for one line
        if storage.stat(path).size > MAX_INCREMENTAL_COMMIT_BYTES:
            return None
        first = storage.read_text(path).split("\n", 1)[0]
        return (json.loads(first).get("commitInfo") or {}).get("inCommitTimestamp")
    except (OSError, ValueError):
        return None


def update_crc_incremental(spark, table_path: str, storage, version: int) -> bool:
    """O(1) CRC maintenance: prior ``{v-1}.crc`` + this commit's actions.

    Returns False (no write) when the prior CRC is missing — callers may
    fall back to :func:`write_crc_full` or simply skip (advisory file).
    """
    if storage.exists(crc_path(table_path, version)):
        # already maintained (the commit path writes inline; DML helpers
        # call again) — True so callers don't run a redundant full compute
        return True
    if version == 0:
        # Bootstrap: version 0's commit IS the full state — the chain
        # starts here (before this, the incremental path could never
        # produce a first CRC and stayed a silent no-op forever). Empty
        # PRESENT state maps are authoritative at v0 by construction.
        prior = {
            "numFiles": 0,
            "tableSizeBytes": 0,
            "metadata": None,
            "protocol": None,
            "setTransactions": [],
            "domainMetadata": [],
        }
    else:
        prior = read_crc(storage, table_path, version - 1)
        if prior is None:
            return False
    commit = f"{table_path.rstrip('/')}/{LOG_DIR}/{version:020d}.json"
    try:
        # bound the driver read: a huge (streamed) maintenance commit must
        # not be pulled back whole — callers fall back to the distributed
        # full compute instead
        if storage.stat(commit).size > MAX_INCREMENTAL_COMMIT_BYTES:
            return False
        text = storage.read_text(commit)
    except OSError:
        return False
    n_files = prior["numFiles"]
    size_bytes = prior["tableSizeBytes"]
    metadata = prior["metadata"]
    protocol = prior["protocol"]
    # complete-state maps carry forward ONLY when the prior CRC had them
    # (reference state.rs: Partial prior stays Partial — the fold can
    # extend authoritative knowledge, never invent it)
    txns: dict[str, dict] | None = (
        {t["appId"]: t for t in prior["setTransactions"]}
        if prior.get("setTransactions") is not None
        else None
    )
    domains: dict[str, dict] | None = (
        {d["domain"]: d for d in prior["domainMetadata"]}
        if prior.get("domainMetadata") is not None
        else None
    )
    ict: int | None = None
    seen_removes: set[str] = set()
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            action = json.loads(line)
        except ValueError:
            continue
        if not _KNOWN_ACTION_KINDS.intersection(action):
            # foreign commit with an action kind this fold doesn't model:
            # its effect on table state is unknowable — a wrong CRC is
            # worse than none (reference state.rs folds only known kinds
            # and new kinds arrive protocol-gated)
            return False
        if "add" in action:
            n_files += 1
            size_bytes += action["add"].get("size") or 0
        elif "remove" in action:
            # a remove ALWAYS shrinks the live file set — dataChange=false
            # (OPTIMIZE/PURGE rewrites) flags logical content, not layout
            rm = action["remove"]
            key = (
                f"{urllib.parse.unquote(rm.get('path') or '')}"
                f"\x00{_dv_uid(rm.get('deletionVector'))}"
            )
            if key in seen_removes:
                # duplicate remove of the same (path, dv) in ONE commit:
                # a foreign writer's double tombstone must not
                # double-decrement the live count — bail instead
                return False
            seen_removes.add(key)
            n_files -= 1
            if rm.get("size") is None:
                # foreign remove without extended metadata: the byte
                # delta is unknowable — a wrong CRC is worse than none
                return False
            size_bytes -= rm["size"]
        elif "metaData" in action:
            metadata = action["metaData"]
        elif "protocol" in action:
            protocol = action["protocol"]
        elif "txn" in action:
            t = action["txn"]
            if txns is not None and t.get("appId"):
                txns[t["appId"]] = t
        elif "domainMetadata" in action:
            d = action["domainMetadata"]
            if domains is not None and d.get("domain"):
                if d.get("removed"):
                    domains.pop(d["domain"], None)
                else:
                    domains[d["domain"]] = d
        elif "commitInfo" in action:
            ict = (action["commitInfo"] or {}).get("inCommitTimestamp")
    if metadata is None or protocol is None:
        return False
    if n_files < 0 or size_bytes < 0:
        # a fold can only go negative when a remove's key was not live
        # (cross-commit duplicate tombstone from a foreign writer) —
        # definite corruption signal, never write it
        return False
    doc = _crc_doc(
        n_files,
        size_bytes,
        metadata,
        protocol,
        set_transactions=(
            sorted(txns.values(), key=lambda t: t["appId"]) if txns is not None else None
        ),
        domain_metadata=(
            sorted(domains.values(), key=lambda d: d["domain"])
            if domains is not None
            else None
        ),
        ict=ict,
    )
    return _put(storage, table_path, version, doc)


def _crc_doc(
    n_files: int,
    size_bytes: int,
    metadata: dict,
    protocol: dict,
    set_transactions: list[dict] | None = None,
    domain_metadata: list[dict] | None = None,
    ict: int | None = None,
) -> dict:
    """CRC wire document (reference CrcRaw, crc/mod.rs:142-168).

    Optional-field semantics match the reference exactly: a PRESENT
    ``setTransactions``/``domainMetadata`` array (even ``[]``) is
    authoritative — a miss means the state does not exist; an ABSENT
    array means partial knowledge and readers must fall back to replay.
    ``domainMetadata`` never stores tombstones."""
    doc = {
        "tableSizeBytes": size_bytes,
        "numFiles": n_files,
        "numMetadata": 1,
        "numProtocol": 1,
        "metadata": metadata,
        "protocol": protocol,
    }
    if set_transactions is not None:
        doc["setTransactions"] = set_transactions
    if domain_metadata is not None:
        doc["domainMetadata"] = [
            d for d in domain_metadata if not d.get("removed")
        ]
    if ict is not None:
        doc["inCommitTimestampOpt"] = ict
    return doc


def _metadata_dict(snapshot) -> dict:
    m = snapshot.metadata
    return {
        "id": m.id,
        "name": m.name,
        "description": m.description,
        "format": {"provider": "parquet", "options": {}},
        "schemaString": m.schema_string,
        "partitionColumns": m.partition_columns,
        "configuration": m.configuration,
        "createdTime": m.created_time,
    }


def _protocol_dict(snapshot) -> dict:
    p = snapshot.protocol
    out: dict = {
        "minReaderVersion": p.min_reader_version,
        "minWriterVersion": p.min_writer_version,
    }
    if p.min_reader_version >= 3:
        out["readerFeatures"] = p.reader_features
    if p.min_writer_version >= 7:
        out["writerFeatures"] = p.writer_features
    return out


def _put(storage, table_path: str, version: int, doc: dict) -> bool:
    try:
        storage.put_if_absent(
            crc_path(table_path, version),
            json.dumps({k: v for k, v in doc.items() if v is not None}).encode(),
        )
        return True
    except CommitConflict:
        return False
