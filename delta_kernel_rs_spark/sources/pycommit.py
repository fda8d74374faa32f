"""SparkSession-free append commits (the sink's driver-side hook).

The PySpark Python Data Source write API runs ``commit()``/``abort()`` in
a plain Python process with no SparkSession — so the streaming/batch sink
commits the executor-written files through this pure-Python path, the same
way the reference kernel's transaction does natively
(kernel/src/transaction/mod.rs: commitInfo + txn + add actions,
put-if-absent, optimistic retry).

Scope: blind appends only (the sink never removes files). Blind appends
cannot conflict semantically with concurrent writers, so a version
collision just re-targets the next version — matching the reference's
append conflict resolution. Row-tracking tables are rejected: baseRowId
assignment requires the high-water-mark handshake that lives in the
Spark-side Transaction.
"""

from __future__ import annotations

import json
import time
import uuid

from delta_kernel_rs_spark.sources.delta_paths import LOG_DIR, commit_filename
from delta_kernel_rs_spark.sources.log_segment import build_log_segment
from delta_kernel_rs_spark.sources.pyreplay import pq_read, snapshot_metadata
from delta_kernel_rs_spark.sources.storage import CommitConflict

MAX_COMMIT_ATTEMPTS = 40
ENGINE_INFO = "delta-kernel-rs-spark/sink"


class PyCommitError(Exception):
    pass


# One serializer shared with the Spark-side Transaction — the two commit
# paths must emit byte-identical action JSON (actions_json.py).
from delta_kernel_rs_spark.sources.actions_json import json_line as _json_line


def latest_txn_version(storage, seg, app_id: str) -> int | None:
    """Newest ``txn.version`` for ``app_id``: commit tail first (newest
    wins), checkpoint parquet fallback — both SparkSession-free."""
    for c in reversed(seg.commit_files):
        best: int | None = None
        for line in storage.read_text(c.path).splitlines():
            if '"txn"' not in line:
                continue
            try:
                t = json.loads(line).get("txn")
            except ValueError:
                continue
            if t and t.get("appId") == app_id and t.get("version") is not None:
                best = int(t["version"])
        if best is not None:
            return best
    for part in seg.checkpoint_parts:
        if part.endswith(".json"):
            # V2 JSON-flavored top: non-file actions (incl. txn) live
            # here as NDJSON — skipping it would forget app versions and
            # break exactly-once (round-12 foreign-checkpoint fuzz)
            best = None
            for line in storage.read_text(part).splitlines():
                try:
                    t = json.loads(line).get("txn") if line.strip() else None
                except ValueError:
                    continue
                if t and t.get("appId") == app_id and t.get("version") is not None:
                    v = int(t["version"])
                    best = v if best is None else max(best, v)
            if best is not None:
                return best
            continue
        tbl = pq_read(part)
        if "txn" not in tbl.column_names:
            continue
        best = None
        for t in tbl.column("txn").to_pylist():
            if t and t.get("appId") == app_id and t.get("version") is not None:
                best = int(t["version"]) if best is None else max(best, int(t["version"]))
        if best is not None:
            return best
    return None


def _prev_ict(storage, table_path: str, version: int) -> int | None:
    if version < 0:
        return None
    path = f"{table_path}/{LOG_DIR}/{commit_filename(version)}"
    try:
        first = storage.read_text(path).split("\n", 1)[0]
        return (json.loads(first).get("commitInfo") or {}).get("inCommitTimestamp")
    except (OSError, ValueError):
        return None


def commit_append(
    storage,
    table_path: str,
    adds: list[dict],
    operation: str = "STREAMING UPDATE",
    app_id: str | None = None,
    txn_version: int | None = None,
) -> int | None:
    """Commit pre-written add actions; returns the committed version, or
    None when (app_id, txn_version) was already committed (idempotent
    replay of a streaming micro-batch)."""
    table_path = table_path.rstrip("/")
    attempts = 0
    while True:
        seg = build_log_segment(storage, table_path)
        meta, proto = snapshot_metadata(storage, seg)
        config = meta.get("configuration") or {}
        features = set(proto.get("writerFeatures") or [])
        if "rowTracking" in features or config.get("delta.enableRowTracking", "false").lower() == "true":
            raise PyCommitError(
                "sink append to a row-tracking table is not supported — "
                "use DeltaTable.append (baseRowId assignment needs the "
                "Spark-side transaction)"
            )
        if app_id is not None and txn_version is not None:
            last = latest_txn_version(storage, seg, app_id)
            if last is not None and last >= txn_version:
                return None  # this micro-batch already committed
        version = seg.version + 1
        info: dict = {
            "timestamp": int(time.time() * 1000),
            "operation": operation,
            "operationParameters": {},
            "engineInfo": ENGINE_INFO,
            "txnId": str(uuid.uuid4()),
        }
        if config.get("delta.enableInCommitTimestamps", "false").lower() == "true":
            prev = _prev_ict(storage, table_path, version - 1)
            info["inCommitTimestamp"] = max(int(time.time() * 1000), (prev or 0) + 1)
        actions: list[dict] = [{"commitInfo": info}]
        if app_id is not None and txn_version is not None:
            actions.append(
                {
                    "txn": {
                        "appId": app_id,
                        "version": txn_version,
                        "lastUpdated": int(time.time() * 1000),
                    }
                }
            )
        actions.extend(adds)
        payload = ("\n".join(_json_line(a) for a in actions) + "\n").encode()
        path = f"{table_path}/{LOG_DIR}/{commit_filename(version)}"
        try:
            storage.put_if_absent(path, payload)
            return version
        except CommitConflict:
            attempts += 1
            if attempts >= MAX_COMMIT_ATTEMPTS:
                raise PyCommitError(
                    f"gave up after {attempts} commit attempts at {table_path}"
                )
