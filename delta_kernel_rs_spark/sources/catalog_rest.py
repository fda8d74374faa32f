"""HTTP-shaped Unity-Catalog-style REST contract double + committer.

The repo has had the full catalog *protocol* seam since round 4 (staged
commits, ratification ledger, ordered publish, log-tail-gated loads in
``sources/committer.py`` / ``snapshot.py``) — but it was exercised through
direct in-process method calls.  This module puts the reference's actual
WIRE CONTRACT in front of that seam: dataclasses mirroring the REST body
schemas, a server double that validates them, and a client + committer
that talk to it exclusively through ``(method, path, query, body-bytes) →
(status, body-bytes)``.  Nothing else crosses the boundary, so swapping the
in-process transport for a real HTTP stack changes one callable.

Reference parity (studied, not copied — the reference is Rust):

- body schemas + singleton rules: the catalog-client API models
  (``unity-catalog-delta-client-api/src/models.rs:13-208`` — ``Commit``,
  ``DeltaTableRequirement``, ``DeltaTableUpdate``, ``UpdateTableRequest``
  with its at-most-one-of-each validation, ``LoadTableResponse`` with
  commits newest-first, kebab-case field names);
- paths/verbs/encoding: the REST client
  (``unity-catalog-delta-rest-client/src/clients/uc_client.rs:19-33``
  percent-encoded path segments, ``delta/v1`` endpoints;
  ``clients/commits.rs:40-50`` single-attempt POST for update_table —
  retries belong in the transaction layer);
- ratification rules: the in-memory server double
  (``unity-catalog-delta-client-api/src/clients/in_memory.rs:39-73`` —
  add-commit is required, version must be exactly max_ratified+1, at most
  ``MAX_UNPUBLISHED_COMMITS`` outstanding, set-latest-backfilled-version
  prunes published commits);
- committer flow: the UC committer
  (``delta-kernel-unity-catalog/src/committer.rs:134-300`` — version 0
  writes the published commit directly; version >= 1 writes a staged file,
  stats it, then sends add-commit with the backfill notice piggybacked;
  publish is an atomic copy where already-exists is success).
"""

from __future__ import annotations

import json
import urllib.parse
import uuid as uuid_mod
from dataclasses import dataclass, field

from delta_kernel_rs_spark.sources.committer import Committer, CommitResponse
from delta_kernel_rs_spark.sources.delta_paths import LOG_DIR, commit_filename
from delta_kernel_rs_spark.sources.log_segment import LogTailEntry
from delta_kernel_rs_spark.sources.storage import CommitConflict

#: reference in_memory.rs:26 — UC refuses a commit while this many are
#: ratified-but-unpublished (backpressure forcing publishes).
MAX_UNPUBLISHED_COMMITS = 20


class CatalogHttpError(Exception):
    """Non-2xx catalog response, surfaced with its status code."""

    def __init__(self, status: int, message: str):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status
        self.message = message


def _encode_segment(name: str) -> str:
    """Percent-encode a single URL path segment (uc_client.rs:19-22
    encodes everything non-alphanumeric)."""
    return urllib.parse.quote(name, safe="")


def _table_path(catalog: str, schema: str, table: str) -> str:
    return (
        f"delta/v1/catalogs/{_encode_segment(catalog)}"
        f"/schemas/{_encode_segment(schema)}/tables/{_encode_segment(table)}"
    )


# ---------------------------------------------------------------------------
# Wire models (kebab-case JSON, models.rs:13-208)
# ---------------------------------------------------------------------------


@dataclass
class WireCommit:
    """models.rs ``Commit``: one ratified-but-unpublished commit."""

    version: int
    timestamp: int
    file_name: str
    file_size: int
    file_modification_timestamp: int

    def to_wire(self) -> dict:
        return {
            "version": self.version,
            "timestamp": self.timestamp,
            "file-name": self.file_name,
            "file-size": self.file_size,
            "file-modification-timestamp": self.file_modification_timestamp,
        }

    @staticmethod
    def from_wire(d: dict) -> "WireCommit":
        return WireCommit(
            version=int(d["version"]),
            timestamp=int(d["timestamp"]),
            file_name=d["file-name"],
            file_size=int(d["file-size"]),
            file_modification_timestamp=int(d["file-modification-timestamp"]),
        )


def assert_table_uuid(uuid: str) -> dict:
    return {"type": "assert-table-uuid", "uuid": uuid}


def add_commit(commit: WireCommit) -> dict:
    return {"action": "add-commit", "commit": commit.to_wire()}


def set_latest_backfilled_version(version: int) -> dict:
    return {
        "action": "set-latest-backfilled-version",
        "latest-published-version": version,
    }


def validate_update_table_request(body: dict) -> None:
    """Singleton rules from ``UpdateTableRequest::new`` (models.rs:114-155):
    at most one each of assert-table-uuid, assert-etag, add-commit,
    set-latest-backfilled-version."""
    reqs = body.get("requirements", [])
    upds = body.get("updates", [])
    for kind in ("assert-table-uuid", "assert-etag"):
        if sum(1 for r in reqs if r.get("type") == kind) > 1:
            raise CatalogHttpError(
                400, f"update_table request must not contain more than one {kind}"
            )
    for kind in ("add-commit", "set-latest-backfilled-version"):
        if sum(1 for u in upds if u.get("action") == kind) > 1:
            raise CatalogHttpError(
                400, f"update_table request must not contain more than one {kind}"
            )


# ---------------------------------------------------------------------------
# Server double
# ---------------------------------------------------------------------------


@dataclass
class _TableState:
    """Server-side ratification state (in_memory.rs ``TableData``) plus the
    metadata ``load_table`` reports."""

    table_uuid: str
    location: str
    max_ratified_version: int = 0
    catalog_commits: list[WireCommit] = field(default_factory=list)
    etag: int = 0
    created_time: int = 0
    staged_only: bool = False  # staging table awaiting create-table


class UCCatalogServer:
    """In-process catalog server speaking the REST contract.

    ``handle`` is the entire surface: the transport callable a client gets.
    State mutations happen only through validated request bodies — exactly
    what a network server would see.
    """

    def __init__(self) -> None:
        import threading

        self._tables: dict[tuple[str, str, str], _TableState] = {}
        #: ratification is an atomic check-then-append — behind the real
        #: ThreadingHTTPServer two concurrent add-commit POSTs for the same
        #: next version would otherwise BOTH pass the version check (the
        #: reference's in_memory.rs holds a mutex around TableData for the
        #: same reason)
        self._mutate = threading.Lock()

    # -- test/bootstrap hook (mirrors in_memory.rs insert_table) ----------
    def register_table(
        self, catalog: str, schema: str, table: str, location: str,
        table_uuid: str | None = None, published_tip: int = 0,
    ) -> str:
        uid = table_uuid or str(uuid_mod.uuid4())
        self._tables[(catalog, schema, table)] = _TableState(
            table_uuid=uid, location=location, max_ratified_version=published_tip
        )
        return uid

    # -- the HTTP boundary -------------------------------------------------
    def handle(
        self, method: str, path: str, query: dict | None = None, body: bytes | None = None
    ) -> tuple[int, bytes]:
        try:
            payload = json.loads(body) if body else None
            return 200, json.dumps(
                self._route(method.upper(), path.strip("/"), query or {}, payload)
            ).encode()
        except CatalogHttpError as e:
            return e.status, json.dumps({"error": e.message}).encode()

    def _route(self, method: str, path: str, query: dict, payload):
        parts = [urllib.parse.unquote(p) for p in path.split("/")]
        if method == "GET" and parts == ["delta", "v1", "config"]:
            return self._get_config(query)
        if len(parts) == 8 and parts[:4] == ["delta", "v1", "catalogs", parts[3]]:
            # delta/v1/catalogs/{c}/schemas/{s}/tables/{t}
            if parts[4] == "schemas" and parts[6] == "tables":
                key = (parts[3], parts[5], parts[7])
                if method == "GET":
                    return self._load_table(key)
                if method == "POST":
                    return self._update_table(key, payload)
        if len(parts) == 7 and parts[4] == "schemas" and method == "POST":
            # delta/v1/catalogs/{c}/schemas/{s}/{staging-tables|tables}
            if parts[6] == "staging-tables":
                return self._create_staging_table(parts[3], parts[5], payload)
            if parts[6] == "tables":
                return self._create_table(parts[3], parts[5], payload)
        raise CatalogHttpError(404, f"no route for {method} /{path}")

    def _get_config(self, query: dict) -> dict:
        # uc_client.rs:108-125: session-start handshake
        if "catalog" not in query:
            raise CatalogHttpError(400, "missing catalog query parameter")
        return {
            "endpoints": [
                "GET /delta/v1/catalogs/{catalog}/schemas/{schema}/tables/{table}",
                "POST /delta/v1/catalogs/{catalog}/schemas/{schema}/tables/{table}",
                "POST /delta/v1/catalogs/{catalog}/schemas/{schema}/staging-tables",
                "POST /delta/v1/catalogs/{catalog}/schemas/{schema}/tables",
            ],
            "protocol-version": "1.0",
        }

    def _state(self, key: tuple[str, str, str]) -> _TableState:
        st = self._tables.get(key)
        if st is None:
            raise CatalogHttpError(404, f"table {'.'.join(key)} not found")
        return st

    def _load_table(self, key: tuple[str, str, str]) -> dict:
        st = self._state(key)
        # commits newest-first (LoadTableResponse doc, models.rs:196-199)
        commits = sorted(st.catalog_commits, key=lambda c: -c.version)
        return {
            "metadata": {
                "etag": str(st.etag),
                "table-type": "MANAGED",
                "table-uuid": st.table_uuid,
                "location": st.location,
                "created-time": st.created_time,
                "updated-time": st.created_time,
                "columns": {"type": "struct", "fields": []},
                "partition-columns": [],
                "properties": {},
                "last-commit-version": st.max_ratified_version,
            },
            "commits": [c.to_wire() for c in commits],
            "latest-table-version": st.max_ratified_version,
        }

    def _update_table(self, key: tuple[str, str, str], body: dict) -> dict:
        with self._mutate:
            return self._update_table_locked(key, body)

    def _update_table_locked(self, key: tuple[str, str, str], body: dict) -> dict:
        st = self._state(key)
        validate_update_table_request(body)
        for req in body.get("requirements", []):
            if req.get("type") == "assert-table-uuid" and req["uuid"] != st.table_uuid:
                raise CatalogHttpError(
                    409, f"table uuid mismatch: {req['uuid']} != {st.table_uuid}"
                )
            if req.get("type") == "assert-etag" and req["etag"] != str(st.etag):
                raise CatalogHttpError(409, "etag mismatch")
        commit = None
        backfilled = None
        for upd in body.get("updates", []):
            if upd.get("action") == "add-commit":
                commit = WireCommit.from_wire(upd["commit"])
            elif upd.get("action") == "set-latest-backfilled-version":
                backfilled = int(upd["latest-published-version"])
        if commit is None:
            # in_memory.rs:43-45: add-commit is required
            raise CatalogHttpError(400, "add-commit update is required")
        expected = st.max_ratified_version + 1
        if commit.version != expected:
            raise CatalogHttpError(
                409, f"expected commit version {expected} but got {commit.version}"
            )
        if len(st.catalog_commits) >= MAX_UNPUBLISHED_COMMITS:
            raise CatalogHttpError(
                400, f"max unpublished commits exceeded ({MAX_UNPUBLISHED_COMMITS})"
            )
        if backfilled is not None:
            st.catalog_commits = [
                c for c in st.catalog_commits if c.version > backfilled
            ]
        st.catalog_commits.append(commit)
        st.max_ratified_version = expected
        st.etag += 1
        return {}

    def _create_staging_table(self, catalog: str, schema: str, body: dict) -> dict:
        name = (body or {}).get("name")
        if not name:
            raise CatalogHttpError(400, "staging-table request needs a name")
        key = (catalog, schema, name)
        if key in self._tables:
            raise CatalogHttpError(409, f"table {'.'.join(key)} already exists")
        uid = str(uuid_mod.uuid4())
        st = _TableState(
            table_uuid=uid, location=f"memory://staging/{uid}", staged_only=True
        )
        self._tables[key] = st
        return {
            "table-id": uid,
            "table-type": "MANAGED",
            "location": st.location,
            "credentials": {"expiration-time": 0},
        }

    def _create_table(self, catalog: str, schema: str, body: dict) -> dict:
        name = (body or {}).get("name")
        uid = (body or {}).get("table-id")
        key = (catalog, schema, name)
        st = self._tables.get(key)
        if st is None or st.table_uuid != uid:
            raise CatalogHttpError(404, f"no staging table {'.'.join(key)}/{uid}")
        if not st.staged_only:
            raise CatalogHttpError(409, f"table {'.'.join(key)} already registered")
        st.staged_only = False
        if "location" in (body or {}):
            st.location = body["location"]
        return self._load_table(key)


# ---------------------------------------------------------------------------
# Client
# ---------------------------------------------------------------------------


class UCRestClient:
    """Client half of the contract: builds the exact request the reference
    REST client sends and parses the response — all through ``transport``,
    a ``(method, path, query, body) -> (status, body)`` callable (the
    server double's ``handle``, or a real HTTP POST in deployment)."""

    def __init__(self, transport) -> None:
        self._transport = transport

    def _call(
        self, method: str, path: str, query: dict | None = None,
        body: dict | None = None, conflict_as_commit: bool = False,
    ) -> dict:
        status, raw = self._transport(
            method, path, query, json.dumps(body).encode() if body is not None else None
        )
        payload = json.loads(raw) if raw else {}
        if status == 409 and conflict_as_commit:
            # commit-path conflicts feed the transaction retry loop
            raise CommitConflict(payload.get("error", "catalog version conflict"))
        if status >= 400:
            raise CatalogHttpError(status, payload.get("error", "catalog error"))
        return payload

    def get_config(self, catalog: str, protocol_versions: list[str]) -> dict:
        return self._call(
            "GET",
            "delta/v1/config",
            {"catalog": catalog, "protocol-versions": ",".join(protocol_versions)},
        )

    def load_table(self, catalog: str, schema: str, table: str) -> dict:
        return self._call("GET", _table_path(catalog, schema, table))

    def update_table(
        self, catalog: str, schema: str, table: str,
        requirements: list[dict], updates: list[dict],
    ) -> None:
        body = {"requirements": requirements, "updates": updates}
        validate_update_table_request(body)  # client-side, models.rs:114
        # Single attempt (commits.rs:47-49): UC rejects a resubmit of an
        # already-ratified version; retries belong in the transaction layer.
        self._call(
            "POST", _table_path(catalog, schema, table), body=body,
            conflict_as_commit=True,
        )

    def create_staging_table(self, catalog: str, schema: str, name: str) -> dict:
        return self._call(
            "POST",
            f"delta/v1/catalogs/{_encode_segment(catalog)}"
            f"/schemas/{_encode_segment(schema)}/staging-tables",
            body={"name": name},
        )

    def create_table(self, catalog: str, schema: str, name: str, table_id: str,
                     location: str | None = None) -> dict:
        body = {"name": name, "table-id": table_id}
        if location is not None:
            body["location"] = location
        return self._call(
            "POST",
            f"delta/v1/catalogs/{_encode_segment(catalog)}"
            f"/schemas/{_encode_segment(schema)}/tables",
            body=body,
        )


# ---------------------------------------------------------------------------
# Committer over the wire contract
# ---------------------------------------------------------------------------


class RestCatalogCommitter(Committer):
    """Catalog committer whose every catalog interaction is a REST call
    (delta-kernel-unity-catalog/src/committer.rs flow):

    - version 0: published commit written directly (committer.rs:134-150);
      the caller then registers via create-table.
    - version >= 1: staged file under ``_staged_commits/``, stat, then
      ``add-commit`` with ``set-latest-backfilled-version`` piggybacked
      (committer.rs:195-215) — a 409 surfaces as :class:`CommitConflict`
      so the transaction layer rebases/retries, and the staged file is
      left behind exactly like the reference (ignored by replay, removed
      by log cleanup).
    - ``log_tail``/``max_catalog_version``: from ``load_table``'s inline
      unpublished commits — the catalog is the source of truth, never
      this object's memory.
    - ``publish``: atomic copy staged → published where already-exists is
      success (committer.rs:278-300); UC learns the published tip on the
      next commit.
    """

    def __init__(self, client: UCRestClient, catalog: str, schema: str, table: str,
                 table_uuid: str) -> None:
        self.client = client
        self.ident = (catalog, schema, table)
        self.table_uuid = table_uuid
        self._max_published: int | None = None

    # -- Committer interface ------------------------------------------------
    def commit(self, storage, table_path: str, version: int, payload: bytes) -> CommitResponse:
        if version == 0:
            path = f"{table_path}/{LOG_DIR}/{commit_filename(0)}"
            storage.put_if_absent(path, payload)  # CommitConflict on loss
            return CommitResponse(version=0, path=path, is_staged=False)
        staged_name = f"{version:020d}.{uuid_mod.uuid4()}.json"
        path = f"{table_path}/{LOG_DIR}/_staged_commits/{staged_name}"
        storage.put_if_absent(path, payload)
        st = storage.stat(path)
        updates = [
            add_commit(
                WireCommit(
                    version=version,
                    timestamp=st.last_modified_ms,
                    file_name=staged_name,
                    file_size=st.size,
                    file_modification_timestamp=st.last_modified_ms,
                )
            )
        ]
        if self._max_published is not None:
            updates.append(set_latest_backfilled_version(self._max_published))
        # CommitConflict propagates from the client on 409
        self.client.update_table(
            *self.ident,
            requirements=[assert_table_uuid(self.table_uuid)],
            updates=updates,
        )
        return CommitResponse(version=version, path=path, is_staged=True)

    def is_catalog_committer(self) -> bool:
        return True

    def _catalog_commits(self) -> list[WireCommit]:
        resp = self.client.load_table(*self.ident)
        return sorted(
            (WireCommit.from_wire(c) for c in resp.get("commits", [])),
            key=lambda c: c.version,
        )

    def log_tail(self, table_path: str | None = None) -> list[LogTailEntry]:
        if table_path is None:
            resp = self.client.load_table(*self.ident)
            table_path = resp["metadata"]["location"]
        return [
            LogTailEntry(
                version=c.version,
                path=f"{table_path}/{LOG_DIR}/_staged_commits/{c.file_name}",
                last_modified_ms=c.file_modification_timestamp,
            )
            for c in self._catalog_commits()
        ]

    def max_catalog_version(self) -> int | None:
        resp = self.client.load_table(*self.ident)
        v = resp.get("latest-table-version")
        if v is None:
            v = resp["metadata"].get("last-commit-version")
        return v

    def publish(self, storage, table_path: str, up_to_version: int | None = None) -> list[str]:
        published: list[str] = []
        for c in self._catalog_commits():
            if up_to_version is not None and c.version > up_to_version:
                break
            src = f"{table_path}/{LOG_DIR}/_staged_commits/{c.file_name}"
            target = f"{table_path}/{LOG_DIR}/{commit_filename(c.version)}"
            try:
                storage.put_if_absent(target, storage.read_bytes(src))
            except CommitConflict:
                pass  # another publisher won; same commit content
            published.append(target)
            self._max_published = (
                c.version
                if self._max_published is None
                else max(self._max_published, c.version)
            )
        return published


# ---------------------------------------------------------------------------
# Real HTTP transport: the contract over an actual socket
# ---------------------------------------------------------------------------


class HttpTransport:
    """Socket-backed transport: each ``(method, path, query, body)`` call
    becomes a genuine HTTP request against ``base_url`` — bytes on a wire,
    real status codes and headers, exactly what the reference's reqwest
    client does (unity-catalog-delta-rest-client/src/http.rs). Drop-in for
    ``UCCatalogServer.handle`` (the in-process transport)."""

    def __init__(self, base_url: str, timeout: float = 10.0) -> None:
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def __call__(
        self, method: str, path: str, query: dict | None = None,
        body: bytes | None = None,
    ) -> tuple[int, bytes]:
        import urllib.error
        import urllib.request

        # Path segments arrive already percent-encoded by the client
        # (uc_client.rs:19-33); only the query string needs encoding here.
        url = f"{self.base_url}/{path.lstrip('/')}"
        if query:
            url += "?" + urllib.parse.urlencode(query)
        req = urllib.request.Request(
            url,
            data=body,
            method=method.upper(),
            headers={"Content-Type": "application/json"} if body else {},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status, resp.read()
        except urllib.error.HTTPError as e:
            return e.code, e.read()


def serve_catalog_http(server: UCCatalogServer):
    """Serve a ``UCCatalogServer`` over loopback HTTP.

    Returns ``(httpd, base_url)``; the server runs on a daemon thread —
    call ``httpd.shutdown(); httpd.server_close()`` when done. Request
    handling is a pure adapter: parse (method, raw path, query, body
    bytes) off the socket, feed ``server.handle``, write its (status,
    json bytes) back — the ratification rules never know the transport.
    """
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class _Handler(BaseHTTPRequestHandler):
        def _dispatch(self) -> None:
            split = urllib.parse.urlsplit(self.path)
            query = dict(urllib.parse.parse_qsl(split.query))
            length = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(length) if length else None
            status, payload = server.handle(self.command, split.path, query, body)
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        do_GET = _dispatch
        do_POST = _dispatch

        def log_message(self, *args):  # keep test output clean
            pass

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    return httpd, f"http://127.0.0.1:{httpd.server_address[1]}"
