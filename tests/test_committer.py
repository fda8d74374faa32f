"""Committer seam: catalog-managed staged commits + publish
(sources/committer.py; reference kernel/src/committer/).

Catalog-managed tables (``delta.feature.catalogManaged = supported``)
follow the reference's gating (snapshot/builder.rs:326-420): the
filesystem log alone is never authoritative, so every load needs the
catalog's ``log_tail`` + ``max_catalog_version``, and every commit must
go through the catalog's committer.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from delta_kernel_rs_spark.sources.committer import (
    FileSystemCommitter,
    InMemoryCatalogCommitter,
)
from delta_kernel_rs_spark.sources.log_segment import InvalidLogError
from delta_kernel_rs_spark.sources.snapshot import Snapshot
from delta_kernel_rs_spark.sources.storage import CommitConflict
from delta_kernel_rs_spark.sources.table import DeltaTable
from delta_kernel_rs_spark.sources.transaction import Transaction

CM_PROPS = {"delta.feature.catalogManaged": "supported"}


def _cm_table(spark, path, df):
    """Create a catalog-managed table + its (already registered) catalog."""
    t = DeltaTable.create(spark, path, df=df, properties=CM_PROPS)
    cat = InMemoryCatalogCommitter()
    cat.register(0)
    return t, cat


def _cm_snapshot(spark, t, cat, version=None):
    return Snapshot.create(
        spark,
        t.path,
        version=version,
        log_tail=cat.log_tail() or None,
        max_catalog_version=cat.max_catalog_version(),
    )


def _append_via(spark, t, cat, df):
    snap = _cm_snapshot(spark, t, cat)
    return (
        Transaction(spark, t.path, operation="WRITE", read_snapshot=snap)
        .write_data(df)
        .with_committer(cat)
        .commit()
    )


def test_filesystem_committer_matches_default(spark, tmp_path):
    # explicit FileSystemCommitter behaves exactly like the default path
    t = DeltaTable.create(spark, str(tmp_path / "t"), df=spark.range(3).toDF("x"))
    snap = t.snapshot()
    version = (
        Transaction(spark, t.path, operation="WRITE", read_snapshot=snap)
        .write_data(spark.range(3, 6).toDF("x"))
        .with_committer(FileSystemCommitter())
        .commit()
    )
    assert version == 1
    assert os.path.exists(
        os.path.join(t.path, "_delta_log", "00000000000000000001.json")
    )
    assert t.to_df().count() == 6


def test_catalog_commits_are_staged_and_readable_via_tail(spark, tmp_path):
    t, cat = _cm_table(spark, str(tmp_path / "t"), spark.range(5).toDF("x"))
    v1 = _append_via(spark, t, cat, spark.range(5, 10).toDF("x"))
    assert v1 == 1
    # nothing published: the log dir has only version 0
    log = os.path.join(t.path, "_delta_log")
    assert not os.path.exists(os.path.join(log, "00000000000000000001.json"))
    staged = os.listdir(os.path.join(log, "_staged_commits"))
    assert len(staged) == 1 and staged[0].startswith("00000000000000000001.")
    # loading without catalog context must refuse (builder.rs:397-420)
    with pytest.raises(InvalidLogError, match="catalog-managed"):
        Snapshot.create(spark, t.path)
    # ...the catalog context makes the staged commit visible
    snap = _cm_snapshot(spark, t, cat)
    assert snap.version == 1
    assert snap.scan().to_df().count() == 10


def test_catalog_stacked_staged_commits_then_publish(spark, tmp_path):
    t, cat = _cm_table(spark, str(tmp_path / "t"), spark.range(2).toDF("x"))
    _append_via(spark, t, cat, spark.range(2, 4).toDF("x"))
    _append_via(spark, t, cat, spark.range(4, 6).toDF("x"))
    snap = _cm_snapshot(spark, t, cat)
    assert snap.version == 2
    assert snap.scan().to_df().count() == 6

    published = cat.publish(t.storage, t.path)
    assert len(published) == 2
    # published deltas now listable; the catalog context is STILL required
    # (a catalog-managed table never becomes filesystem-authoritative)
    snap2 = _cm_snapshot(spark, t, cat)
    assert snap2.version == 2
    assert snap2.scan().to_df().count() == 6
    with pytest.raises(InvalidLogError, match="catalog-managed"):
        Snapshot.create(spark, t.path)
    # idempotent: second publish is a no-op
    assert cat.publish(t.storage, t.path) == []


def test_catalog_ratification_conflict(spark, tmp_path):
    t, cat = _cm_table(spark, str(tmp_path / "t"), spark.range(2).toDF("x"))
    # two transactions read the same snapshot; both try version 1
    snap = _cm_snapshot(spark, t, cat)
    t1 = (
        Transaction(spark, t.path, operation="WRITE", read_snapshot=snap)
        .write_data(spark.range(10, 12).toDF("x"))
        .with_committer(cat)
    )
    t2 = (
        Transaction(spark, t.path, operation="WRITE", read_snapshot=snap)
        .write_data(spark.range(12, 14).toDF("x"))
        .with_committer(cat)
    )
    assert t1.commit() == 1
    # blind append: loser retries against the tail-aware snapshot -> v2
    assert t2.commit() == 2
    snap = _cm_snapshot(spark, t, cat)
    assert snap.scan().to_df().count() == 6


def test_filesystem_committer_refuses_publish(spark, tmp_path):
    t = DeltaTable.create(spark, str(tmp_path / "t"), df=spark.range(2).toDF("x"))
    with pytest.raises(ValueError, match="publish"):
        FileSystemCommitter().publish(t.storage, t.path)


def test_catalog_managed_commit_requires_committer(spark, tmp_path):
    """A direct filesystem commit on a catalog-managed table would bypass
    ratification — the transaction must refuse."""
    t, cat = _cm_table(spark, str(tmp_path / "t"), spark.range(3).toDF("x"))
    snap = _cm_snapshot(spark, t, cat)
    txn = Transaction(
        spark, t.path, operation="WRITE", read_snapshot=snap
    ).write_data(spark.range(3, 6).toDF("x"))
    with pytest.raises(ValueError, match="committer"):
        txn.commit()
    # with the committer it lands (staged)
    assert txn.with_committer(cat).commit() == 1


def test_catalog_context_validation(spark, tmp_path):
    """Reference validate_catalog_managed_build_inputs/_result rules."""
    from delta_kernel_rs_spark.sources.log_segment import LogTailEntry

    # mcv on a NON-catalog-managed table is refused
    plain = DeltaTable.create(
        spark, str(tmp_path / "p"), df=spark.range(2).toDF("x")
    )
    with pytest.raises(InvalidLogError, match="non-catalog-managed"):
        Snapshot.create(spark, plain.path, max_catalog_version=0)

    t, cat = _cm_table(spark, str(tmp_path / "t"), spark.range(2).toDF("x"))
    _append_via(spark, t, cat, spark.range(2, 4).toDF("x"))
    tail = cat.log_tail()
    # staged commits without mcv
    with pytest.raises(InvalidLogError, match="max_catalog_version"):
        Snapshot.create(spark, t.path, log_tail=tail)
    # requested version above the catalog tip
    with pytest.raises(InvalidLogError, match="exceeds"):
        Snapshot.create(
            spark, t.path, version=5, log_tail=tail, max_catalog_version=1
        )
    # tail must end at the catalog tip when no time travel is requested
    with pytest.raises(InvalidLogError, match="not at max catalog version"):
        Snapshot.create(spark, t.path, log_tail=tail, max_catalog_version=7)
    # non-contiguous tail
    gap = [tail[0], LogTailEntry(tail[0].version + 2, tail[0].path)]
    with pytest.raises(InvalidLogError, match="contiguous"):
        Snapshot.create(
            spark, t.path, log_tail=gap, max_catalog_version=tail[0].version + 2
        )


def test_unknown_feature_property_refused(spark, tmp_path):
    with pytest.raises(ValueError, match="unknown table feature"):
        DeltaTable.create(
            spark,
            str(tmp_path / "t"),
            df=spark.range(2).toDF("x"),
            properties={"delta.feature.timeTravelPlusPlus": "supported"},
        )
    # enablement keys materialize into the protocol, not the configuration
    t, cat = _cm_table(spark, str(tmp_path / "u"), spark.range(2).toDF("x"))
    snap = _cm_snapshot(spark, t, cat)
    assert "delta.feature.catalogManaged" not in snap.metadata.configuration
    assert "catalogManaged" in (snap.protocol.writer_features or [])
    assert "catalogManaged" in (snap.protocol.reader_features or [])


def test_catalog_committer_refused_on_plain_table(spark, tmp_path):
    """Staged commits need catalog context, and that context needs the
    feature — a catalog committer on a plain table must fail fast, not
    produce commits that later read back as invalid."""
    t = DeltaTable.create(spark, str(tmp_path / "t"), df=spark.range(3).toDF("x"))
    txn = Transaction(
        spark, t.path, operation="WRITE", read_snapshot=t.snapshot()
    ).write_data(spark.range(3, 6).toDF("x"))
    with pytest.raises(ValueError, match="non-catalog-managed"):
        txn.with_committer(InMemoryCatalogCommitter())
    # a filesystem committer is always fine
    assert txn.with_committer(FileSystemCommitter()).commit() == 1


def test_feature_enablement_lists_active_legacy_features(spark, tmp_path):
    """A delta.feature.* opt-in that raises the protocol to r3/w7 must
    also list every ACTIVE legacy feature (Delta spec: at the
    table-features protocol, nothing is implicit) — columnMapping here."""
    t = DeltaTable.create(
        spark,
        str(tmp_path / "t"),
        df=spark.range(3).toDF("x"),
        properties={
            "delta.columnMapping.mode": "name",
            "delta.feature.catalogManaged": "supported",
        },
    )
    cat = InMemoryCatalogCommitter()
    cat.register(0)
    snap = _cm_snapshot(spark, t, cat)
    assert "columnMapping" in (snap.protocol.writer_features or [])
    assert "columnMapping" in (snap.protocol.reader_features or [])
    assert snap.protocol.min_reader_version == 3
    assert snap.protocol.min_writer_version == 7


# ---------------------------------------------------------------------------
# REST contract double (sources/catalog_rest.py): the same committer seam,
# exercised through the HTTP-shaped wire contract — request/response bodies
# per unity-catalog-delta-client-api/src/models.rs, paths per
# unity-catalog-delta-rest-client/src/clients/uc_client.rs, committer flow
# per delta-kernel-unity-catalog/src/committer.rs.
# ---------------------------------------------------------------------------

from delta_kernel_rs_spark.sources.catalog_rest import (  # noqa: E402
    MAX_UNPUBLISHED_COMMITS,
    CatalogHttpError,
    RestCatalogCommitter,
    UCCatalogServer,
    UCRestClient,
    WireCommit,
    add_commit,
    assert_table_uuid,
    set_latest_backfilled_version,
)


@pytest.fixture(params=["inproc", "http"])
def rest_transport(request):
    """Both sides of the transport seam: the in-process callable, and the
    SAME server behind a real loopback HTTP socket (bytes on a wire,
    genuine status codes/headers — unity-catalog-delta-rest-client/src/
    http.rs parity). Every REST case runs against both."""
    from delta_kernel_rs_spark.sources.catalog_rest import (
        HttpTransport,
        serve_catalog_http,
    )

    httpds = []

    def make(server):
        if request.param == "http":
            try:
                httpd, base = serve_catalog_http(server)
            except OSError as e:  # sandbox forbids loopback sockets
                pytest.skip(f"loopback HTTP unavailable: {e}")
            httpds.append(httpd)
            return HttpTransport(base)
        return server.handle

    yield make
    for h in httpds:
        h.shutdown()
        h.server_close()


def _rest_table(spark, path, df, make_transport):
    """Catalog-managed table enrolled with a REST catalog server double."""
    t = DeltaTable.create(spark, path, df=df, properties=CM_PROPS)
    server = UCCatalogServer()
    uid = server.register_table("main", "ds", "tbl", t.path, published_tip=0)
    client = UCRestClient(make_transport(server))
    committer = RestCatalogCommitter(client, "main", "ds", "tbl", uid)
    return t, server, client, committer


def test_rest_commit_ratifies_and_tail_loads(spark, tmp_path, rest_transport):
    """Full loop over the wire: staged write -> add-commit POST ->
    load_table-driven log tail -> snapshot sees the staged commit."""
    t, server, client, cat = _rest_table(
        spark, str(tmp_path / "t"), spark.range(5).toDF("x"), rest_transport
    )
    v1 = _append_via(spark, t, cat, spark.range(5, 10).toDF("x"))
    assert v1 == 1
    # staged only — nothing published
    log = os.path.join(t.path, "_delta_log")
    assert not os.path.exists(os.path.join(log, "00000000000000000001.json"))
    # the tail comes from GET load_table's inline commits, newest-first on
    # the wire, ascending in the LogTailEntry list
    resp = client.load_table("main", "ds", "tbl")
    assert [c["version"] for c in resp["commits"]] == [1]
    assert resp["latest-table-version"] == 1
    snap = _cm_snapshot(spark, t, cat)
    assert snap.version == 1
    assert snap.scan().to_df().count() == 10


def test_rest_version_conflict_retries_via_tail(spark, tmp_path, rest_transport):
    """Two writers race version 1; the 409 surfaces as CommitConflict and
    the transaction rebases against the getCommits-driven tail."""
    t, server, client, cat = _rest_table(
        spark, str(tmp_path / "t"), spark.range(2).toDF("x"), rest_transport
    )
    snap = _cm_snapshot(spark, t, cat)
    t1 = (
        Transaction(spark, t.path, operation="WRITE", read_snapshot=snap)
        .write_data(spark.range(10, 12).toDF("x"))
        .with_committer(cat)
    )
    t2 = (
        Transaction(spark, t.path, operation="WRITE", read_snapshot=snap)
        .write_data(spark.range(12, 14).toDF("x"))
        .with_committer(cat)
    )
    assert t1.commit() == 1
    assert t2.commit() == 2  # blind append rebased to the next version
    snap = _cm_snapshot(spark, t, cat)
    assert snap.version == 2
    assert snap.scan().to_df().count() == 6


def test_rest_publish_then_backfill_prunes_catalog_commits(spark, tmp_path, rest_transport):
    """publish = atomic copy (already-exists ok); the catalog learns the
    published tip on the NEXT commit (committer.rs:204-215) and prunes its
    unpublished list (in_memory.rs:59-61,69-73)."""
    t, server, client, cat = _rest_table(
        spark, str(tmp_path / "t"), spark.range(2).toDF("x"), rest_transport
    )
    _append_via(spark, t, cat, spark.range(2, 4).toDF("x"))
    _append_via(spark, t, cat, spark.range(4, 6).toDF("x"))
    published = cat.publish(t.storage, t.path)
    assert [p.rsplit("/", 1)[-1] for p in published] == [
        "00000000000000000001.json",
        "00000000000000000002.json",
    ]
    # the catalog still lists 1..2 (it has not heard about the publish)
    assert [c["version"] for c in client.load_table("main", "ds", "tbl")["commits"]] == [2, 1]
    # next commit piggybacks set-latest-backfilled-version=2 -> pruned to [3]
    _append_via(spark, t, cat, spark.range(6, 8).toDF("x"))
    assert [c["version"] for c in client.load_table("main", "ds", "tbl")["commits"]] == [3]
    snap = _cm_snapshot(spark, t, cat)
    assert snap.version == 3
    assert snap.scan().to_df().count() == 8
    # publish is idempotent under put-if-absent races
    again = cat.publish(t.storage, t.path)
    assert [p.rsplit("/", 1)[-1] for p in again] == ["00000000000000000003.json"]


def test_rest_wire_validation(spark, tmp_path, rest_transport):
    """Server-side contract rules: singleton updates, required add-commit,
    uuid assertion, contiguous versions, unpublished-commit backpressure."""
    t, server, client, cat = _rest_table(
        spark, str(tmp_path / "t"), spark.range(2).toDF("x"), rest_transport
    )
    wc = WireCommit(1, 0, "00000000000000000001.x.json", 10, 0)
    # duplicate add-commit: rejected client-side AND server-side (models.rs:114)
    with pytest.raises(CatalogHttpError, match="more than one add-commit"):
        client.update_table(
            "main", "ds", "tbl",
            requirements=[], updates=[add_commit(wc), add_commit(wc)],
        )
    import json as _json

    status, _ = server.handle(
        "POST", "delta/v1/catalogs/main/schemas/ds/tables/tbl", None,
        _json.dumps(
            {"requirements": [], "updates": [add_commit(wc), add_commit(wc)]}
        ).encode(),
    )
    assert status == 400
    # add-commit is required (in_memory.rs:43-45)
    with pytest.raises(CatalogHttpError, match="add-commit update is required"):
        client.update_table(
            "main", "ds", "tbl",
            requirements=[], updates=[set_latest_backfilled_version(0)],
        )
    # stale table uuid (dropped+recreated table): 409
    with pytest.raises(CommitConflict, match="uuid mismatch"):
        client.update_table(
            "main", "ds", "tbl",
            requirements=[assert_table_uuid("not-the-uuid")],
            updates=[add_commit(wc)],
        )
    # version gap: 409 (in_memory.rs:47-53)
    with pytest.raises(CommitConflict, match="expected commit version 1"):
        client.update_table(
            "main", "ds", "tbl", requirements=[],
            updates=[add_commit(WireCommit(4, 0, "f", 1, 0))],
        )
    # unknown table: 404
    with pytest.raises(CatalogHttpError, match="not found"):
        client.load_table("main", "ds", "nope")
    # backpressure at MAX_UNPUBLISHED_COMMITS ratified-but-unpublished
    for v in range(1, MAX_UNPUBLISHED_COMMITS + 1):
        client.update_table(
            "main", "ds", "tbl", requirements=[],
            updates=[add_commit(WireCommit(v, 0, f"{v:020d}.u.json", 1, 0))],
        )
    with pytest.raises(CatalogHttpError, match="max unpublished"):
        client.update_table(
            "main", "ds", "tbl", requirements=[],
            updates=[
                add_commit(
                    WireCommit(
                        MAX_UNPUBLISHED_COMMITS + 1, 0, "f.json", 1, 0
                    )
                )
            ],
        )


def test_rest_config_and_create_flow(spark, tmp_path, rest_transport):
    """Session handshake + staging-table/create-table registration
    (uc_client.rs:108-196): reserve a staging table, commit v0 directly to
    the published path (committer.rs:134-150), then promote it."""
    server = UCCatalogServer()
    client = UCRestClient(rest_transport(server))
    cfg = client.get_config("main", ["1.1"])
    assert cfg["protocol-version"] == "1.0"
    assert any("staging-tables" in e for e in cfg["endpoints"])

    staged = client.create_staging_table("main", "ds", "newtbl")
    uid = staged["table-id"]
    assert staged["table-type"] == "MANAGED"
    # the engine creates the delta table at its own location (v0 direct)
    path = str(tmp_path / "newtbl")
    t = DeltaTable.create(spark, path, df=spark.range(3).toDF("x"), properties=CM_PROPS)
    resp = client.create_table("main", "ds", "newtbl", uid, location=t.path)
    assert resp["metadata"]["table-uuid"] == uid
    assert resp["metadata"]["location"] == t.path
    # re-registering is a conflict
    with pytest.raises(CatalogHttpError, match="already registered"):
        client.create_table("main", "ds", "newtbl", uid)
    # the registered table now takes REST commits
    cat = RestCatalogCommitter(client, "main", "ds", "newtbl", uid)
    assert _append_via(spark, t, cat, spark.range(3, 6).toDF("x")) == 1
    snap = _cm_snapshot(spark, t, cat)
    assert snap.scan().to_df().count() == 6


def test_rest_dml_rides_the_contract(spark, tmp_path, rest_transport):
    """A DV delete on a catalog-managed table commits through the REST
    seam end-to-end (staged + ratified, visible only via the tail)."""
    from delta_kernel_rs_spark.sources.delete import delete_with_dvs

    t, server, client, cat = _rest_table(
        spark, str(tmp_path / "t"), spark.range(100).toDF("x"), rest_transport
    )
    # attaching the committer routes the table's snapshot loads AND every
    # DML transaction through the catalog (DeltaTable._route)
    t.committer = cat
    v = delete_with_dvs(t, "x >= 90")
    assert v == 1
    snap = _cm_snapshot(spark, t, cat)
    assert snap.scan().to_df().count() == 90


def test_rest_concurrent_commit_race_over_http(spark, tmp_path, rest_transport):
    """6 committer threads race the catalog's next-version slot through
    the transport simultaneously (over the real socket in the http
    param): ratification must be atomic — every loser gets a 409 and
    retries at the refreshed version, the ledger ends contiguous with
    one commit per version, and the replayed snapshot sees all rows."""
    import threading

    from delta_kernel_rs_spark.sources.storage import CommitConflict, LocalStorage

    t, server, client, cat = _rest_table(
        spark, str(tmp_path / "t"), spark.range(2).toDF("x"), rest_transport
    )
    storage = LocalStorage()
    n = 6
    barrier = threading.Barrier(n)
    landed: dict[int, int] = {}
    errors: list[Exception] = []

    def writer(i: int):
        # pre-serialized single-action commit payload (no SparkSession in
        # threads); version re-targets on conflict like the transaction
        payload_for = lambda v: (
            json.dumps({"commitInfo": {"operation": "WRITE", "writer": i}})
            + "\n"
        ).encode()
        barrier.wait()
        version = 1
        for _ in range(40):
            try:
                resp = cat.commit(storage, t.path, version, payload_for(version))
                landed[i] = resp.version
                return
            except CommitConflict:
                version = max(c.version for c in cat._catalog_commits()) + 1
        errors.append(RuntimeError(f"writer {i} never committed"))

    threads = [threading.Thread(target=writer, args=(i,)) for i in range(n)]
    for th in threads:
        th.start()
    for th in threads:
        th.join(60)
    assert not errors
    assert sorted(landed.values()) == list(range(1, n + 1))  # contiguous
    resp = client.load_table("main", "ds", "tbl")
    assert resp["latest-table-version"] == n
    assert [c["version"] for c in resp["commits"]] == list(range(n, 0, -1))
