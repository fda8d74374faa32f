"""UPSERT (merge-by-key) tests: updates, inserts, CDF images, net view."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_kernel_rs_spark.sources.merge import MergeError
from delta_kernel_rs_spark.sources.table import DeltaTable


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, "k long, v string")


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    return DeltaTable.create(
        spark, path, df=_kv(spark, [(i, f"v{i}") for i in range(20)])
    )


def test_upsert_updates_and_inserts(spark, table):
    src = _kv(spark, [(5, "FIVE"), (7, "SEVEN"), (100, "HUNDRED")])
    table.upsert(src, keys=["k"])
    got = {r.k: r.v for r in table.to_df().collect()}
    assert got[5] == "FIVE" and got[7] == "SEVEN"
    assert got[100] == "HUNDRED"
    assert got[3] == "v3"  # untouched rows survive the rewrite
    assert len(got) == 21


def test_upsert_pure_insert_and_noop(spark, table):
    v0 = table.snapshot().version
    table.upsert(_kv(spark, [(200, "NEW")]), keys=["k"])
    assert {r.k for r in table.to_df().collect()} == set(range(20)) | {200}
    # no-op source: no commit
    v = table.upsert(_kv(spark, []), keys=["k"])
    assert v == table.snapshot().version
    assert table.snapshot().version == v0 + 1


def test_upsert_rejects_duplicate_source_keys(spark, table):
    with pytest.raises(MergeError, match="multiple rows"):
        table.upsert(_kv(spark, [(1, "a"), (1, "b")]), keys=["k"])


def test_upsert_cdf_update_images(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(
        spark,
        path,
        df=_kv(spark, [(i, f"v{i}") for i in range(10)]),
        properties={"delta.enableChangeDataFeed": "true"},
    )
    t.upsert(_kv(spark, [(3, "THREE"), (50, "FIFTY")]), keys=["k"])
    ch = t.changes(1).collect()
    by_type = {}
    for r in ch:
        by_type.setdefault(r._change_type, []).append((r.k, r.v))
    assert by_type["update_preimage"] == [(3, "v3")]
    assert by_type["update_postimage"] == [(3, "THREE")]
    assert by_type["insert"] == [(50, "FIFTY")]
    # kept rows of the rewritten file generate NO change noise
    assert set(by_type) == {"update_preimage", "update_postimage", "insert"}

    from delta_kernel_rs_spark.sources.cdf import net_changes

    net = {r.k: r.v for r in net_changes(t.changes(0), ["k"]).collect()}
    assert net[3] == "THREE" and net[50] == "FIFTY" and net[0] == "v0"


def test_upsert_respects_existing_dvs(spark, tmp_path):
    from delta_kernel_rs_spark.sources.delete import delete_with_dvs

    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_kv(spark, [(i, f"v{i}") for i in range(20)]))
    delete_with_dvs(t, "k < 5")
    t.upsert(_kv(spark, [(10, "TEN")]), keys=["k"])
    got = {r.k: r.v for r in t.to_df().collect()}
    assert set(got) == set(range(5, 20))  # DV-deleted rows stay gone
    assert got[10] == "TEN"


# -- multi-clause MERGE ---------------------------------------------------


def _kvq(spark, triples):
    return spark.createDataFrame(triples, "k long, v string, q long")


@pytest.fixture()
def table3(spark, tmp_path):
    path = str(tmp_path / "tbl3")
    return DeltaTable.create(
        spark, path, df=_kvq(spark, [(i, f"v{i}", i * 10) for i in range(20)])
    )


def test_merge_matched_update_with_condition(spark, table3):
    """WHEN MATCHED AND cond THEN UPDATE: only qualifying matches change;
    non-qualifying matched rows pass through untouched."""
    src = _kvq(spark, [(3, "S3", 0), (4, "S4", 0)])
    table3.merge(
        src,
        on=["k"],
        when_matched_update={"v": "s.v"},
        when_matched_update_condition="t.q >= 40",
    )
    got = {r.k: (r.v, r.q) for r in table3.to_df().collect()}
    assert got[4] == ("S4", 40)  # fired: only assigned column changed
    assert got[3] == ("v3", 30)  # condition false: untouched
    assert len(got) == 20  # no inserts without an insert clause


def test_merge_matched_delete_clause(spark, table3):
    src = _kvq(spark, [(1, "x", 0), (2, "x", 0), (100, "x", 0)])
    table3.merge(
        src,
        on=["k"],
        when_matched_delete=True,
        when_matched_delete_condition="t.k % 2 = 0",
    )
    got = {r.k for r in table3.to_df().collect()}
    assert 2 not in got  # matched + condition → deleted
    assert 1 in got  # matched, condition false → kept
    assert 100 not in got  # unmatched source row, no insert clause
    assert len(got) == 19


def test_merge_three_clauses_and_cdf_images(spark, tmp_path):
    path = str(tmp_path / "tbl_cdf3")
    t = DeltaTable.create(
        spark,
        path,
        df=_kvq(spark, [(i, f"v{i}", i * 10) for i in range(10)]),
        properties={"delta.enableChangeDataFeed": "true"},
    )
    src = _kvq(
        spark,
        [
            (2, "TWO", 999),  # matched, q=20 < 50 → update
            (7, "SEVEN", 999),  # matched, q=70 >= 50 → delete
            (50, "FIFTY", 500),  # not matched, q=500 → insert
            (60, "SIXTY", 5),  # not matched, condition false → dropped
        ],
    )
    t.merge(
        src,
        on=["k"],
        when_matched_update="*",
        when_matched_update_condition="t.q < 50",
        when_matched_delete=True,
        when_not_matched_insert="*",
        when_not_matched_insert_condition="s.q >= 100",
    )
    got = {r.k: (r.v, r.q) for r in t.to_df().collect()}
    assert got[2] == ("TWO", 999)
    assert 7 not in got
    assert got[50] == ("FIFTY", 500)
    assert 60 not in got
    assert got[3] == ("v3", 30)

    by_type = {}
    for r in t.changes(1).collect():
        by_type.setdefault(r._change_type, []).append((r.k, r.v, r.q))
    assert by_type["update_preimage"] == [(2, "v2", 20)]
    assert by_type["update_postimage"] == [(2, "TWO", 999)]
    assert by_type["delete"] == [(7, "v7", 70)]
    assert by_type["insert"] == [(50, "FIFTY", 500)]
    assert set(by_type) == {
        "update_preimage",
        "update_postimage",
        "delete",
        "insert",
    }


def test_merge_clause_precedence(spark, table3):
    """Both matched clauses' conditions hold → the FIRST in precedence
    order wins (SQL MERGE clause order)."""
    src = _kvq(spark, [(5, "S5", 0)])
    table3.merge(
        src,
        on=["k"],
        when_matched_update={"v": "s.v"},
        when_matched_delete=True,  # unconditional too, but second
    )
    got = {r.k: r.v for r in table3.to_df().collect()}
    assert got[5] == "S5" and len(got) == 20  # update won, nothing deleted

    # Reversed precedence: delete wins.
    src2 = _kvq(spark, [(6, "S6", 0)])
    table3.merge(
        src2,
        on=["k"],
        when_matched_update={"v": "s.v"},
        when_matched_delete=True,
        matched_precedence=("delete", "update"),
    )
    got = {r.k for r in table3.to_df().collect()}
    assert 6 not in got and len(got) == 19


def test_merge_insert_assignments_and_defaults(spark, table3):
    """Assignment-dict insert: unassigned columns become NULL."""
    src = _kvq(spark, [(300, "NEW", 42)])
    table3.merge(
        src,
        on=["k"],
        when_not_matched_insert={"k": "s.k", "q": "s.q + 1"},
    )
    row = next(r for r in table3.to_df().collect() if r.k == 300)
    assert row.q == 43 and row.v is None


def test_merge_noop_bumps_no_version(spark, table3):
    v0 = table3.snapshot().version
    src = _kvq(spark, [(5, "v5", 50)])  # matches but condition never fires
    v = table3.merge(
        src,
        on=["k"],
        when_matched_update="*",
        when_matched_update_condition="t.q > 1000000",
        when_not_matched_insert="*",
    )
    assert v == v0
    assert table3.snapshot().version == v0


def test_merge_requires_a_clause(spark, table3):
    with pytest.raises(MergeError, match="at least one clause"):
        table3.merge(_kvq(spark, [(1, "x", 0)]), on=["k"])
