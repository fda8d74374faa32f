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
