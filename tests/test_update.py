"""UPDATE / overwrite / replaceWhere: rewrites, pruning, CDF images.

Reference semantics: kernel/src/transaction/update.rs (remove+add rewrite)
and table_changes/log_replay.rs (cdc supersedes add/remove for CDF).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from delta_kernel_rs_spark.sources.table import DeltaTable
from delta_kernel_rs_spark.sources.update import UpdateError


def _kv(spark, pairs):
    return spark.createDataFrame(pairs, "k long, v string, amt double")


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "tbl")
    return DeltaTable.create(
        spark,
        path,
        df=_kv(spark, [(i, f"v{i}", float(i)) for i in range(20)]),
    )


def test_update_basic(spark, table):
    v0 = table.snapshot().version
    table.update("k >= 15", {"v": "'HI'", "amt": "amt * 10"})
    got = {r.k: (r.v, r.amt) for r in table.to_df().collect()}
    assert len(got) == 20
    for k in range(15):
        assert got[k] == (f"v{k}", float(k))  # untouched
    for k in range(15, 20):
        assert got[k] == ("HI", float(k) * 10)
    assert table.snapshot().version == v0 + 1


def test_update_sees_pre_update_values(spark, table):
    # swap semantics: all assignments read the OLD row
    table.update("k = 3", {"v": "CAST(amt AS STRING)", "amt": "CAST(length(v) AS DOUBLE)"})
    row = {r.k: r for r in table.to_df().collect()}[3]
    assert row.v == "3.0"
    assert row.amt == 2.0  # length('v3')


def test_update_noop_and_unknown_column(spark, table):
    v0 = table.snapshot().version
    assert table.update("k > 1000", {"v": "'X'"}) == v0  # no match, no commit
    with pytest.raises(UpdateError, match="unknown columns"):
        table.update("k = 1", {"nope": "'X'"})


def test_update_rewrites_only_matched_files(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_kv(spark, [(i, f"v{i}", 0.0) for i in range(10)]))
    t.append(_kv(spark, [(i, f"v{i}", 0.0) for i in range(100, 110)]))
    files_before = {f.path for f in t.snapshot().scan().files()}
    t.update("k >= 100", {"amt": "1.0"})
    files_after = {f.path for f in t.snapshot().scan().files()}
    # the first commit's file (k<10, stats-pruned by the predicate) survives
    assert files_before & files_after, "untouched file must not be rewritten"
    got = {r.k: r.amt for r in t.to_df().collect()}
    assert all(got[k] == 1.0 for k in range(100, 110))
    assert all(got[k] == 0.0 for k in range(10))


def test_update_cdf_images(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(
        spark,
        path,
        df=_kv(spark, [(i, f"v{i}", float(i)) for i in range(10)]),
        properties={"delta.enableChangeDataFeed": "true"},
    )
    t.update("k = 4", {"v": "'POST'"})
    ch = [r for r in t.changes(1).collect()]
    by_type = {}
    for r in ch:
        by_type.setdefault(r._change_type, []).append(r)
    assert {r.k for r in by_type["update_preimage"]} == {4}
    assert by_type["update_preimage"][0].v == "v4"
    assert by_type["update_postimage"][0].v == "POST"
    # kept rows of the rewritten file must NOT surface as insert/delete
    assert "insert" not in by_type and "delete" not in by_type


def test_overwrite(spark, table):
    table.overwrite(_kv(spark, [(1000, "new", 0.5)]))
    rows = table.to_df().collect()
    assert [(r.k, r.v, r.amt) for r in rows] == [(1000, "new", 0.5)]
    # time travel still sees the old data
    assert table.snapshot(version=0).scan().to_df().count() == 20


def test_overwrite_where(spark, table):
    # replace the k>=10 half with two fresh rows
    repl = _kv(spark, [(50, "a", 1.0), (60, "b", 2.0)])
    table.overwrite_where(repl, "k >= 10")
    got = {r.k for r in table.to_df().collect()}
    assert got == set(range(10)) | {50, 60}


def test_overwrite_where_rejects_violating_rows(spark, table):
    with pytest.raises(UpdateError, match="violates the predicate"):
        table.overwrite_where(_kv(spark, [(3, "x", 0.0)]), "k >= 10")


def test_overwrite_where_cdf(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(
        spark,
        path,
        df=_kv(spark, [(i, f"v{i}", float(i)) for i in range(10)]),
        properties={"delta.enableChangeDataFeed": "true"},
    )
    t.overwrite_where(_kv(spark, [(100, "n", 0.0)]), "k >= 5")
    by_type = {}
    for r in t.changes(1).collect():
        by_type.setdefault(r._change_type, set()).add(r.k)
    assert by_type["delete"] == {5, 6, 7, 8, 9}
    assert by_type["insert"] == {100}
    assert "update_preimage" not in by_type


def test_update_partitioned_column_mapped(spark, tmp_path):
    """UPDATE on a column-mapped, partitioned table — including an
    assignment that moves rows across partitions."""
    path = str(tmp_path / "cmtbl")
    df = _kv(spark, [(i, "x" if i < 10 else "y", float(i)) for i in range(20)])
    t = DeltaTable.create(
        spark,
        path,
        df=df,
        partition_by=["v"],
        properties={"delta.columnMapping.mode": "name"},
    )
    t.update("k >= 15", {"v": "'z'", "amt": "amt + 0.5"})
    got = {r.k: (r.v, r.amt) for r in t.to_df().collect()}
    assert len(got) == 20
    for k in range(15, 20):
        assert got[k] == ("z", k + 0.5)  # moved partition, new value
    for k in range(10):
        assert got[k] == ("x", float(k))
    # partition pruning still serves the new layout
    assert {r.k for r in t.to_df(predicate="v = 'z'").collect()} == set(range(15, 20))


def test_update_on_dv_table_keeps_deletes(spark, tmp_path):
    """UPDATE of a file carrying a DV must not resurrect DV-hidden rows."""
    from delta_kernel_rs_spark.sources.delete import delete_with_dvs

    path = str(tmp_path / "dvtbl")
    t = DeltaTable.create(
        spark, path, df=_kv(spark, [(i, f"v{i}", float(i)) for i in range(10)])
    )
    delete_with_dvs(t, "k IN (2, 3)")
    t.update("k >= 0", {"amt": "amt * 10"})
    got = {r.k: r.amt for r in t.to_df().collect()}
    assert set(got) == set(range(10)) - {2, 3}
    assert got[4] == 40.0


def test_update_refused_on_append_only_table(spark, tmp_path):
    from delta_kernel_rs_spark.sources.transaction import AppendOnlyError

    t = DeltaTable.create(
        spark,
        str(tmp_path / "ao"),
        df=_kv(spark, [(1, "a", 0.0)]),
        properties={"delta.appendOnly": "true"},
    )
    with pytest.raises(AppendOnlyError):
        t.update("k = 1", {"v": "'x'"})
    with pytest.raises(AppendOnlyError):
        t.overwrite(_kv(spark, [(2, "b", 0.0)]))


def test_update_rebases_over_concurrent_append(spark, tmp_path):
    """An UPDATE built on a stale snapshot commits after a concurrent
    append lands — disjoint files rebase instead of failing — and the
    appended rows survive untouched."""
    import threading

    from delta_kernel_rs_spark.sources.transaction import Transaction

    path = str(tmp_path / "tbl")
    t = DeltaTable.create(
        spark, path, df=_kv(spark, [(i, "old", float(i)) for i in range(10)])
    )

    orig_write_data = Transaction.write_data
    appended = threading.Event()

    def racing_write_data(self, df):
        # land a concurrent append between the UPDATE's read and commit
        if not appended.is_set():
            appended.set()
            DeltaTable(spark, path).append(
                _kv(spark, [(100, "new", 1.0)]), auto_checkpoint=False
            )
        return orig_write_data(self, df)

    Transaction.write_data = racing_write_data
    try:
        t.update("k < 5", {"v": "'upd'"})
    finally:
        Transaction.write_data = orig_write_data
    got = {r.k: r.v for r in t.to_df().collect()}
    assert got[100] == "new"  # concurrent append survived
    assert all(got[k] == "upd" for k in range(5))
    assert all(got[k] == "old" for k in range(5, 10))


def test_overwrite_cdf_file_level_arms(spark, tmp_path):
    """Plain overwrite writes no cdc files: the CDF reader derives the
    row-level feed from the remove/add actions themselves (every old row
    a delete, every new row an insert)."""
    t = DeltaTable.create(
        spark,
        str(tmp_path / "ow"),
        df=_kv(spark, [(i, "old", 0.0) for i in range(5)]),
        properties={"delta.enableChangeDataFeed": "true"},
    )
    t.overwrite(_kv(spark, [(10, "new", 1.0), (11, "new", 2.0)]))
    by_type = {}
    for r in t.changes(1).collect():
        by_type.setdefault(r._change_type, set()).add(r.k)
    assert by_type["delete"] == set(range(5))
    assert by_type["insert"] == {10, 11}
