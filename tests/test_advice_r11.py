"""Pins for the round-11 ADVICE items (all 'low').

1. bench.py optional-stopping guard — covered in test_bench_compare.py
   (test_adaptive_optional_stopping_guard_rejects_single_lucky_dip).
2. _scan_commit_for_pm must keep the LAST metaData/protocol occurrence,
   so a foreign compacted file carrying several P&M actions in version
   order resolves the newest one.
3. Rate-limited streams warn at runtime that one AvailableNow run is one
   bounded batch (plus the available_now_backfill helper,
   test_streaming_cdf.py).
4. file:// authority handling is case-insensitive and accepts a bare
   'localhost' authority (RFC 8089).
"""

from __future__ import annotations

import json

import pytest


# -- advice 2: last-occurrence P&M resolution --------------------------------


def _pm_lines() -> str:
    return "\n".join(
        json.dumps(a)
        for a in [
            {"metaData": {"id": "old", "schemaString": "{}"}},
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"add": {"path": "a.parquet"}},
            {"metaData": {"id": "new", "schemaString": "{}"}},
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}},
        ]
    )


def test_scan_commit_for_pm_resolves_last_occurrence():
    """A compacted file concatenates many versions' actions in version
    order; the authoritative P&M is the FINAL occurrence, not the first
    (this repo's compaction reconciles to one P&M, but a foreign writer's
    need not)."""
    from delta_kernel_rs_spark.sources.snapshot import _scan_commit_for_pm

    md, pr = _scan_commit_for_pm(_pm_lines())
    assert md["id"] == "new"
    assert (pr["minReaderVersion"], pr["minWriterVersion"]) == (3, 7)


# -- advice 3: rate limits warn about the AvailableNow caveat ----------------


def test_cdf_reader_warns_on_rate_limit(spark, tmp_path):
    from delta_kernel_rs_spark.sources.table import DeltaTable
    from delta_kernel_rs_spark.streaming.cdf_source import DeltaCdfStreamReader

    path = str(tmp_path / "t")
    DeltaTable.create(
        spark,
        path,
        df=spark.range(3).toDF("x"),
        properties={"delta.enableChangeDataFeed": "true"},
    )
    with pytest.warns(RuntimeWarning, match="NOT a full backfill"):
        DeltaCdfStreamReader(None, {"path": path, "maxcommitspertrigger": "2"})


def test_append_reader_warns_on_rate_limit(spark, tmp_path):
    from delta_kernel_rs_spark.sources.batch_source import DeltaKernelStreamReader
    from delta_kernel_rs_spark.sources.table import DeltaTable

    path = str(tmp_path / "t")
    DeltaTable.create(spark, path, df=spark.range(3).toDF("x"))
    with pytest.warns(RuntimeWarning, match="available_now_backfill"):
        DeltaKernelStreamReader(None, {"path": path, "maxfilespertrigger": "1"})


def test_unlimited_readers_do_not_warn(spark, tmp_path):
    import warnings

    from delta_kernel_rs_spark.sources.batch_source import DeltaKernelStreamReader
    from delta_kernel_rs_spark.sources.table import DeltaTable
    from delta_kernel_rs_spark.streaming.cdf_source import DeltaCdfStreamReader

    path = str(tmp_path / "t")
    DeltaTable.create(
        spark,
        path,
        df=spark.range(3).toDF("x"),
        properties={"delta.enableChangeDataFeed": "true"},
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)
        DeltaCdfStreamReader(None, {"path": path})
        DeltaKernelStreamReader(None, {"path": path})


# -- advice 4: RFC 8089 file:// authority --------------------------------------


def test_file_uri_localhost_authority_is_case_insensitive():
    from delta_kernel_rs_spark.sources.delta_paths import arrow_fs_and_path

    for spelling in ("localhost", "LOCALHOST", "LocalHost"):
        _, rel = arrow_fs_and_path(f"file://{spelling}/tmp/x")
        assert rel == "/tmp/x"


def test_file_uri_bare_localhost_means_local_root():
    from delta_kernel_rs_spark.sources.delta_paths import arrow_fs_and_path

    _, rel = arrow_fs_and_path("file://localhost")
    _, rel2 = arrow_fs_and_path("file://")
    assert rel == rel2 == ""


def test_file_uri_foreign_authority_still_rejected():
    from delta_kernel_rs_spark.sources.delta_paths import arrow_fs_and_path

    with pytest.raises(ValueError, match="authority"):
        arrow_fs_and_path("file://nas01/share/tbl")
    # and a path that merely STARTS like an authority stays rejected, not
    # silently misread as relative 'host/x'
    with pytest.raises(ValueError, match="authority"):
        arrow_fs_and_path("file://localhost2/x")
