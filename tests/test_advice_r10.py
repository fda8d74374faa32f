"""Pins for the round-10 review's advice items.

- ``arrow_fs_and_path``: ``file://`` URIs with a non-empty authority must
  not silently become relative paths; file paths are verbatim, never
  URI-decoded.
- The hive-sentinel literal guard moved IN-PLAN (``raise_error`` inside
  the staging write job) so it is deterministic with what was actually
  written even when the source plan is non-deterministic — the old
  post-write probe re-evaluated the input plan and could miss the row
  that landed on disk.
- ``_json_line`` is ONE serializer shared by both commit paths
  (transaction.py and the SparkSession-free pycommit.py) so the
  nullable-map contract can never diverge between them.
- The Spark skipping rewriter and py_skipping twin agree on LIKE over a
  NULL partition value (pinned in test_skipping_rules.py).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_kernel_rs_spark.sources.delta_paths import arrow_fs_and_path
from delta_kernel_rs_spark.sources.table import DeltaTable


def test_file_uri_empty_authority():
    fs, p = arrow_fs_and_path("file:///tmp/x/y.parquet")
    assert p == "/tmp/x/y.parquet"


def test_file_uri_localhost_authority():
    fs, p = arrow_fs_and_path("file://localhost/tmp/x")
    assert p == "/tmp/x"


def test_file_uri_remote_authority_rejected():
    with pytest.raises(ValueError, match="authority"):
        arrow_fs_and_path("file://otherhost/tmp/x")


def test_file_path_verbatim_never_decoded():
    # a percent-encoded spelling stays literal — callers decode first
    fs, p = arrow_fs_and_path("/tmp/cat=a%20b/part.parquet")
    assert p == "/tmp/cat=a%20b/part.parquet"


def test_shared_json_line_single_serializer():
    from delta_kernel_rs_spark.sources import pycommit, transaction
    from delta_kernel_rs_spark.sources.actions_json import json_line

    assert transaction._json_line is json_line
    assert pycommit._json_line is json_line
    # the contract itself: null struct fields dropped, null map entries kept
    line = json_line(
        {"add": {"path": "p", "partitionValues": {"a": None}, "stats": None}}
    )
    assert line == '{"add":{"path":"p","partitionValues":{"a":null}}}'


SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("p", T.StringType()),
    ]
)


def test_hive_sentinel_refused_under_nondeterministic_plan(spark, tmp_path):
    """The guard must fire on what the WRITE JOB produced, not on a
    re-evaluation of the source plan: derive the sentinel through rand()
    (plan-level non-deterministic; outcome-certain) and assert refusal."""
    df = (
        spark.range(3)
        .select(
            F.col("id").cast("int").alias("id"),
            F.when(F.rand(seed=7) < 2.0, F.lit("__HIVE_DEFAULT_PARTITION__"))
            .otherwise(F.lit("never"))
            .alias("p"),
        )
    )
    with pytest.raises(ValueError, match="sentinel"):
        DeltaTable.create(spark, str(tmp_path / "t"), df=df, partition_by=["p"])
    # the staging directory is cleaned up on refusal
    leftovers = [d for d in (tmp_path / "t").glob(".staging-*")] if (
        tmp_path / "t"
    ).exists() else []
    assert leftovers == []


def test_hive_sentinel_normal_nulls_still_write(spark, tmp_path):
    """Real NULL partition values (which share the sentinel DIRECTORY) are
    unaffected by the in-plan guard."""
    df = spark.createDataFrame([(0, None), (1, "z")], SCHEMA)
    t = DeltaTable.create(spark, str(tmp_path / "t2"), df=df, partition_by=["p"])
    got = {(r.id, r.p) for r in t.to_df().collect()}
    assert got == {(0, None), (1, "z")}
