"""Unit tests for CDF net_changes (reference table_changes/net_changes.rs)."""

from __future__ import annotations

import pytest

from delta_kernel_rs_spark.sources.cdf import net_changes

SCHEMA = "k LONG, v STRING, _change_type STRING, _commit_version LONG"


@pytest.fixture(scope="module")
def changes(spark):
    rows = [
        # k=1: inserted, then updated (pre+post) -> latest post-image wins
        (1, "a", "insert", 0),
        (1, "a", "update_preimage", 2),
        (1, "a2", "update_postimage", 2),
        # k=2: inserted then deleted -> gone
        (2, "b", "insert", 0),
        (2, "b", "delete", 3),
        # k=3: deleted then re-inserted -> present with the new value
        (3, "c", "delete", 1),
        (3, "c2", "insert", 4),
        # k=4: plain insert
        (4, "d", "insert", 2),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_net_changes_latest_postimage_wins(changes):
    got = {r.k: r.v for r in net_changes(changes, ["k"]).collect()}
    assert got == {1: "a2", 3: "c2", 4: "d"}


def test_net_changes_columns(changes):
    out = net_changes(changes, ["k"])
    assert out.columns == ["k", "v"]


def test_net_changes_same_version_update_beats_preimage(spark):
    # insert and update in the same commit: post-image ranks above others
    rows = [
        (1, "old", "insert", 5),
        (1, "new", "update_postimage", 5),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r.k: r.v for r in net_changes(df, ["k"]).collect()}
    assert got == {1: "new"}
