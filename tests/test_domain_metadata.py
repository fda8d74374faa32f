"""Domain metadata removal (VERDICT r3 item 10).

Reference: domain metadata actions with ``removed: true`` tombstone the
domain on replay; the checkpoint writer drops live-set and tombstoned
domains' history, keeping only live configurations.
"""

from __future__ import annotations

from delta_kernel_rs_spark.sources.table import DeltaTable
from delta_kernel_rs_spark.sources.transaction import Transaction

DOMAIN = "app.testDomain"


def _make(spark, tmp_path, orders_df):
    path = str(tmp_path / "t")
    t = DeltaTable.create(spark, path, df=orders_df)
    return path, t


def test_remove_domain_metadata(spark, tmp_path):
    df = spark.range(10).toDF("x")
    path, t = _make(spark, tmp_path, df)

    Transaction(spark, path, "SET DOMAIN", read_snapshot=t.snapshot()).with_domain_metadata(
        DOMAIN, '{"v": 1}'
    ).commit()
    assert t.snapshot().get_domain_metadata(DOMAIN) == '{"v": 1}'

    Transaction(spark, path, "REMOVE DOMAIN", read_snapshot=t.snapshot()).remove_domain_metadata(
        DOMAIN
    ).commit()
    assert t.snapshot().get_domain_metadata(DOMAIN) is None

    # re-set after removal wins again
    Transaction(spark, path, "SET DOMAIN", read_snapshot=t.snapshot()).with_domain_metadata(
        DOMAIN, '{"v": 2}'
    ).commit()
    assert t.snapshot().get_domain_metadata(DOMAIN) == '{"v": 2}'


def test_removal_survives_checkpoint(spark, tmp_path):
    df = spark.range(10).toDF("x")
    path, t = _make(spark, tmp_path, df)

    Transaction(spark, path, "SET DOMAIN", read_snapshot=t.snapshot()).with_domain_metadata(
        DOMAIN, '{"keep": false}'
    ).with_domain_metadata("app.other", '{"keep": true}').commit()
    Transaction(spark, path, "REMOVE DOMAIN", read_snapshot=t.snapshot()).remove_domain_metadata(
        DOMAIN
    ).commit()
    t.checkpoint()
    t.append(df)  # a commit after the checkpoint so the tail is non-trivial

    snap = t.snapshot()
    assert snap.log_segment.checkpoint_parts  # replay goes through the checkpoint
    assert snap.get_domain_metadata(DOMAIN) is None
    assert snap.get_domain_metadata("app.other") == '{"keep": true}'


def test_concurrent_same_domain_conflicts(spark, tmp_path):
    """Concurrent writers of the SAME domain conflict on rebase; disjoint
    domains serialize cleanly (Delta domain-metadata conflict rule)."""
    import pytest as _pytest

    from delta_kernel_rs_spark.sources.transaction import (
        ConcurrentModificationError,
        Transaction,
    )

    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=spark.range(5).toDF("x"))
    snap = t.snapshot()

    (
        Transaction(spark, path, operation="SET DOMAIN", read_snapshot=snap)
        .with_domain_metadata("app.domain", '{"v": 1}')
        .commit()
    )
    with _pytest.raises(ConcurrentModificationError, match="app.domain"):
        (
            Transaction(spark, path, operation="SET DOMAIN", read_snapshot=snap)
            .with_domain_metadata("app.domain", '{"v": 2}')
            .commit()
        )
    v = (
        Transaction(spark, path, operation="SET DOMAIN", read_snapshot=snap)
        .with_domain_metadata("other.domain", '{"v": 1}')
        .commit()
    )
    assert v == 2
