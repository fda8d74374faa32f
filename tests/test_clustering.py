"""Clustered tables (reference kernel/src/clustering.rs).

Clustering columns live in the ``delta.clustering`` domain (physical
names), the table carries the ``clustering`` writer feature, and the
clustered write layout (range-partition + sort) must actually make
stats-based file skipping effective on the clustering column.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from delta_kernel_rs_spark.sources.clustering import ClusteringError
from delta_kernel_rs_spark.sources.table import DeltaTable


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_clustered_create_metadata_and_protocol(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(1000).select("id", (F.col("id") % 7).alias("k"))
    t = DeltaTable.create(spark, path, df=df, cluster_by=["k"])
    snap = t.snapshot()
    assert snap.protocol.min_writer_version == 7
    assert "clustering" in snap.protocol.writer_features
    assert "domainMetadata" in snap.protocol.writer_features
    infos = snap.clustering_columns()
    assert [i["logical"] for i in infos] == [["k"]]
    conf = json.loads(snap.get_domain_metadata("delta.clustering"))
    assert conf == {"clusteringColumns": [["k"]]}


@pytest.fixture()
def no_aqe_coalesce(spark):
    """Tiny test data would AQE-coalesce into one shuffle partition (and
    thus one file); disable coalescing so the layout is observable."""
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "false")
    yield
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


def test_clustered_layout_enables_skipping(spark, tmp_path, no_aqe_coalesce):
    path = str(tmp_path / "t")
    # shuffled input: without clustering every file would span ~the full id
    # range and a point-range predicate could prune nothing
    df = (
        spark.range(20_000)
        .select(F.col("id"))
        .repartition(8)  # scatter ids across partitions
    )
    t = DeltaTable.create(spark, path, df=df, cluster_by=["id"])
    scan_all = t.snapshot().scan()
    n_files = scan_all.scan_files_df().count()
    assert n_files > 1
    n_hit = t.snapshot().scan(predicate="id < 1000").scan_files_df().count()
    assert n_hit < n_files  # tight per-file ranges -> real pruning
    assert _rows(t.snapshot().scan(predicate="id < 1000").to_df()) == [
        (i,) for i in range(1000)
    ]


def test_appends_keep_clustered_layout(spark, tmp_path, no_aqe_coalesce):
    path = str(tmp_path / "t")
    t = DeltaTable.create(
        spark,
        path,
        df=spark.range(5000).toDF("id").repartition(4),
        cluster_by=["id"],
    )
    t.append(spark.range(5000, 10_000).toDF("id").repartition(4))
    n_files = t.snapshot().scan().scan_files_df().count()
    n_hit = t.snapshot().scan(predicate="id >= 9500").scan_files_df().count()
    assert n_hit < n_files
    assert t.to_df().count() == 10_000


def test_clustering_validation(spark, tmp_path):
    df = spark.range(10).select("id", F.array(F.lit(1)).alias("arr"))
    with pytest.raises(ClusteringError):
        DeltaTable.create(spark, str(tmp_path / "a"), df=df, cluster_by=["nope"])
    with pytest.raises(ClusteringError):
        DeltaTable.create(spark, str(tmp_path / "b"), df=df, cluster_by=["arr"])
    with pytest.raises(ClusteringError):
        DeltaTable.create(spark, str(tmp_path / "c"), df=df, cluster_by=["id", "id"])
    with pytest.raises(ClusteringError):
        DeltaTable.create(spark, str(tmp_path / "d"), df=df, cluster_by=[])


def test_clustering_physical_names_under_column_mapping(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(100).select("id", (F.col("id") % 5).alias("k"))
    t = DeltaTable.create(
        spark,
        path,
        df=df,
        cluster_by=["k"],
        properties={"delta.columnMapping.mode": "name"},
    )
    snap = t.snapshot()
    conf = json.loads(snap.get_domain_metadata("delta.clustering"))
    phys = conf["clusteringColumns"][0][0]
    assert phys.startswith("col-")  # physical, not logical
    infos = snap.clustering_columns()
    assert infos[0]["logical"] == ["k"]
    assert _rows(t.to_df()) == _rows(df)


def test_optimize_reclusters(spark, tmp_path, no_aqe_coalesce):
    path = str(tmp_path / "t")
    t = DeltaTable.create(
        spark,
        path,
        df=spark.range(2000).toDF("id").repartition(3),
        cluster_by=["id"],
    )
    for i in range(2, 5):
        t.append(spark.range(2000 * i - 2000, 2000 * i).toDF("id").repartition(3))
    before = _rows(t.to_df())
    t.optimize()
    assert _rows(t.to_df()) == before
    n_files = t.snapshot().scan().scan_files_df().count()
    n_hit = t.snapshot().scan(predicate="id < 500").scan_files_df().count()
    assert n_hit < n_files
