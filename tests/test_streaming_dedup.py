"""Cross-micro-batch streaming dedup (streaming/dedup.py): built-in
dropDuplicates state and the applyInPandasWithState ordinal tagger,
fed by the engine's own streaming append source."""

from __future__ import annotations

from pyspark.sql import functions as F

from delta_kernel_rs_spark.sources.batch_source import register_batch_source
from delta_kernel_rs_spark.sources.table import DeltaTable
from delta_kernel_rs_spark.streaming.dedup import (
    dedup_ordinals,
    streaming_first_seen,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _stream(spark, path):
    register_batch_source(spark)
    return (
        spark.readStream.format("delta_kernel")
        .option("path", path)
        .option("startingVersion", 0)
        .load()
    )


def _run(sdf, name, checkpoint=None):
    w = sdf.writeStream.format("memory").queryName(name).trigger(availableNow=True)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    q = w.start()
    q.awaitTermination(180)
    return name


def test_first_seen_drops_cross_batch_dups(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(
        spark, path, df=_docs(spark, [(1, "aa"), (2, "bb"), (3, "aa")])
    )
    t.append(_docs(spark, [(4, "bb"), (5, "cc")]))

    sdf = _stream(spark, path).withColumn("text_md5", F.md5("text"))
    _run(streaming_first_seen(sdf, ["text_md5"]), "dd1")
    got = spark.table("dd1").select("text").collect()
    assert sorted(r.text for r in got) == ["aa", "bb", "cc"]


def test_dedup_ordinals_tags_duplicates(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(
        spark, path, df=_docs(spark, [(1, "aa"), (2, "bb"), (3, "aa")])
    )
    t.append(_docs(spark, [(4, "aa"), (5, "cc")]))

    sdf = _stream(spark, path).withColumn("text_md5", F.md5("text"))
    _run(dedup_ordinals(sdf, key="text_md5"), "dd2")
    rows = spark.table("dd2").collect()
    by_text = {}
    for r in rows:
        by_text.setdefault(r.text, []).append(r.dup_ordinal)
    assert sorted(by_text["aa"]) == [0, 1, 2]
    assert sorted(by_text["bb"]) == [0]
    assert sorted(by_text["cc"]) == [0]
    # survivors = ordinal 0, one per distinct text
    assert sum(1 for r in rows if r.dup_ordinal == 0) == 3


def test_dedup_ordinals_state_survives_restart(spark, tmp_path):
    # memory sinks cannot recover a checkpoint; use a parquet sink, which
    # is also the shape a real curation pipeline lands
    path = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    t = DeltaTable.create(spark, path, df=_docs(spark, [(1, "aa"), (2, "bb")]))

    def run_once():
        sdf = _stream(spark, path).withColumn("text_md5", F.md5("text"))
        q = (
            dedup_ordinals(sdf, key="text_md5")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    run_once()
    first = {
        (r.text, r.dup_ordinal) for r in spark.read.parquet(out).collect()
    }
    assert first == {("aa", 0), ("bb", 0)}

    # new appends after the first run; restart from the same checkpoint
    t.append(_docs(spark, [(3, "aa"), (4, "cc")]))
    run_once()
    got = {(r.text, r.dup_ordinal) for r in spark.read.parquet(out).collect()}
    # 'aa' was seen once before the restart -> ordinal 1 now; 'cc' fresh
    assert got == {("aa", 0), ("bb", 0), ("aa", 1), ("cc", 0)}
