"""Cross-process ACID: the commit primitive under a REAL multi-process race.

Every prior conflict test raced writers inside one driver process
(test_delta_fixes.py); the put-if-absent commit primitive's whole claim
is CROSS-process atomicity (reference kernel/src/committer/filesystem.rs
— object-store put-if-absent; storage.py LocalStorage uses O_CREAT|O_EXCL,
which the OS guarantees across processes). This module spawns real OS
processes, each running a SparkSession-free commit loop
(sources/pycommit.py), racing each other AND a Spark-side DV delete in
the parent, against one table:

* every writer eventually commits (optimistic retry on CommitConflict),
* committed versions are contiguous with no lost updates,
* the final row count is exact (each append's rows present exactly once,
  the delete's rows gone),
* the CRC chain is valid where present and cleanly re-seeded at the tip,
* replay stays green, including through a post-race checkpoint.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import pytest
from pyspark.sql import functions as F

from delta_kernel_rs_spark.sources.crc import (
    crc_path,
    read_crc,
    write_crc_full,
)
from delta_kernel_rs_spark.sources.delete import delete_with_dvs
from delta_kernel_rs_spark.sources.storage import LocalStorage
from delta_kernel_rs_spark.sources.table import DeltaTable

N_WORKERS = 6
ROWS_PER_WORKER = 200

#: Child body: wait on the go-file barrier (so every process hits the
#: commit window together), write a parquet data file, commit it through
#: the pure-Python append path, then best-effort fold the CRC chain.
#: Prints "OK <version>" on success.
_CHILD = r"""
import json, os, sys, time, uuid
sys.path.insert(0, {repo!r})
import pyarrow as pa
import pyarrow.parquet as pq
from delta_kernel_rs_spark.sources.crc import update_crc_incremental
from delta_kernel_rs_spark.sources.pycommit import commit_append
from delta_kernel_rs_spark.sources.storage import LocalStorage

table_path, worker, rows, go_file = sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
storage = LocalStorage()
data = pa.table({{
    "k": pa.array(range(1000 * worker, 1000 * worker + rows), pa.int64()),
    "w": pa.array([worker] * rows, pa.int64()),
}})
rel = f"part-worker{{worker}}-{{uuid.uuid4().hex}}.parquet"
pq.write_table(data, f"{{table_path}}/{{rel}}")
add = {{"add": {{
    "path": rel,
    "partitionValues": {{}},
    "size": os.path.getsize(f"{{table_path}}/{{rel}}"),
    "modificationTime": int(time.time() * 1000),
    "dataChange": True,
    "stats": json.dumps({{"numRecords": rows, "min": {{}}, "max": {{}}, "nullCount": {{}}}}),
}}}}
deadline = time.time() + 60
while not os.path.exists(go_file):
    if time.time() > deadline:
        raise SystemExit("barrier never opened")
    time.sleep(0.005)
v = commit_append(storage, table_path, [add], operation="WRITE")
update_crc_incremental(None, table_path, storage, v)  # best-effort chain fold
print(f"OK {{v}}")
"""


def _ints(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(-1).cast("long").alias("w")
    )


def test_multiprocess_commit_race_acid(spark, tmp_path):
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 60))
    go_file = str(tmp_path / "go")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                "-c",
                _CHILD.format(repo=repo),
                path,
                str(i),
                str(ROWS_PER_WORKER),
                go_file,
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(N_WORKERS)
    ]
    # open the barrier, then immediately race a Spark-side DV delete from
    # THIS process against the six child committers
    with open(go_file, "w") as fh:
        fh.write("go")
    delete_with_dvs(t, "w = -1 AND k % 3 = 0")

    child_versions: list[int] = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, f"child failed: {err[-2000:]}"
        assert out.startswith("OK "), out
        child_versions.append(int(out.split()[1]))

    # -- no lost updates: versions contiguous, every writer distinct ------
    tip = t.snapshot()
    delete_versions = set(range(1, tip.version + 1)) - set(child_versions)
    assert len(child_versions) == len(set(child_versions))
    assert len(delete_versions) == 1  # the DV delete's commit
    assert tip.version == N_WORKERS + 1
    storage = LocalStorage()
    for v in range(tip.version + 1):
        assert storage.exists(f"{path}/_delta_log/{v:020d}.json")

    # -- exact final content ---------------------------------------------
    df = t.to_df()
    assert df.filter("w = -1").count() == 40  # 60 initial - 20 DV-deleted
    per_worker = {
        r["w"]: r["n"]
        for r in df.filter("w >= 0").groupBy("w").agg(F.count("*").alias("n")).collect()
    }
    assert per_worker == {i: ROWS_PER_WORKER for i in range(N_WORKERS)}
    assert df.count() == 40 + N_WORKERS * ROWS_PER_WORKER

    # -- CRC chain: valid where present, cleanly re-seeded at the tip -----
    # Concurrent folds leave gaps when a writer's predecessor hadn't folded
    # yet; any CRC that EXISTS must agree with a full recompute at that
    # version, and the tip must be (re-)seedable to the exact state.
    for v in range(tip.version + 1):
        doc = read_crc(storage, path, v)
        if doc is None:
            continue
        snap = t.snapshot(version=v)
        files = snap.scan().files()
        assert doc["numFiles"] == len(files), f"CRC v{v} numFiles"
        assert doc["tableSizeBytes"] == sum(f.size for f in files), f"CRC v{v} bytes"
    if not storage.exists(crc_path(path, tip.version)):
        assert write_crc_full(spark, path, tip)
    tip_doc = read_crc(storage, path, tip.version)
    tip_files = tip.scan().files()
    assert tip_doc["numFiles"] == len(tip_files)
    assert tip_doc["tableSizeBytes"] == sum(f.size for f in tip_files)

    # -- replay stays green through maintenance ---------------------------
    t.checkpoint()
    assert DeltaTable(spark, path).to_df().count() == 40 + N_WORKERS * ROWS_PER_WORKER


def test_multiprocess_all_blind_appends_no_coordinator(spark, tmp_path):
    """8 pure-Python processes, no Spark writer in the race at all — the
    worst-case thundering herd on one version counter. All must land."""
    n = 8
    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 10))
    go_file = str(tmp_path / "go")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD.format(repo=repo), path, str(i), "50", go_file],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(n)
    ]
    with open(go_file, "w") as fh:
        fh.write("go")
    versions = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, f"child failed: {err[-2000:]}"
        versions.append(int(out.split()[1]))
    assert sorted(versions) == list(range(1, n + 1))  # contiguous, no gaps
    assert t.to_df().count() == 10 + n * 50


def test_multiprocess_checkpoint_race_pins_its_version(spark, tmp_path):
    """r9 VERDICT next #6: a checkpoint writer racing concurrent commits.

    The reference's checkpoint is version-pinned by construction
    (kernel/src/checkpoint/mod.rs:1-90 — it snapshots, then writes THAT
    version). Here one process checkpoints version v while 6 OS
    processes commit v+1..v+6 through the pure-Python path:

    * the checkpoint contains exactly v's file set — none of the racing
      commits leak in,
    * _last_checkpoint never points above a complete, parseable
      checkpoint,
    * replay THROUGH the mid-race checkpoint (checkpoint + commit tail)
      serves the full post-race state.
    """
    import pyarrow.parquet as pq

    from delta_kernel_rs_spark.sources.checkpoint import write_checkpoint

    path = str(tmp_path / "tbl")
    t = DeltaTable.create(spark, path, df=_ints(spark, 0, 60))
    t.append(_ints(spark, 60, 90), auto_checkpoint=False)
    pin_v = t.snapshot().version  # v=1: the version the checkpoint pins
    pinned_paths = {
        f.path.rsplit("/", 1)[-1] for f in t.snapshot(version=pin_v).scan().files()
    }

    go_file = str(tmp_path / "go")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _CHILD.format(repo=repo), path, str(i), "80", go_file],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(N_WORKERS)
    ]
    # open the barrier, then checkpoint v IN the commit window
    with open(go_file, "w") as fh:
        fh.write("go")
    ck_v = write_checkpoint(spark, path, version=pin_v)
    assert ck_v == pin_v

    versions = []
    for p in procs:
        out, err = p.communicate(timeout=180)
        assert p.returncode == 0, f"child failed: {err[-2000:]}"
        versions.append(int(out.split()[1]))
    assert sorted(versions) == list(range(pin_v + 1, pin_v + 1 + N_WORKERS))

    # -- the checkpoint is exactly v's state -------------------------------
    storage = LocalStorage()
    ck_file = f"{path}/_delta_log/{pin_v:020d}.checkpoint.parquet"
    assert storage.exists(ck_file)
    ck = pq.read_table(ck_file)
    ck_adds = {
        r["path"].rsplit("/", 1)[-1]
        for r in ck.column("add").to_pylist()
        if r is not None and r.get("path")
    }
    assert ck_adds == pinned_paths  # no racing commit leaked in

    # -- _last_checkpoint points at a complete checkpoint ------------------
    hint = json.loads(
        storage.read_bytes(f"{path}/_delta_log/_last_checkpoint").decode()
    )
    assert hint["version"] == pin_v
    assert storage.exists(
        f"{path}/_delta_log/{hint['version']:020d}.checkpoint.parquet"
    )

    # -- replay through the mid-race checkpoint ----------------------------
    fresh = DeltaTable(spark, path)
    assert fresh.snapshot().version == pin_v + N_WORKERS
    assert fresh.to_df().count() == 90 + N_WORKERS * 80
    # and the checkpoint is actually CONSUMED (log segment anchors on it)
    seg = fresh.snapshot().log_segment
    assert any(str(pin_v) in p or f"{pin_v:020d}" in p for p in seg.checkpoint_parts)
