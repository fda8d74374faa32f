"""Randomized multi-writer conflict fuzz (r10 VERDICT next #3).

test_concurrency_process.py races IDENTICAL blind appends across OS
processes; this wave races N real processes — each with its own
SparkSession — executing RANDOM DML (blind appends, CoW + DV deletes,
updates, OPTIMIZE, SET TBLPROPERTIES, idempotent txn-appends sharing one
appId) against one table with random timing, and asserts:

1. **No lost updates / torn history**: committed versions are contiguous.
2. **Serializable outcome**: each worker's row-level effects are confined
   to its own key range (file-level collisions still happen constantly —
   the initial rows mix every worker's keys into shared files, so
   deletes/updates/OPTIMIZE race on files), so the final table must equal
   the per-worker replay of each worker's SUCCESSFUL ops in its local
   order. Any silently-dropped or double-applied op breaks this equality.
3. **Losers fail with the RIGHT conflict kind** (reference posture:
   CommitResult::ConflictedTransaction, transaction/mod.rs:1669-1671 —
   the kernel never auto-rebases; this engine's auto-rebase extension
   must fail CLOSED): a blind append may only lose to a metadata change;
   DML may lose to touched-file overlap / metadata change / unexaminable
   commit; SET TBLPROPERTIES refuses any race (two racing property sets
   must never silently drop one winner's key — the bug this fuzz's first
   design review found in the retry loop); same-appId txn-appends obey
   exactly-once (applied txn versions strictly increase in commit order).
4. **Fresh-reader agreement** through a post-race checkpoint.

Knobs: SPARK_GRAFT_CONFLICTFUZZ_SEED, SPARK_GRAFT_CONFLICTFUZZ_OPS.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time
from pathlib import Path

import pytest

from delta_kernel_rs_spark.sources.table import DeltaTable

REPO = str(Path(__file__).resolve().parent.parent)
SEED = int(os.environ.get("SPARK_GRAFT_CONFLICTFUZZ_SEED", "20260818"))
N_OPS = int(os.environ.get("SPARK_GRAFT_CONFLICTFUZZ_OPS", "6"))
N_WORKERS = 4
SEG = 1000  # worker w owns keys [SEG*w, SEG*(w+1))
INIT_PER_WORKER = 300

_CHILD = r"""
import json, os, random, sys, time
sys.path.insert(0, {repo!r})
table_path, worker, seed, n_ops, ready_file, go_file = (
    sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), int(sys.argv[4]),
    sys.argv[5], sys.argv[6],
)
from delta_kernel_rs_spark.session import get_spark
from delta_kernel_rs_spark.sources.delete import delete_with_dvs
from delta_kernel_rs_spark.sources.table import DeltaTable
from delta_kernel_rs_spark.sources.transaction import ConcurrentModificationError

spark = get_spark(app_name=f"conflict-fuzz-w{{worker}}", cpus="3")
t = DeltaTable(spark, table_path)
t.snapshot()  # warm the handle before the barrier
rng = random.Random(seed * 1000 + worker)
lo, hi = {seg} * worker, {seg} * (worker + 1)
own_next = lo + 500

open(ready_file, "w").write("ready")
deadline = time.time() + 300
while not os.path.exists(go_file):
    if time.time() > deadline:
        raise SystemExit("barrier never opened")
    time.sleep(0.01)

OPS = ["append", "dv_delete", "cow_delete", "update", "optimize",
       "set_prop", "txn_append"]
for i in range(n_ops):
    op = rng.choice(OPS)
    rec = {{"w": worker, "i": i, "op": op, "ok": True, "version": None}}
    try:
        if op in ("append", "txn_append"):
            n = rng.randrange(10, 25)
            rows = [(own_next + j, rng.randrange(1000)) for j in range(n)]
            own_next += n
            df = spark.createDataFrame(rows, "k long, v long")
            rec["rows"] = rows
            if op == "append":
                rec["version"] = t.append(df, auto_checkpoint=False)
            else:
                rec["txn_version"] = i + 1
                v = t.append_with_txn(df, "shared-app", i + 1)
                rec["version"] = v
                rec["applied"] = v is not None
        elif op in ("dv_delete", "cow_delete", "update"):
            m, r = rng.choice([3, 5, 7]), rng.randrange(3)
            pred = f"k >= {{lo}} AND k < {{hi}} AND k % {{m}} = {{r}}"
            rec["m"], rec["r"] = m, r
            if op == "dv_delete":
                delete_with_dvs(t, pred)
            elif op == "cow_delete":
                t.delete(pred)
            else:
                bump = rng.randrange(1, 5) * 1000
                rec["bump"] = bump
                t.update(pred, {{"v": f"v + {{bump}}"}})
        elif op == "optimize":
            t.optimize()
        elif op == "set_prop":
            rec["value"] = f"{{worker}}:{{i}}"
            rec["version"] = t.set_properties({{"user.fuzz": rec["value"]}})
    except ConcurrentModificationError as e:
        rec["ok"] = False
        rec["err"] = str(e)
    except Exception as e:  # noqa: BLE001 — anything else is a fuzz finding
        rec["ok"] = False
        rec["err"] = str(e)
        rec["unexpected"] = type(e).__name__
    print("REC " + json.dumps(rec), flush=True)
    time.sleep(rng.uniform(0.0, 0.3))
print("DONE", flush=True)
"""

#: substrings a legitimate conflict error of each op kind may carry
ALLOWED_ERR = {
    "append": ("changed concurrently", "gave up"),
    "txn_append": ("app id", "changed concurrently", "gave up"),
    "dv_delete": (
        "touched file",
        "changed concurrently",
        "cannot examine",
        "gave up",
    ),
    "cow_delete": (
        "touched file",
        "changed concurrently",
        "cannot examine",
        "gave up",
    ),
    "update": (
        "touched file",
        "changed concurrently",
        "cannot examine",
        "gave up",
    ),
    "optimize": (
        "touched file",
        "changed concurrently",
        "cannot examine",
        "gave up",
    ),
    "set_prop": ("lost a commit race", "gave up"),
}


def _replay_worker(recs, expected):
    """Apply one worker's SUCCESSFUL ops, in its local order, to the
    shared key->val model. Worker key ranges are disjoint, so cross-worker
    replay order is irrelevant — any interleaving is the same function."""
    for rec in recs:
        if not rec["ok"]:
            continue
        op = rec["op"]
        if op == "append" or (op == "txn_append" and rec.get("applied")):
            for k, v in rec["rows"]:
                expected[k] = v
        elif op in ("dv_delete", "cow_delete"):
            lo, hi = SEG * rec["w"], SEG * (rec["w"] + 1)
            m, r = rec["m"], rec["r"]
            for k in [k for k in expected if lo <= k < hi and k % m == r]:
                del expected[k]
        elif op == "update":
            lo, hi = SEG * rec["w"], SEG * (rec["w"] + 1)
            m, r, bump = rec["m"], rec["r"], rec["bump"]
            for k in [k for k in expected if lo <= k < hi and k % m == r]:
                expected[k] += bump


@pytest.mark.parametrize("seed", [SEED, 31415])
def test_multi_writer_conflict_fuzz(spark, tmp_path, seed):
    path = str(tmp_path / "t")
    init = [
        (SEG * w + j, 0) for w in range(N_WORKERS) for j in range(INIT_PER_WORKER)
    ]
    # 3 shared files: every file mixes all workers' keys, so DML from
    # different workers collides at the FILE level while staying disjoint
    # at the ROW level (what makes the model exact)
    DeltaTable.create(
        spark,
        path,
        df=spark.createDataFrame(init, "k long, v long").repartition(3),
        properties={
            "delta.enableDeletionVectors": "true",
            "delta.enableChangeDataFeed": "true",
        },
    )

    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="2g")
    procs = []
    ready_files = []
    go_file = str(tmp_path / "go")
    for w in range(N_WORKERS):
        ready = str(tmp_path / f"ready{w}")
        ready_files.append(ready)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    "-c",
                    _CHILD.format(repo=REPO, seg=SEG),
                    path,
                    str(w),
                    str(seed),
                    str(N_OPS),
                    ready,
                    go_file,
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                text=True,
                env=env,
                cwd=REPO,
            )
        )
    deadline = time.time() + 300
    while not all(os.path.exists(f) for f in ready_files):
        assert time.time() < deadline, "children never became ready"
        assert all(p.poll() is None for p in procs), "a child died pre-barrier"
        time.sleep(0.1)
    Path(go_file).write_text("go")

    recs_by_worker: dict[int, list[dict]] = {w: [] for w in range(N_WORKERS)}
    for w, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker {w} exited {p.returncode}:\n{out[-2000:]}"
        assert "DONE" in out, f"worker {w} never finished:\n{out[-2000:]}"
        for line in out.splitlines():
            if line.startswith("REC "):
                recs_by_worker[w].append(json.loads(line[4:]))
        assert len(recs_by_worker[w]) == N_OPS, f"worker {w} lost records"

    all_recs = [r for w in range(N_WORKERS) for r in recs_by_worker[w]]
    ctx = f"seed={seed} recs={all_recs}"
    from collections import Counter

    print(
        "conflict-fuzz contention:",
        dict(Counter((r["op"], "ok" if r["ok"] else "conflict") for r in all_recs)),
    )

    # 3. every failure is a ConcurrentModificationError of the right kind
    for rec in all_recs:
        if rec["ok"]:
            continue
        assert "unexpected" not in rec, f"{ctx}\nnon-conflict failure: {rec}"
        allowed = ALLOWED_ERR[rec["op"]]
        assert any(s in rec["err"] for s in allowed), (
            f"{ctx}\nwrong conflict kind for {rec['op']}: {rec['err']!r}"
        )

    # 1. committed versions are contiguous (no holes, no torn commits)
    log = Path(path) / "_delta_log"
    versions = sorted(
        int(f.name[:-5]) for f in log.glob("*.json") if f.name[:-5].isdigit()
    )
    assert versions == list(range(versions[-1] + 1)), ctx

    # at least SOME contention must have materialized or the fuzz is idle
    n_commits = sum(
        1 for r in all_recs if r["ok"] and not (r["op"] == "txn_append" and not r.get("applied"))
    )
    assert n_commits > 0, ctx

    # 2. final state equals the per-worker replay of successful ops
    expected = {k: v for k, v in init}
    for w in range(N_WORKERS):
        _replay_worker(recs_by_worker[w], expected)
    t = DeltaTable(spark, path)
    got = {r.k: r.v for r in t.to_df().collect()}
    assert got == expected, (
        f"{ctx}\nmissing={sorted(set(expected) - set(got))[:20]} "
        f"extra={sorted(set(got) - set(expected))[:20]} "
        f"diff={[(k, got[k], expected[k]) for k in got if k in expected and got[k] != expected[k]][:20]}"
    )

    # exactly-once: applied txn versions strictly increase in commit order
    applied = sorted(
        (r["version"], r["txn_version"])
        for r in all_recs
        if r["op"] == "txn_append" and r["ok"] and r.get("applied")
    )
    assert all(
        a[1] < b[1] for a, b in zip(applied, applied[1:])
    ), f"{ctx} applied={applied}"

    # winner's property value is the highest-version successful set_prop
    prop_wins = [
        (r["version"], r["value"])
        for r in all_recs
        if r["op"] == "set_prop" and r["ok"]
    ]
    conf = t.snapshot().metadata.configuration
    if prop_wins:
        assert conf.get("user.fuzz") == max(prop_wins)[1], f"{ctx} {prop_wins}"
    else:
        assert "user.fuzz" not in conf, ctx

    # 4. fresh reader through a post-race checkpoint
    t.checkpoint()
    t2 = DeltaTable(spark, path)
    assert {r.k: r.v for r in t2.to_df().collect()} == expected, ctx
