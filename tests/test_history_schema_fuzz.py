"""Differential fuzz of the transaction-log layer under SCHEMA EVOLUTION.

test_history_fuzz.py drives 11 DML op kinds on a fixed schema; this wave
(r10 VERDICT next #2) extends the op pool into the known-hardest
interaction space — mid-history ADD/RENAME/DROP/WIDEN COLUMN under column
mapping, mergeSchema appends, CDF enable/disable toggles, and property
changes — interleaved with the same DML, checkpoints, restores.

Properties asserted per sampled version:

1. **Final state + time travel**: ``to_df(version=v)`` returns exactly
   the model rows AND exactly the model's schema-as-of-v columns (a
   rename must change the column name at that version, a drop must stop
   projecting the physical column that is still in every old parquet).
2. **CDF error taxonomy** (reference table_changes/mod.rs:90-162 CDF
   enablement + :378-385 schema-boundary rule): a sampled range must
   RAISE iff (a) CDF is disabled as of the range start or end version,
   (b) any commit in the range carries a metaData action whose
   configuration does not say enableChangeDataFeed=true — established
   from the ACTUAL commit JSON on disk, not re-modeled — or (c) the
   start and end schemas differ. Otherwise it must serve.
3. **CDF fold**: on served ranges whose base schema matches the end
   schema, ``state(v1) ⊕ changes(v1+1..v2) == state(v2)`` with full row
   dicts (extras included); net_changes agrees with the keyed diff.
4. **Replay-through-checkpoint**: a fresh reader post-checkpoint sees
   the final state with the final schema.

Knobs: SPARK_GRAFT_SCHEMAFUZZ_OPS (default 22), SPARK_GRAFT_SCHEMAFUZZ_SEED.
"""

from __future__ import annotations

import json
import os
import random
from pathlib import Path

import pytest
from pyspark.sql import types as T

from delta_kernel_rs_spark.sources.cdf import (
    ChangeDataFeedError,
    net_changes,
    table_changes,
)
from delta_kernel_rs_spark.sources.delete import delete_with_dvs
from delta_kernel_rs_spark.sources.table import DeltaTable

SEED = int(os.environ.get("SPARK_GRAFT_SCHEMAFUZZ_SEED", "20260816"))
# default ops bounded to fit the driver's verify window (r13; see
# tests/slow_default_skip.txt header) — SPARK_GRAFT_FULL_TESTS=1 restores
# the full 22-op trace, and the explicit _OPS knob still wins
_FULL = bool(os.environ.get("SPARK_GRAFT_FULL_TESTS"))
N_OPS = int(os.environ.get("SPARK_GRAFT_SCHEMAFUZZ_OPS", "22" if _FULL else "12"))

CATS = ["a", "b", "c", None, "x=y/ü %"]

_SPARK_T = {"int": T.IntegerType(), "long": T.LongType()}


def _mkdf(spark, rows, extras):
    """rows: list of dicts with uid/val/cat + every extra column."""
    ddl = "uid long, val long, cat string" + "".join(
        f", `{n}` {dt}" for n, dt in extras
    )
    data = [
        tuple([r["uid"], r["val"], r["cat"]] + [r.get(n) for n, _ in extras])
        for r in rows
    ]
    return spark.createDataFrame(data, ddl)


def _commit_meta_cdf_flags(path: str) -> dict[int, bool]:
    """Ground truth for the CDF gate: which commits carry a metaData
    action, and whether its configuration says enableChangeDataFeed=true.
    Read from the actual log — never re-modeled from the op trace."""
    out: dict[int, bool] = {}
    for f in (Path(path) / "_delta_log").glob("*.json"):
        stem = f.name[:-5]
        if not stem.isdigit():
            continue  # compacted ranges etc.
        flag = None
        for line in f.read_text().splitlines():
            if '"metaData"' not in line:
                continue
            try:
                md = json.loads(line).get("metaData")
            except ValueError:
                continue
            if md:
                flag = (md.get("configuration") or {}).get(
                    "delta.enableChangeDataFeed"
                ) == "true"
        if flag is not None:
            out[int(stem)] = flag
    return out


def _run_history(spark, path: str, rng: random.Random, facade_appends=False):
    if facade_appends:
        from delta_kernel_rs_spark.sources.batch_source import register_batch_source

        register_batch_source(spark)
    next_uid = 0
    ncol = 0
    extras: list[tuple[str, str]] = []  # (name, "int"|"long"), schema order
    cdf_on = True
    prop_n = 0

    def fresh_rows(k):
        nonlocal next_uid
        rows = []
        for u in range(next_uid, next_uid + k):
            r = {"uid": u, "val": rng.randrange(1000), "cat": rng.choice(CATS)}
            for n, _ in extras:
                r[n] = rng.randrange(100) if rng.random() < 0.8 else None
            rows.append(r)
        next_uid += k
        return rows

    state: dict[int, dict] = {}
    rows0 = fresh_rows(rng.randrange(15, 30))
    t = DeltaTable.create(
        spark,
        path,
        df=_mkdf(spark, rows0, extras).repartition(3),
        partition_by=["cat"],
        properties={
            "delta.enableChangeDataFeed": "true",
            "delta.enableDeletionVectors": "true",
            "delta.columnMapping.mode": "name",
        },
    )
    state.update({r["uid"]: dict(r) for r in rows0})

    def snap_state():
        return {
            "rows": {u: dict(r) for u, r in state.items()},
            "sig": tuple(extras),
            "cdf": cdf_on,
        }

    states: dict[int, dict] = {0: snap_state()}

    ops = [
        "append",
        "append",
        "append_merge",
        "delete_cow",
        "delete_dv",
        "update",
        "upsert",
        "replace_where",
        "optimize",
        "restore",
        "checkpoint",
        "add_column",
        "rename_column",
        "drop_column",
        "widen_column",
        "set_prop",
        "cdf_toggle",
    ]
    trace = []
    for _ in range(N_OPS):
        op = rng.choice(ops)
        if op in ("rename_column", "drop_column", "widen_column") and not extras:
            op = "add_column"
        trace.append(op)
        if op == "append":
            rows = fresh_rows(rng.randrange(4, 15))
            df = _mkdf(spark, rows, extras).repartition(rng.choice([1, 2]))
            if facade_appends:
                # the user-visible writer must track every evolved schema
                # (physical names, field ids) the API ops produce
                df.write.format("delta_kernel").option("path", path).mode(
                    "append"
                ).save()
            else:
                t.append(df)
            state.update({r["uid"]: dict(r) for r in rows})
        elif op == "append_merge":
            # mergeSchema append: brand-new column + data in ONE commit
            name = f"e{ncol}"
            ncol += 1
            extras.append((name, "long"))
            for r in state.values():
                r[name] = None
            rows = fresh_rows(rng.randrange(3, 8))
            t.append(_mkdf(spark, rows, extras), merge_schema=True)
            state.update({r["uid"]: dict(r) for r in rows})
        elif op in ("delete_cow", "delete_dv"):
            m, r_ = rng.choice([3, 5, 7]), rng.randrange(3)
            if op == "delete_cow":
                t.delete(f"uid % {m} = {r_}")
            else:
                delete_with_dvs(t, f"uid % {m} = {r_}")
            for u in [u for u in state if u % m == r_]:
                del state[u]
        elif op == "update":
            m, r_ = rng.choice([3, 5, 7]), rng.randrange(3)
            bump = rng.randrange(1, 5) * 1000
            t.update(f"uid % {m} = {r_}", {"val": f"val + {bump}"})
            for u in [u for u in state if u % m == r_]:
                state[u]["val"] += bump
        elif op == "upsert":
            existing = rng.sample(sorted(state), min(len(state), 6))
            rows = []
            for u in existing:
                r = {"uid": u, "val": rng.randrange(1000), "cat": state[u]["cat"]}
                for n, _ in extras:
                    r[n] = rng.randrange(100)
                rows.append(r)
            rows += fresh_rows(rng.randrange(1, 5))
            t.upsert(_mkdf(spark, rows, extras), ["uid"])
            state.update({r["uid"]: dict(r) for r in rows})
        elif op == "replace_where":
            c = rng.choice([v for v in CATS if v is not None])
            rows = fresh_rows(rng.randrange(2, 6))
            for r in rows:
                r["cat"] = c
            t.overwrite_where(_mkdf(spark, rows, extras), f"cat = '{c}'")
            for u in [u for u, r in state.items() if r["cat"] == c]:
                del state[u]
            state.update({r["uid"]: dict(r) for r in rows})
        elif op == "optimize":
            t.optimize()
        elif op == "restore":
            target = rng.choice(sorted(states))
            t.restore(version=target)
            tgt = states[target]
            state = {u: dict(r) for u, r in tgt["rows"].items()}
            extras = list(tgt["sig"])
            cdf_on = tgt["cdf"]
        elif op == "checkpoint":
            t.checkpoint(v2=rng.random() < 0.2)
        elif op == "add_column":
            name = f"e{ncol}"
            ncol += 1
            dt = rng.choice(["int", "long"])
            t.add_column(name, _SPARK_T[dt])
            extras.append((name, dt))
            for r in state.values():
                r[name] = None
        elif op == "rename_column":
            i = rng.randrange(len(extras))
            old, dt = extras[i]
            new = old + "r"
            t.rename_column(old, new)
            extras[i] = (new, dt)
            for r in state.values():
                r[new] = r.pop(old)
        elif op == "drop_column":
            i = rng.randrange(len(extras))
            name, _ = extras.pop(i)
            t.drop_column(name)
            for r in state.values():
                r.pop(name, None)
        elif op == "widen_column":
            ints = [i for i, (_, dt) in enumerate(extras) if dt == "int"]
            if not ints:
                trace[-1] = "widen_skip"
            else:
                i = rng.choice(ints)
                name, _ = extras[i]
                t.widen_column(name, T.LongType())
                extras[i] = (name, "long")
        elif op == "set_prop":
            t.set_properties({"user.fuzz": str(prop_n)})
            prop_n += 1
        elif op == "cdf_toggle":
            cdf_on = not cdf_on
            t.set_properties({"delta.enableChangeDataFeed": str(cdf_on).lower()})
        v = t.snapshot().version
        states[v] = snap_state()
    return t, states, trace


def _read_state(t, version=None):
    df = t.to_df(version=version)
    cols = set(df.columns)
    rows = {r["uid"]: {c: r[c] for c in df.columns} for r in df.collect()}
    return cols, rows


def _expected_rows(st):
    return {u: dict(r) for u, r in st["rows"].items()}


def _cols_of(st):
    return {"uid", "val", "cat"} | {n for n, _ in st["sig"]}


def _expect_cdf_error(t, states, meta_cdf, s, e) -> bool:
    if not states[e]["cdf"] or not states[s]["cdf"]:
        return True
    if any(meta_cdf.get(v) is False for v in range(s, e + 1)):
        return True
    if states[s]["sig"] != states[e]["sig"]:
        return True
    # sig equality can still hide a metadata-only StructType difference
    # (e.g. typeWidening epoch history after restore+re-widen) — the
    # boundary rule compares full schemas, so consult them when sig ties
    if s < e and t.snapshot(version=s).schema != t.snapshot(version=e).schema:
        return True
    return False


def _check_history(spark, t, path, states, trace, rng, n_tt=6, n_ranges=8):
    ctx = f"trace={trace}"
    versions = sorted(states)
    # versions must be contiguous or the as-of model lookups are ambiguous
    assert versions == list(range(versions[0], versions[-1] + 1)), ctx

    # 1. final state + schema, then sampled time travel
    final = states[max(versions)]
    cols, rows = _read_state(t)
    assert cols == _cols_of(final), ctx
    assert rows == _expected_rows(final), ctx
    from delta_kernel_rs_spark.sources.batch_source import register_batch_source

    register_batch_source(spark)
    for v in sorted(rng.sample(versions, min(n_tt, len(versions)))):
        cols, rows = _read_state(t, version=v)
        assert cols == _cols_of(states[v]), f"{ctx} version={v} cols"
        assert rows == _expected_rows(states[v]), f"{ctx} version={v}"
        # twin: the user-visible facade reader must see the same rows AND
        # the same schema-as-of-v (column mapping resolved per version)
        fdf = (
            spark.read.format("delta_kernel")
            .option("path", path)
            .option("versionAsOf", v)
            .load()
        )
        fcols = set(fdf.columns)
        frows = {r["uid"]: {c: r[c] for c in fdf.columns} for r in fdf.collect()}
        assert fcols == _cols_of(states[v]), f"{ctx} facade version={v} cols"
        assert frows == _expected_rows(states[v]), f"{ctx} facade version={v}"

    # 2+3. CDF error taxonomy + fold on sampled ranges
    meta_cdf = _commit_meta_cdf_flags(path)
    pairs = set()
    while len(pairs) < n_ranges:
        v1, v2 = sorted(rng.sample(versions, 2))
        pairs.add((v1, v2))
    served = errored = 0
    for v1, v2 in sorted(pairs):
        s = v1 + 1
        if _expect_cdf_error(t, states, meta_cdf, s, v2):
            with pytest.raises(ChangeDataFeedError):
                table_changes(spark, path, s, v2).collect()
            errored += 1
            continue
        changes = table_changes(spark, path, s, v2)
        rows = [r.asDict() for r in changes.collect()]
        served += 1
        if states[v1]["sig"] != states[v2]["sig"]:
            # schema changed exactly at commit s (metadata-only): the range
            # serves (boundary schemas equal) but the fold base is v1 —
            # a different shape; serving without error IS the assertion
            continue
        folded = {u: dict(r) for u, r in states[v1]["rows"].items()}
        by_version: dict[int, list] = {}
        for row in rows:
            by_version.setdefault(row["_commit_version"], []).append(row)
        value_cols = sorted(_cols_of(states[v2]) - {"uid"})
        for v in sorted(by_version):
            upserts, deletes = {}, set()
            for row in by_version[v]:
                ct = row["_change_type"]
                img = {c: row[c] for c in value_cols}
                if ct == "delete":
                    deletes.add(row["uid"])
                elif ct in ("insert", "update_postimage"):
                    upserts[row["uid"]] = img
                else:
                    assert ct == "update_preimage", f"{ctx} ct={ct}"
            for u in deletes - set(upserts):
                folded.pop(u, None)
            for u, img in upserts.items():
                folded[u] = {"uid": u, **img}
        assert folded == _expected_rows(states[v2]), f"{ctx} fold [{s},{v2}]"
        got_net = {
            r["uid"]: {c: r[c] for c in value_cols}
            for r in net_changes(changes, ["uid"]).collect()
        }
        touched = {r["uid"] for r in rows}
        want_net = {
            u: {c: states[v2]["rows"][u][c] for c in value_cols}
            for u in touched
            if u in states[v2]["rows"]
        }
        assert got_net == want_net, f"{ctx} net [{s},{v2}]"

    # 4. fresh reader through a forced checkpoint
    t.checkpoint()
    t2 = DeltaTable(spark, path)
    cols, rows = _read_state(t2)
    assert cols == _cols_of(final) and rows == _expected_rows(final), ctx
    return served, errored


def test_schema_fuzz_main_seed(spark, tmp_path):
    rng = random.Random(SEED)
    path = str(tmp_path / "t")
    t, states, trace = _run_history(spark, path, rng)
    _check_history(spark, t, path, states, trace, rng)


@pytest.mark.parametrize("seed", [7, 1311, 90210])
def test_schema_fuzz_more_seeds(spark, tmp_path, seed):
    rng = random.Random(seed)
    path = str(tmp_path / f"t{seed}")
    t, states, trace = _run_history(spark, path, rng)
    _check_history(spark, t, path, states, trace, rng, n_tt=4, n_ranges=5)


@pytest.mark.parametrize("seed", [404, 20260820])
def test_schema_fuzz_facade_appends(spark, tmp_path, seed):
    """Schema evolution + the facade writer: every append goes through
    df.write.format('delta_kernel') while columns are added/renamed/
    dropped/widened around it — the sink re-resolves the evolved schema
    (physical names under column mapping) per write."""
    rng = random.Random(seed)
    path = str(tmp_path / f"tf{seed}")
    t, states, trace = _run_history(spark, path, rng, facade_appends=True)
    _check_history(spark, t, path, states, trace, rng, n_tt=4, n_ranges=5)
