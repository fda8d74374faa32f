"""Bounded history search: ICT-aware binary search reads O(log n) commits.

VERDICT r3 item 4: `version_at_timestamp` must not read every commit
(reference kernel/src/history_manager/search.rs; strategy
history_manager/mod.rs:71-100). Criterion: on a 64-commit log a point
lookup reads <= ~8 commit files; a non-ICT table reads exactly 1.
"""

from __future__ import annotations

import json

import pytest

import delta_kernel_rs_spark.sources.history as history_mod
from delta_kernel_rs_spark.sources.history import (
    first_version_after,
    version_at_timestamp,
)
from delta_kernel_rs_spark.sources.storage import LocalStorage


class CountingStorage(LocalStorage):
    def __init__(self):
        super().__init__()
        self.reads: list[str] = []

    def read_text(self, path: str) -> str:
        self.reads.append(path)
        return super().read_text(path)

    def commit_reads(self) -> int:
        return sum(
            1
            for p in self.reads
            if "_delta_log" in p and p.endswith(".json") and "_last_checkpoint" not in p
        )


def _fabricate_log(tmp_path, n_commits: int, ict_from: int | None = 0):
    """Hand-written n-commit log; commits >= ict_from carry ICT
    1_000_000 + 10*v. Returns (table_path, icts dict)."""
    log = tmp_path / "t" / "_delta_log"
    log.mkdir(parents=True)
    icts: dict[int, int] = {}
    for v in range(n_commits):
        lines = []
        ci: dict = {"timestamp": 1_000_000 + 10 * v, "operation": "WRITE"}
        if ict_from is not None and v >= ict_from:
            icts[v] = 1_000_000 + 10 * v
            ci["inCommitTimestamp"] = icts[v]
        lines.append(json.dumps({"commitInfo": ci}))
        if v == 0:
            lines.append(json.dumps({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}))
            lines.append(
                json.dumps(
                    {
                        "metaData": {
                            "id": "fixture",
                            "format": {"provider": "parquet", "options": {}},
                            "schemaString": '{"type":"struct","fields":[{"name":"x","type":"long","nullable":true,"metadata":{}}]}',
                            "partitionColumns": [],
                            "configuration": {},
                        }
                    }
                )
            )
        lines.append(
            json.dumps(
                {"add": {"path": f"f{v}.parquet", "partitionValues": {}, "size": 1, "modificationTime": 0, "dataChange": True}}
            )
        )
        f = log / f"{v:020d}.json"
        f.write_text("\n".join(lines))
        # coherent mtimes: same epoch as the fabricated ICTs, so mixed
        # mtime/ICT logs stay monotonic like a real table's would
        import os

        os.utime(f, ((1_000_000 + 10 * v) / 1000.0, (1_000_000 + 10 * v) / 1000.0))
    return str(tmp_path / "t"), icts


@pytest.fixture()
def counting(monkeypatch):
    storage = CountingStorage()
    monkeypatch.setattr(history_mod, "storage_for", lambda spark, path: storage)
    return storage


def test_ict_point_lookup_is_log_n_reads(spark, tmp_path, counting):
    path, icts = _fabricate_log(tmp_path, 64, ict_from=0)
    assert version_at_timestamp(spark, path, icts[37]) == 37
    assert counting.commit_reads() <= 8  # 1 newest-commit probe + <=7 bisect

    counting.reads.clear()
    assert version_at_timestamp(spark, path, icts[37] + 5) == 37
    assert counting.commit_reads() <= 8


def test_non_ict_table_reads_one_commit(spark, tmp_path, counting):
    path, _ = _fabricate_log(tmp_path, 64, ict_from=None)
    # mtimes are the only signal
    v = version_at_timestamp(spark, path, 1_000_000 + 10 * 63 + 5)
    assert v == 63
    assert counting.commit_reads() == 1  # the has-ICT probe of the newest
    counting.reads.clear()
    assert version_at_timestamp(spark, path, 1_000_000 + 10 * 20 + 5) == 20
    assert counting.commit_reads() == 1


def test_search_matches_brute_force(spark, tmp_path, counting):
    path, icts = _fabricate_log(tmp_path, 40, ict_from=0)
    ts_list = sorted(icts.items())
    for target in [icts[0], icts[0] - 1, icts[12], icts[12] + 3, icts[39], icts[39] + 100]:
        expect = None
        for v, t in ts_list:
            if t <= target:
                expect = v
        if expect is None:
            with pytest.raises(ValueError):
                version_at_timestamp(spark, path, target)
        else:
            assert version_at_timestamp(spark, path, target) == expect
        expect_after = None
        for v, t in reversed(ts_list):
            if t >= target:
                expect_after = v
        if expect_after is None:
            with pytest.raises(ValueError):
                first_version_after(spark, path, target)
        else:
            assert first_version_after(spark, path, target) == expect_after


def test_mixed_ict_enablement(spark, tmp_path, counting):
    """Commits 0-31 mtime-only, 32-63 ICT: probes below the enablement
    boundary fall back to clamped mtimes and the search stays exact in
    the ICT region."""
    path, icts = _fabricate_log(tmp_path, 64, ict_from=32)
    assert version_at_timestamp(spark, path, icts[50]) == 50
    assert version_at_timestamp(spark, path, icts[32]) >= 31


def test_mixed_ict_with_clock_skew(spark, tmp_path, counting):
    """ICT enabled mid-history on a machine whose clock ran BEHIND the
    mtime clock: the first ICT (1500) is lower than every pre-boundary
    mtime (2000+). A single mixed binary search over the non-monotonic
    sequence can return a wrong version; the region-split search must not
    (ADVICE r4; reference history_manager/mod.rs:71-100)."""
    import os

    log = tmp_path / "t" / "_delta_log"
    log.mkdir(parents=True)
    mtimes = {0: 2000, 1: 2100, 2: 2200, 3: 2300}
    icts = {4: 1500, 5: 1600, 6: 1700, 7: 1800}
    for v in range(8):
        lines = []
        ci: dict = {"timestamp": mtimes.get(v, 0) or icts.get(v), "operation": "WRITE"}
        if v in icts:
            ci["inCommitTimestamp"] = icts[v]
        lines.append(json.dumps({"commitInfo": ci}))
        if v == 0:
            lines.append(json.dumps({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}))
            lines.append(
                json.dumps(
                    {
                        "metaData": {
                            "id": "fixture",
                            "format": {"provider": "parquet", "options": {}},
                            "schemaString": '{"type":"struct","fields":[{"name":"x","type":"long","nullable":true,"metadata":{}}]}',
                            "partitionColumns": [],
                            "configuration": {},
                        }
                    }
                )
            )
        lines.append(
            json.dumps(
                {"add": {"path": f"f{v}.parquet", "partitionValues": {}, "size": 1, "modificationTime": 0, "dataChange": True}}
            )
        )
        f = log / f"{v:020d}.json"
        f.write_text("\n".join(lines))
        os.utime(f, (mtimes.get(v, 3000) / 1000.0, mtimes.get(v, 3000) / 1000.0))
    path = str(tmp_path / "t")

    # inside the ICT region: exact, despite every mtime being larger
    assert version_at_timestamp(spark, path, 1600) == 5
    assert version_at_timestamp(spark, path, 1650) == 5
    # at/above everything: the newest ICT version wins, not an mtime match
    assert version_at_timestamp(spark, path, 5000) == 7
    # below everything
    with pytest.raises(ValueError):
        version_at_timestamp(spark, path, 1400)
    # earliest-at-or-after prefers the mtime region (earliest versions)
    assert first_version_after(spark, path, 1900) == 0
    with pytest.raises(ValueError):
        first_version_after(spark, path, 5000)


def test_ict_disable_reenable_gap_is_exact(spark, tmp_path, counting):
    """ICT on (0-3), off (4-5), on again (6-9): presence is non-monotonic,
    so region binary search is invalid — a probe hitting the gap must fall
    back to the exact full index, never return a wrong version."""
    import os

    log = tmp_path / "t" / "_delta_log"
    log.mkdir(parents=True)
    icts = {0: 1000, 1: 1100, 2: 1200, 3: 1300, 6: 1600, 7: 1700, 8: 1800, 9: 1900}
    mtimes = {4: 1400, 5: 1500}
    for v in range(10):
        lines = []
        ci: dict = {"timestamp": icts.get(v, mtimes.get(v)), "operation": "WRITE"}
        if v in icts:
            ci["inCommitTimestamp"] = icts[v]
        lines.append(json.dumps({"commitInfo": ci}))
        if v == 0:
            lines.append(json.dumps({"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}))
            lines.append(
                json.dumps(
                    {
                        "metaData": {
                            "id": "fixture",
                            "format": {"provider": "parquet", "options": {}},
                            "schemaString": '{"type":"struct","fields":[{"name":"x","type":"long","nullable":true,"metadata":{}}]}',
                            "partitionColumns": [],
                            "configuration": {},
                        }
                    }
                )
            )
        lines.append(
            json.dumps(
                {"add": {"path": f"f{v}.parquet", "partitionValues": {}, "size": 1, "modificationTime": 0, "dataChange": True}}
            )
        )
        f = log / f"{v:020d}.json"
        f.write_text("\n".join(lines))
        t = icts.get(v, mtimes.get(v))
        os.utime(f, (t / 1000.0, t / 1000.0))
    path = str(tmp_path / "t")
    # brute-force expectation over the clamped effective sequence
    for target, want in [(1050, 0), (1450, 4), (1550, 5), (1650, 6), (999, None), (2500, 9)]:
        if want is None:
            with pytest.raises(ValueError):
                version_at_timestamp(spark, path, target)
        else:
            assert version_at_timestamp(spark, path, target) == want, target
