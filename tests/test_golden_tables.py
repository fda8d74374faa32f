"""The reference's own golden-table compatibility corpus, run against THIS
engine (kernel/tests/golden_data/*.tar.zst; harness mirrors
kernel/tests/integration/golden_tables.rs).

Each archive holds a real Delta table (``<name>/delta``) plus the expected
full-scan output (``<name>/expected`` parquet). The positive list below is
exactly the reference's ``golden_test!(..., latest_snapshot_test)`` set
(minus its own ``skip_test!`` entries); the negative list is its
``negative_test!`` set. Passing this suite is the direct statement that
the engine reads the same compatibility corpus the reference gates on:
decimals (legacy + dictionary-encoded), nested structs/arrays/maps,
escaped/special-character paths, column mapping (name AND id mode), DVs
(partitioned, checkpointed, under column mapping), timestamp encodings
(int96/millis/micros/ntz in both mapping modes), classic + multi-part +
v2 checkpoints, log-replay dedup key cases, and state-reconstruction
failure modes.
"""

from __future__ import annotations

import decimal
import math
import os

import pytest

from delta_kernel_rs_spark.tarzst import extract_table

from delta_kernel_rs_spark.sources.snapshot import Snapshot

GOLDEN_DIR = "/root/reference/kernel/tests/golden_data"
EXTRACT_ROOT = "/tmp/dkrs_golden_tables"

#: golden_test!(..., latest_snapshot_test) in golden_tables.rs, minus its
#: skip_test! names (each reference skip reason noted there).
POSITIVE = [
    "124-decimal-decode-bug",
    "125-iterator-bug",
    "basic-decimal-table",
    "basic-decimal-table-legacy",
    "basic-with-inserts-deletes-checkpoint",
    "basic-with-inserts-merge",
    "basic-with-inserts-overwrite-restore",
    "basic-with-inserts-updates",
    "basic-with-vacuum-protocol-check-feature",
    "corrupted-last-checkpoint-kernel",
    "data-reader-array-complex-objects",
    "data-reader-array-primitives",
    "data-reader-date-types-America",
    "data-reader-date-types-Asia",
    "data-reader-date-types-Etc",
    "data-reader-date-types-Iceland",
    "data-reader-date-types-Jst",
    "data-reader-date-types-Pst",
    "data-reader-date-types-utc",
    "data-reader-escaped-chars",
    "data-reader-map",
    "data-reader-nested-struct",
    "data-reader-nullable-field-invalid-schema-key",
    "data-reader-primitives",
    "data-reader-timestamp_ntz",
    "data-reader-timestamp_ntz-id-mode",
    "data-reader-timestamp_ntz-name-mode",
    "data-skipping-basic-stats-all-types",
    "data-skipping-basic-stats-all-types-checkpoint",
    "data-skipping-basic-stats-all-types-columnmapping-name",
    "data-skipping-change-stats-collected-across-versions",
    "data-skipping-partition-and-data-column",
    "decimal-various-scale-precision",
    "deltalog-getChanges",
    "dv-partitioned-with-checkpoint",
    "dv-with-columnmapping",
    "kernel-timestamp-int96",
    "kernel-timestamp-pst",
    "kernel-timestamp-timestamp_micros",
    "kernel-timestamp-timestamp_millis",
    "log-replay-dv-key-cases",
    "log-replay-latest-metadata-protocol",
    "log-replay-special-characters",
    "log-replay-special-characters-a",
    "multi-part-checkpoint",
    "only-checkpoint-files",
    "parquet-decimal-dictionaries",
    "parquet-decimal-dictionaries-v2",
    "parquet-decimal-type",
    "snapshot-data0",
    "snapshot-data1",
    "snapshot-data2",
    "snapshot-data2-deleted",
    "snapshot-data3",
    "snapshot-repartitioned",
    "snapshot-vacuumed",
    "table-with-columnmapping-mode-id",
    "table-with-columnmapping-mode-name",
    "time-travel-partition-changes-a",
    "time-travel-partition-changes-b",
    "time-travel-schema-changes-a",
    "time-travel-schema-changes-b",
    "time-travel-start",
    "time-travel-start-start20",
    "time-travel-start-start20-start40",
    "v2-checkpoint-json",
    "v2-checkpoint-parquet",
]

#: negative_test! — loading the latest snapshot must fail.
NEGATIVE = [
    "deltalog-invalid-protocol-version",
    "deltalog-state-reconstruction-from-checkpoint-missing-metadata",
    "deltalog-state-reconstruction-from-checkpoint-missing-protocol",
    "deltalog-state-reconstruction-without-metadata",
    "deltalog-state-reconstruction-without-protocol",
    "no-delta-log-folder",
    "versions-not-contiguous",
]


def _extract(name: str) -> str:
    # archives carry stale Hadoop .crc sidecars from their original
    # write; Hadoop's LocalFileSystem would fail checksum validation
    # against them (the reference engine reads via object stores /
    # pyarrow, which ignore them) — extract_table drops them
    dest = extract_table(GOLDEN_DIR, name, EXTRACT_ROOT)
    assert os.path.isdir(dest), f"archive {name} did not produce {dest}"
    return dest


def _table_dir(root: str) -> str:
    for cand in ("delta", "table"):
        p = os.path.join(root, cand)
        if os.path.isdir(p):
            return p
    return root  # some archives ARE the table dir


def _norm(v):
    """Engine-independent canonical value for sorting/comparison."""
    from datetime import date, datetime

    from pyspark.sql import Row

    if v is None:
        return ("\x00null",)
    if isinstance(v, Row):
        return ("row", tuple(_norm(x) for x in v))
    if isinstance(v, dict):
        return ("map", tuple(sorted((_norm(k), _norm(x)) for k, x in v.items())))
    if isinstance(v, (list, tuple)):
        return ("arr", tuple(_norm(x) for x in v))
    if isinstance(v, bytes):
        return ("bin", v.hex())
    if isinstance(v, bytearray):
        return ("bin", bytes(v).hex())
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", v.hex())
    if isinstance(v, datetime):
        return ("ts", v.isoformat())
    if isinstance(v, date):
        return ("d", v.isoformat())
    return (type(v).__name__, v)


def _rows(df, cols):
    return sorted(tuple(_norm(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", POSITIVE)
def test_golden_latest_snapshot(spark, name):
    root = _extract(name)
    table = _table_dir(root)
    expected_dir = os.path.join(root, "expected")
    assert os.path.isdir(expected_dir), f"{name} has no expected/ dir"

    snap = Snapshot.create(spark, table)
    actual = snap.scan().to_df()
    expected = spark.read.parquet(expected_dir)

    a_types = {f.name: f.dataType.simpleString() for f in actual.schema.fields}
    e_types = {f.name: f.dataType.simpleString() for f in expected.schema.fields}
    assert set(a_types) == set(e_types), f"{name}: column sets differ"
    for c in e_types:
        assert a_types[c] == e_types[c], (
            f"{name}.{c}: {a_types[c]} != {e_types[c]}"
        )
    cols = sorted(e_types)
    assert _rows(actual, cols) == _rows(expected, cols), f"{name}: values differ"


def test_golden_checkpoint_loads_from_checkpoint(spark):
    """golden_tables.rs checkpoint_test: version 14 resolved through the
    checkpoint; metadata-only like the reference (the archive carries no
    data files — checkpoint_test asserts version + scan metadata)."""
    root = _extract("checkpoint")
    snap = Snapshot.create(spark, _table_dir(root))
    assert snap.version == 14
    assert snap.scan().scan_files_df().count() >= 1


@pytest.mark.parametrize("name", NEGATIVE)
def test_golden_negative(spark, name):
    root = _extract(name)
    with pytest.raises(Exception):
        snap = Snapshot.create(spark, _table_dir(root))
        # some corruption only surfaces at scan/replay time
        snap.scan().to_df().collect()


def test_golden_delete_re_add_same_file(spark):
    """Replay semantics the reference SKIPS ("test not yet implemented",
    golden_tables.rs): add foo + bar, remove foo, re-add foo in a later
    transaction. The expected state is documented in the skip comment —
    two live files, and the surviving `foo` is the RE-ADD (modification
    time 1700000000000), not the original. Newest-wins max_by dedup must
    resolve the add-remove-add chain to the final add."""
    root = _extract("delete-re-add-same-file-different-transactions")
    snap = Snapshot.create(spark, _table_dir(root))
    files = (
        snap.scan()
        .scan_files_df()
        .select("file_path", "modification_time")
        .collect()
    )
    names = {f.file_path.rsplit("/", 1)[-1]: f.modification_time for f in files}
    assert set(names) == {"foo", "bar"}
    assert names["foo"] == 1700000000000
