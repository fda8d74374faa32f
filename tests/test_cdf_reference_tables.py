"""CDF parity against the reference's own pinned expectations.

``kernel/tests/data/cdf-*.tar.zst`` are real Delta tables the reference's
CDF integration suite (``kernel/tests/integration/features/cdf.rs``) reads
with hard-coded expected change rows. This test PARSES those expected
tables out of the Rust source at runtime (no transcription drift, nothing
copied into this repo) and asserts our ``table_changes`` produces the
identical multiset of rows for the identical (table, start, end) calls —
including the column-mapping CDF tables and the cdc+DV interleavings.
"""

from __future__ import annotations

import datetime as dt
import os
import re

import pytest

from delta_kernel_rs_spark.tarzst import extract_table

from delta_kernel_rs_spark.sources.cdf import ChangeDataFeedError, table_changes

CDF_RS = "/root/reference/kernel/tests/integration/features/cdf.rs"
DATA_DIR = "/root/reference/kernel/tests/data"
EXTRACT_ROOT = "/tmp/dkrs_cdf_reference"

_CALL = re.compile(
    r"let (?:batches|res) = read_cdf_for_table\(\s*\"([^\"]+)\",\s*(\d+),\s*"
    r"(None|\d+),\s*(None|[^)]+)\)"
)
_ROW = re.compile(r"^\s*\"\|(.*)\|\",?\s*$")


def _parse_cases():
    """[(name, start, end, header_cols, expected_rows | None)] in source
    order; expected_rows is None for the error-expecting calls."""
    src = open(CDF_RS, encoding="utf-8").read()
    calls = list(_CALL.finditer(src))
    cases = []
    for i, m in enumerate(calls):
        name, start, end, _schema = m.groups()
        seg_end = calls[i + 1].start() if i + 1 < len(calls) else len(src)
        segment = src[m.end(): seg_end]
        rows = []
        for line in segment.splitlines():
            rm = _ROW.match(line)
            if rm:
                rows.append([c.strip() for c in rm.group(1).split("|")])
            elif rows and "assert_batches_sorted_eq" in line:
                break
        if not rows:
            cases.append((name, int(start), None if end == "None" else int(end), None, None))
            continue
        header, data = rows[0], rows[1:]
        cases.append(
            (name, int(start), None if end == "None" else int(end), header, data)
        )
    return cases


CASES = _parse_cases()
POSITIVE = [c for c in CASES if c[4] is not None]
NEGATIVE = [c for c in CASES if c[4] is None]


def _extract(name: str) -> str:
    return extract_table(DATA_DIR, name, EXTRACT_ROOT)


def _stringify(v) -> str:
    """Arrow-pretty-print-compatible rendering of a cell value."""
    from pyspark.sql import Row

    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, dt.datetime):
        return v.isoformat(sep="T")
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, Row):
        d = v.asDict()
        return "{" + ", ".join(f"{k}: {_stringify(x)}" for k, x in d.items()) + "}"
    if isinstance(v, list):
        return "[" + ", ".join(_stringify(x) for x in v) + "]"
    return str(v)


def test_reference_pins_were_parsed():
    # the Rust suite pins 19 positive reads + 2 error reads today; parsing
    # fewer means the regexes rotted, not that coverage shrank
    assert len(POSITIVE) >= 15, [c[:3] for c in CASES]
    assert len(NEGATIVE) >= 2


@pytest.mark.parametrize(
    "name,start,end,header,expected",
    POSITIVE,
    ids=[f"{c[0]}@{c[1]}-{c[2]}" for c in POSITIVE],
)
def test_cdf_matches_reference_pin(spark, name, start, end, header, expected):
    from pyspark.sql import functions as F

    root = _extract(name)
    table = os.path.join(root, name) if os.path.isdir(os.path.join(root, name)) else root
    ch = table_changes(spark, table, start, end)
    # backtick-quote: cdf-table-backtick-column-names has literal dots and
    # backticks in column names
    cols = [F.col("`" + c.replace("`", "``") + "`") for c in header]
    got = sorted(
        tuple(_stringify(r[i]) for i in range(len(header)))
        for r in ch.select(*cols).collect()
    )
    want = sorted(tuple(row) for row in expected)
    assert got == want, f"{name}[{start},{end}]"


@pytest.mark.parametrize(
    "name,start,end",
    [(c[0], c[1], c[2]) for c in NEGATIVE],
    ids=[f"{c[0]}@{c[1]}-{c[2]}" for c in NEGATIVE],
)
def test_cdf_invalid_range_errors(spark, name, start, end):
    root = _extract(name)
    table = os.path.join(root, name) if os.path.isdir(os.path.join(root, name)) else root
    with pytest.raises((ChangeDataFeedError, Exception)):
        table_changes(spark, table, start, end).collect()


@pytest.mark.parametrize(
    "name,start,end,header,expected",
    POSITIVE,
    ids=[f"{c[0]}@{c[1]}-{c[2]}" for c in POSITIVE],
)
def test_facade_cdf_matches_reference_pin(spark, name, start, end, header, expected):
    """The SAME reference-pinned expectations through the facade
    (readChangeFeed option, SparkSession-free planning + executor-side
    DV diffs) — the user-facing CDF spelling must be bit-equal to the
    engine API on the reference's own tables."""
    from pyspark.sql import functions as F

    from delta_kernel_rs_spark.sources.batch_source import register_batch_source

    root = _extract(name)
    table = os.path.join(root, name) if os.path.isdir(os.path.join(root, name)) else root
    register_batch_source(spark)
    r = (
        spark.read.format("delta_kernel")
        .option("path", table)
        .option("readChangeFeed", "true")
        .option("startingVersion", start)
    )
    if end is not None:
        r = r.option("endingVersion", end)
    ch = r.load()
    cols = [F.col("`" + c.replace("`", "``") + "`") for c in header]
    got = sorted(
        tuple(_stringify(r_[i]) for i in range(len(header)))
        for r_ in ch.select(*cols).collect()
    )
    want = sorted(tuple(row) for row in expected)
    assert got == want, f"facade {name}[{start},{end}]"


@pytest.mark.parametrize(
    "name,start,end",
    [(c[0], c[1], c[2]) for c in NEGATIVE],
    ids=[f"{c[0]}@{c[1]}-{c[2]}" for c in NEGATIVE],
)
def test_facade_cdf_invalid_range_errors(spark, name, start, end):
    from delta_kernel_rs_spark.sources.batch_source import register_batch_source

    root = _extract(name)
    table = os.path.join(root, name) if os.path.isdir(os.path.join(root, name)) else root
    register_batch_source(spark)
    with pytest.raises(Exception):
        r = (
            spark.read.format("delta_kernel")
            .option("path", table)
            .option("readChangeFeed", "true")
            .option("startingVersion", start)
        )
        if end is not None:
            r = r.option("endingVersion", end)
        r.load().collect()
