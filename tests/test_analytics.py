"""Analytics query suite: spark-vs-duckdb parity at sf0.001 (fast smoke).

The full sf0.01 comparison is scripts/check_oracle.py (and the driver gate).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_queries_have_oracles():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    assert qs, "no queries registered"
    missing = set(oracles) - set(qs)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(entry_mod.queries()))
def test_query_matches_oracle(spark, duck, name):
    from scripts.check_oracle import compare

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    spark_pdf = qs[name](spark, SF_SMOKE).toPandas()
    if name not in oracles:
        pytest.skip("no oracle (rows-only check)")
    duck_pdf = duck.sql(oracles[name]).df()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, problems
