"""Differential test: every registered query with an oracle must match DuckDB
exactly at sf0.01 (the driver's correctness scale)."""

from __future__ import annotations

import pytest

from kwack_spark.plans.registry import QUERIES, _load_all
from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare_query, duck_connect

_load_all()
ORACLED = sorted(n for n, e in QUERIES.items() if e.oracle is not None)
ROWS_ONLY = sorted(n for n, e in QUERIES.items() if e.oracle is None)


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_ORACLE)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_match(spark, duck, name):
    e = QUERIES[name]
    ok, detail = compare_query(spark, duck, e.fn, e.oracle, SF_ORACLE)
    assert ok, f"{name}: {detail}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    e = QUERIES[name]
    df = e.fn(spark, SF_ORACLE)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
