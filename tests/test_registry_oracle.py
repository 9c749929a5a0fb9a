"""Replicates the driver's t2 check locally (sf0.001 for speed): every registered
query with an oracle must match DuckDB on row count, column names, and
order-insensitive values. Queries without an oracle must at least run and return a
stable schema."""

from __future__ import annotations

import pytest

from kda_flink_demo_spark import registry
from tests.conftest import SF_DIR
from tests.oracle import compare_to_oracle, duck_connect

ORACLES = registry.oracle_sql()
ALL = registry.queries()


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    df = ALL[name](spark, SF_DIR)
    compare_to_oracle(df, duck, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(ALL) - set(ORACLES)))
def test_oracle_free_query_runs(spark, name):
    df = ALL[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
