"""Run every query in the inventory against its DuckDB oracle at smoke scale.

This is the local mirror of the driver's t2 correctness gate
(CORRECTNESS_r{N}.json): every SURVEY §2 operator must hash-match DuckDB.
"""

from __future__ import annotations

import pytest

from clickhouse_datafusion_spark.queries import QUERIES
from tests.conftest import SF_SMOKE
from tests.oracle_utils import compare, duckdb_conn


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_SMOKE)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, con, name):
    qd = QUERIES[name]
    df = qd.spark_fn(spark, SF_SMOKE)
    if qd.oracle is None:
        assert df.count() >= 0  # rows-only check (driver's weaker path)
        return
    compare(df, con, qd.oracle, name)


def test_entry_contract(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    assert df.count() > 0
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 30
