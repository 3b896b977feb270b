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


def test_raw_list_utf8_surface(spark):
    """The raw `List(Utf8)` declared-type surface (ref tests/e2e.rs:1116).

    f4b/f5b were removed from the DRIVER gate registry because its
    canonicalizer cannot sort raw array cells (queries.py:839); this test
    is the recorded substitute — it executes arrayMap/arrayFilter with
    their raw array<string> outputs and checks element values exactly.
    """
    from clickhouse_datafusion_spark.engine import ClickHouseSparkEngine
    from clickhouse_datafusion_spark.catalog import register_testdata_views

    register_testdata_views(spark, SF_SMOKE)
    eng = ClickHouseSparkEngine(spark)
    rows = eng.sql("""
        SELECT p_partkey,
               clickhouse(`arrayMap`($x, concat($x, '_p'),
                                     splitByChar(' ', p_name)),
                          'List(Utf8)') AS mapped,
               clickhouse(`arrayFilter`($x, length($x) > 5,
                                        splitByChar(' ', p_name)),
                          'List(Utf8)') AS filtered
        FROM part WHERE p_partkey <= 5""").orderBy("p_partkey").collect()
    assert rows, "expected parts with p_partkey <= 5"
    for r in rows:
        assert isinstance(r.mapped, list) and r.mapped, r
        assert all(w.endswith("_p") for w in r.mapped), r
        assert isinstance(r.filtered, list), r
        assert all(len(w) > 5 for w in r.filtered), r


def test_gate_order_is_starvation_proof():
    """The driver gate order (queries._gate_order) is mechanical: manual
    changed-this-round head, then never-gated (registration order), then
    errored, then oracle-upgraded rows-only, then oldest-round-first.
    This pins the contract so no registry entry's gate row can starve."""
    import json
    from pathlib import Path

    from clickhouse_datafusion_spark.queries import (
        _GATE_PRIORITY, _gate_order, _latest_gate_rows, QUERIES)

    order = _gate_order()
    assert sorted(order) == sorted(QUERIES), "order must cover the registry"
    latest = _latest_gate_rows()

    head_len = len([n for n in _GATE_PRIORITY if n in QUERIES])
    assert order[:head_len] == [n for n in _GATE_PRIORITY if n in QUERIES]

    # correctness history present in the repo -> never-gated come before
    # any entry with a clean gate row
    root = Path(__file__).resolve().parent.parent
    if list(root.glob("CORRECTNESS_r*.json")):
        tail = order[head_len:]
        never = [n for n in tail if n not in latest]
        if never:
            first_gated_clean = next(
                (i for i, n in enumerate(tail)
                 if n in latest and not latest[n][1]), len(tail))
            last_never = max(tail.index(n) for n in never)
            assert last_never < first_gated_clean, (
                "a never-gated entry sorted after a cleanly-gated one")
        # among cleanly-gated entries, round numbers are non-decreasing
        rounds = [latest[n][0] for n in tail
                  if n in latest and not latest[n][1]
                  and not (latest[n][1] == "no_oracle" and QUERIES[n].oracle)]
        assert rounds == sorted(rounds), "gated tail must be oldest-first"
