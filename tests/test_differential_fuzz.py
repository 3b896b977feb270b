"""Differential query fuzzing: Spark vs DuckDB on GENERATED relational
queries (r9).

The 181 registry oracles pin fixed queries; this harness samples the
query SPACE — random projections, filter conjunctions/disjunctions,
group-bys, and aggregates over lineitem — and asserts Spark and DuckDB
agree row-for-row on the smoke fixture. Property tests caught a real
engine bug in each of the last two rounds (NULL-text LM counts r8,
subnormal cosine infinities r9) precisely because fixtures never
contain the edge class; this extends the same adversarial channel to
the relational core's predicate/aggregate algebra.

Numeric discipline (the repo's standard): sums run on DECIMAL(28,4)
casts and round once (exact + associative → engine-identical bits);
min/max/count are exact by nature; float averages are deliberately
outside the fuzzed algebra. String comparisons use only ASCII literals
drawn from the fixture's own value sets, so collation cannot diverge.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from tests.conftest import SF_SMOKE

LI = f"{SF_SMOKE}/lineitem.parquet"

NUM_COLS = {"l_orderkey": (1, 6000), "l_linenumber": (1, 7),
            "l_quantity": (1.0, 50.0), "l_extendedprice": (900.0, 100_000.0)}
STR_COLS = {"l_returnflag": ["A", "N", "R"], "l_linestatus": ["O", "F"]}
GROUP_COLS = ["l_returnflag", "l_linestatus", "l_linenumber"]
OPS = ["<", "<=", "=", ">", ">=", "<>"]


@st.composite
def _predicates(draw):
    terms = []
    for _ in range(draw(st.integers(min_value=1, max_value=3))):
        if draw(st.booleans()):
            col = draw(st.sampled_from(sorted(NUM_COLS)))
            lo, hi = NUM_COLS[col]
            if isinstance(lo, int):
                lit = draw(st.integers(min_value=lo, max_value=hi))
                lit_sql = str(lit)
            else:
                # 2dp literals: exactly representable on both sides
                lit = round(draw(st.floats(min_value=lo, max_value=hi,
                                           allow_nan=False)), 2)
                lit_sql = repr(lit)
            op = draw(st.sampled_from(OPS))
            terms.append(f"{col} {op} {lit_sql}")
        else:
            col = draw(st.sampled_from(sorted(STR_COLS)))
            val = draw(st.sampled_from(STR_COLS[col]))
            op = draw(st.sampled_from(["=", "<>"]))
            terms.append(f"{col} {op} '{val}'")
    glue = draw(st.sampled_from([" AND ", " OR "]))
    return glue.join(terms)


@st.composite
def _queries(draw):
    pred = draw(_predicates())
    keys = draw(st.lists(st.sampled_from(GROUP_COLS), unique=True,
                         min_size=0, max_size=2))
    aggs = ["CAST(count(*) AS BIGINT) AS n"]
    if draw(st.booleans()):
        col = draw(st.sampled_from(["l_quantity", "l_extendedprice"]))
        aggs.append("CAST(ROUND(sum(CAST({c} AS DECIMAL(28,4))), 2) "
                    "AS DOUBLE) AS s".format(c=col))
    if draw(st.booleans()):
        col = draw(st.sampled_from(sorted(NUM_COLS)))
        fn = draw(st.sampled_from(["min", "max"]))
        aggs.append(f"{fn}({col}) AS m")
    sel = (", ".join(keys) + (", " if keys else "")) + ", ".join(aggs)
    sql = f"SELECT {sel} FROM lineitem WHERE {pred}"
    if keys:
        sql += " GROUP BY " + ", ".join(keys)
    return sql


@pytest.fixture(scope="module")
def li_view(spark):
    df = spark.read.parquet(LI)
    df.createOrReplaceTempView("lineitem")
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * "
                f"FROM read_parquet('{LI}')")
    return spark, con


def _canon(rows):
    """None-safe order-insensitive canonical form (LEFT JOIN groups can
    carry NULL keys, which break bare tuple sorting in Python)."""
    return sorted((tuple((v is None, v) for v in r) for r in rows))


@given(_queries())
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_spark_duckdb_agree_on_generated_queries(li_view, sql):
    """Every generated predicate/aggregate query must return the same
    multiset of rows in both engines (order-insensitive, exact values —
    the decimal-sum discipline makes floats engine-identical)."""
    spark, con = li_view
    got = _canon(tuple(r) for r in spark.sql(sql).collect())
    want = _canon(con.execute(sql).fetchall())
    assert got == want, (sql, got[:3], want[:3], len(got), len(want))


ORD = f"{SF_SMOKE}/orders.parquet"


@st.composite
def _join_queries(draw):
    pred = draw(_predicates())
    o_status = draw(st.sampled_from(["O", "F", "P"]))
    o_term = draw(st.sampled_from(
        [f"o_orderstatus = '{o_status}'", "o_totalprice > 50000",
         "o_orderkey % 2 = 0"]))
    keys = draw(st.lists(
        st.sampled_from(["o_orderstatus", "l_returnflag", "o_orderpriority"]),
        unique=True, min_size=1, max_size=2))
    aggs = ["CAST(count(*) AS BIGINT) AS n",
            "CAST(ROUND(sum(CAST(l_extendedprice AS DECIMAL(28,4))), 2) "
            "AS DOUBLE) AS s",
            "min(o_orderkey) AS m"]
    join = draw(st.sampled_from(["JOIN", "LEFT JOIN"]))
    if join == "LEFT JOIN":
        # keep the left-join honest: the orders-side predicate must sit
        # in the ON clause or it silently degrades to an inner join
        sql = (f"SELECT {', '.join(keys)}, {', '.join(aggs)} "
               f"FROM lineitem LEFT JOIN orders "
               f"ON l_orderkey = o_orderkey AND {o_term} "
               f"WHERE {pred} GROUP BY {', '.join(keys)}")
    else:
        sql = (f"SELECT {', '.join(keys)}, {', '.join(aggs)} "
               f"FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
               f"WHERE ({pred}) AND {o_term} "
               f"GROUP BY {', '.join(keys)}")
    return sql


@given(_join_queries())
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_spark_duckdb_agree_on_generated_join_queries(li_view, sql):
    """Same contract over the join+aggregate algebra, including LEFT
    JOIN with ON-clause predicates (NULL-extended groups must match)."""
    spark, con = li_view
    con.execute(f"CREATE VIEW IF NOT EXISTS orders AS SELECT * "
                f"FROM read_parquet('{ORD}')")
    spark.read.parquet(ORD).createOrReplaceTempView("orders")
    got = _canon(tuple(r) for r in spark.sql(sql).collect())
    want = _canon(con.execute(sql).fetchall())
    assert got == want, (sql, got[:3], want[:3], len(got), len(want))


@st.composite
def _window_queries(draw):
    """Window-function algebra. Determinism rules: lag/lead/row_number
    get a UNIQUE full ordering (ties would make them arrival-order-
    dependent); rank/dense_rank and RANGE-framed aggregates are
    deterministic under ties (peers share ranks / frames), so their
    ORDER BY may be non-unique."""
    pred = draw(_predicates())
    pk = draw(st.sampled_from(["l_returnflag", "l_linestatus",
                               "l_linenumber"]))
    fn = draw(st.sampled_from(
        ["row_number() OVER ({win})", "rank() OVER ({win})",
         "dense_rank() OVER ({win})",
         "CAST(count(*) OVER ({win}) AS BIGINT)",
         "CAST(ROUND(sum(CAST(l_quantity AS DECIMAL(28,4))) "
         "OVER ({win}), 2) AS DOUBLE)",
         "min(l_extendedprice) OVER ({win})",
         "max(l_orderkey) OVER ({win})",
         "lag(l_linenumber, 1, -1) OVER ({win})",
         "lead(l_orderkey, 2, 0) OVER ({win})"]))
    unique_needed = fn.startswith(("row_number", "lag", "lead"))
    ok = draw(st.sampled_from(["l_quantity", "l_extendedprice",
                               "l_orderkey"]))
    order = f"{ok} {'DESC' if draw(st.booleans()) else 'ASC'}"
    if unique_needed:
        order += ", l_orderkey, l_linenumber"
    expr = fn.format(win=f"PARTITION BY {pk} ORDER BY {order}")
    return (f"SELECT l_orderkey, l_linenumber, {expr} AS w "
            f"FROM lineitem WHERE {pred}")


@given(_window_queries())
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_spark_duckdb_agree_on_generated_window_queries(li_view, sql):
    """Window algebra: ranks, RANGE-framed aggregates (decimal-exact),
    and lag/lead under a unique ordering must match row-for-row."""
    spark, con = li_view
    got = _canon(tuple(r) for r in spark.sql(sql).collect())
    want = _canon(con.execute(sql).fetchall())
    assert got == want, (sql, got[:3], want[:3], len(got), len(want))


@st.composite
def _setop_queries(draw):
    """Set operations and membership subqueries: two filtered
    projections of lineitem composed with UNION [ALL] / INTERSECT /
    EXCEPT (distinct semantics in both engines), or an IN / NOT IN /
    EXISTS subquery pivoting on order keys."""
    pred_a, pred_b = draw(_predicates()), draw(_predicates())
    cols = draw(st.sampled_from(
        ["l_returnflag, l_linestatus", "l_linenumber",
         "l_returnflag, l_linenumber"]))
    kind = draw(st.sampled_from(
        ["UNION", "UNION ALL", "INTERSECT", "INTERSECT ALL", "EXCEPT",
         "EXCEPT ALL", "IN", "NOT IN", "EXISTS"]))
    if kind.split()[0] in ("UNION", "INTERSECT", "EXCEPT"):
        return (f"SELECT {cols} FROM lineitem WHERE {pred_a} "
                f"{kind} SELECT {cols} FROM lineitem WHERE {pred_b}")
    if kind == "EXISTS":
        return (f"SELECT l_orderkey, l_linenumber FROM lineitem a "
                f"WHERE ({pred_a}) AND EXISTS (SELECT 1 FROM lineitem b "
                f"WHERE b.l_orderkey = a.l_orderkey AND ({pred_b}) "
                f"AND b.l_linenumber <> a.l_linenumber)")
    return (f"SELECT l_orderkey, l_linenumber FROM lineitem "
            f"WHERE ({pred_a}) AND l_orderkey {kind} "
            f"(SELECT l_orderkey FROM lineitem WHERE {pred_b})")


@given(_setop_queries())
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_spark_duckdb_agree_on_generated_setop_queries(li_view, sql):
    """Set-op / membership-subquery algebra, row-identical multisets."""
    spark, con = li_view
    got = _canon(tuple(r) for r in spark.sql(sql).collect())
    want = _canon(con.execute(sql).fetchall())
    assert got == want, (sql, got[:3], want[:3], len(got), len(want))


# -- r10d: double-domain arithmetic algebra ------------------------------
# The federation gate ships division only in the provably-decimal-free
# domain; this family validates that claim broadly — +,-,*,/ chains over
# DOUBLE casts with literal nonzero divisors are exact IEEE ops and must
# be bit-identical in both engines.

@st.composite
def _double_arith_queries(draw):
    col = draw(st.sampled_from(["l_quantity", "l_extendedprice"]))
    expr = f"CAST({col} AS DOUBLE)"
    for _ in range(draw(st.integers(min_value=1, max_value=3))):
        op = draw(st.sampled_from(["+", "-", "*", "/"]))
        if op == "/":
            lit = draw(st.sampled_from([2, 4, 3, 7, 10]))
        else:
            lit = draw(st.integers(min_value=1, max_value=99))
        expr = f"({expr} {op} {lit})"
    pred = draw(_predicates())
    agg = draw(st.sampled_from(["min", "max"]))
    return (f"SELECT {agg}({expr}) AS v, CAST(count(*) AS BIGINT) AS n "
            f"FROM lineitem WHERE {pred}")


@given(_double_arith_queries())
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_double_arithmetic_is_engine_identical(li_view, sql):
    """min/max over +,-,*,/ chains in the double domain: exact IEEE ops,
    identical bits in both engines — the arithmetic class the gate
    allows to ship."""
    spark, con = li_view
    got = _canon(tuple(r) for r in spark.sql(sql).collect())
    want = _canon(con.execute(sql).fetchall())
    assert got == want, (sql, got, want)
