"""e2e-mirror suite: the reference's own end-to-end test queries
(reference tests/e2e.rs) run against the recreated fixtures through this
engine's SQL front door, asserting the *known answers* — stronger than the
reference's mostly ran-without-error assertions.

Sections mirror e2e.rs suite names: udfs_smoke, udfs, udfs_lambda,
aggregations, federation, eval_udf.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def fx(spark, engine):
    from clickhouse_datafusion_spark.fixtures import create_reference_fixtures

    create_reference_fixtures(spark, db="fixtures")
    return engine


# -- udfs_smoke / udfs (e2e.rs:556-866) ------------------------------------

def test_projection_arith_and_udf(fx):
    rows = fx.sql("""
        SELECT p.id * 2 AS id2, clickhouse(upper(p.name), 'Utf8') AS un
        FROM clickhouse.fixtures.people p ORDER BY p.id
    """).collect()
    assert [(r.id2, r.un) for r in rows] == [(2, "ALICE"), (4, "BOB")]


def test_filter_on_udf(fx):
    # e2e.rs: WHERE clickhouse(exp(col),'Float64') > threshold
    rows = fx.sql("""
        SELECT id FROM clickhouse.fixtures.people
        WHERE clickhouse(exp(id), 'Float64') > 5 ORDER BY id
    """).collect()
    assert [r.id for r in rows] == [2]  # e^1≈2.7, e^2≈7.4


def test_scalar_only_udf(fx):
    # e2e.rs:856-866: scalar-only clickhouse() evaluated locally
    r = fx.sql("SELECT clickhouse(abs(-2), 'Int64') AS a").collect()[0]
    assert r.a == 2


def test_case_when_with_udf_branches(fx):
    rows = fx.sql("""
        SELECT CASE WHEN id = 1 THEN clickhouse(upper(name), 'Utf8')
                    ELSE clickhouse(lower(name), 'Utf8') END AS n
        FROM clickhouse.fixtures.people ORDER BY id
    """).collect()
    assert [r.n for r in rows] == ["ALICE", "bob"]


def test_to_string_and_base64(fx):
    r = fx.sql("""
        SELECT clickhouse(toString(id), 'Utf8') AS s,
               clickhouse(`base64Encode`(name), 'Utf8') AS b
        FROM clickhouse.fixtures.people WHERE id = 1
    """).collect()[0]
    assert r.s == "1"
    import base64

    assert base64.b64decode(r.b).decode() == "Alice"


# -- udfs_lambda (e2e.rs:1087-1216) ---------------------------------------

def test_array_map_concat_column(fx):
    # arrayMap($x, concat($x, p2.id), p2.names) — lambda body referencing an
    # outer column (e2e.rs:1113-1121)
    r = fx.sql("""
        SELECT clickhouse(`arrayMap`($x, concat($x, p2.id), p2.names),
                          'List(Utf8)') AS upper_names
        FROM clickhouse.fixtures.people2 p2 WHERE p2.id = 1
    """).collect()[0]
    assert r.upper_names == ["Buddha1", "Zugus1", "Lulu1", "Kitty1", "Mitty1"]


def test_array_map_in_subquery_join(fx):
    # e2e.rs:1126-1143: lambda inside a derived table joined to people
    rows = fx.sql("""
        SELECT p.name, p2.id, p2.names
        FROM clickhouse.fixtures.people p
        JOIN (SELECT id,
                     clickhouse(`arrayMap`($x, concat($x, ' hello'), names),
                                'List(Utf8)') AS names
              FROM clickhouse.fixtures.people2) p2
          ON p.id = p2.id
        ORDER BY p.id
    """).collect()
    assert rows[0].names[0] == "Buddha hello"
    assert rows[1].names[0] == "Jazz hello"


def test_array_map_two_params(fx):
    # e2e.rs:1147-1160: arrayMap($x, $y, concat($x, $y, id), names, names)
    r = fx.sql("""
        SELECT clickhouse(`arrayMap`($x, $y, concat($x, $y, p2.id),
                                     p2.names, p2.names), 'List(Utf8)') AS nn
        FROM clickhouse.fixtures.people2 p2 WHERE p2.id = 1
    """).collect()[0]
    assert r.nn[0] == "BuddhaBuddha1"


def test_lambda_wrapper(fx):
    # e2e.rs:1165-1177: clickhouse(lambda(`arrayMap`(...)), 'List(Utf8)')
    r = fx.sql("""
        SELECT clickhouse(lambda(`arrayMap`($x, concat($x, p2.id), p2.names)),
                          'List(Utf8)') AS un
        FROM clickhouse.fixtures.people2 p2 WHERE p2.id = 1
    """).collect()[0]
    assert r.un[-1] == "Mitty1"


def test_array_filter_length(fx):
    # e2e.rs:1181-1191: arrayFilter($x, length($x) > 3, names); with > 4 the
    # filter visibly drops Lulu (len 4) and Jazz/Kaya (4) from row 2
    rows = fx.sql("""
        SELECT p2.id,
               clickhouse(`arrayFilter`($x, length($x) > 3, p2.names),
                          'List(Utf8)') AS long_names,
               clickhouse(`arrayFilter`($x, length($x) > 4, p2.names),
                          'List(Utf8)') AS longer_names
        FROM clickhouse.fixtures.people2 p2 ORDER BY p2.id
    """).collect()
    assert rows[0].long_names == ["Buddha", "Zugus", "Lulu", "Kitty", "Mitty"]
    assert rows[0].longer_names == ["Buddha", "Zugus", "Kitty", "Mitty"]
    assert rows[1].longer_names == ["Vienna", "Susie", "Georgie"]
    assert rows[2].long_names == ["Susana", "Adrienne", "Blayke"]


def test_array_exists_jazz(fx):
    # e2e.rs:1206-1216: arrayExists($x, $x = 'Jazz', names) → Boolean
    rows = fx.sql("""
        SELECT p2.id, clickhouse(`arrayExists`($x, $x = 'Jazz', p2.names),
                                 'Boolean') AS has_jazz
        FROM clickhouse.fixtures.people2 p2 ORDER BY p2.id
    """).collect()
    assert [r.has_jazz for r in rows] == [False, True, False]


def test_array_join_unnest(fx):
    # README.md:186 + e2e.rs UNNEST coverage: arrayJoin expands rows
    rows = fx.sql("""
        SELECT clickhouse(`arrayJoin`(p2.names), 'Utf8') AS n
        FROM clickhouse.fixtures.people2 p2 WHERE p2.id = 3
    """).collect()
    assert [r.n for r in rows] == ["Susana", "Adrienne", "Blayke"]


# -- eval_udf (e2e.rs:1705-1741) ------------------------------------------

def test_clickhouse_eval(fx):
    rows = fx.sql("""
        SELECT id, clickhouse_eval('exp(id)', 'Float64') AS e,
               clickhouse_eval('upper(name)', 'Utf8') AS un
        FROM clickhouse.fixtures.people ORDER BY id
    """).collect()
    assert abs(rows[0].e - 2.718281828) < 1e-6
    assert rows[1].un == "BOB"


# -- aggregations (e2e.rs:1893-2038) --------------------------------------

def test_aggregation_suite(fx):
    r = fx.sql("""
        SELECT count(*) AS n, count(DISTINCT name) AS nd,
               sum(id) AS s, avg(id) AS a, min(id) AS mn, max(id) AS mx
        FROM clickhouse.fixtures.people2
    """).collect()[0]
    assert (r.n, r.nd, r.s, r.a, r.mn, r.mx) == (3, 3, 6, 2.0, 1, 3)


def test_group_by_having_on_join(fx):
    # examples/03_joins.rs:148-162: order totals per user with HAVING
    rows = fx.sql("""
        SELECT u.name, count(*) AS n, sum(o.total) AS total
        FROM clickhouse.fixtures.users u
        JOIN clickhouse.fixtures.orders_f o ON u.user_id = o.user_id
        GROUP BY u.name HAVING count(*) >= 1
        ORDER BY total DESC
    """).collect()
    assert rows[0].name == "Bob" and abs(rows[0].total - 500.75) < 1e-9
    assert rows[1].name == "Alice" and rows[1].n == 3


def test_left_join_null_department_user(fx):
    # Dave has no orders → LEFT JOIN nulls (examples/03_joins.rs:131-145)
    rows = fx.sql("""
        SELECT u.name, o.order_id
        FROM clickhouse.fixtures.users u
        LEFT JOIN clickhouse.fixtures.orders_f o ON u.user_id = o.user_id
        WHERE o.order_id IS NULL
    """).collect()
    assert [r.name for r in rows] == ["Dave"]


# -- federation (e2e.rs:680-745) ------------------------------------------

def test_memory_table_federation_join(fx):
    # mem_events (in-memory temp view) ⋈ fixture people (catalog view)
    rows = fx.sql("""
        SELECT p.name, m.event_id
        FROM clickhouse.fixtures.people p
        JOIN mem_events m ON p.id = m.event_id
        ORDER BY p.id
    """).collect()
    assert [(r.name, r.event_id) for r in rows] == [("Alice", 1), ("Bob", 2)]


def test_window_over_udf_ordering(fx):
    # e2e.rs:935-950: window ordered by UDF result
    rows = fx.sql("""
        SELECT id, SUM(id) OVER (ORDER BY clickhouse(exp(id), 'Float64')) AS rt
        FROM clickhouse.fixtures.people2 ORDER BY id
    """).collect()
    assert [r.rt for r in rows] == [1, 3, 6]


def test_cte_with_udfs(fx):
    # README.md:213-222
    rows = fx.sql("""
        WITH processed AS (
            SELECT id, clickhouse(`arrayJoin`(names), 'Utf8') AS nick
            FROM clickhouse.fixtures.people2
        )
        SELECT count(*) AS n, count(DISTINCT nick) AS nd FROM processed
    """).collect()
    assert rows[0].n == 13 and rows[0].nd == 13


def test_show_tables_and_information(fx):
    # e2e.rs:1850-1856 SHOW TABLES
    names = {r.tableName for r in fx.sql("SHOW TABLES IN fixtures").collect()}
    assert {"people", "people2", "knicknames"} <= names


def test_explain_surface(fx):
    # e2e.rs:2184-2208 EXPLAIN works through the front door
    out = fx.sql("EXPLAIN SELECT count(*) FROM clickhouse.fixtures.people").collect()
    assert "Aggregate" in out[0][0] or "plan" in out[0][0].lower()
