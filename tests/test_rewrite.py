"""Unit tests for the ClickHouse-surface SQL rewriter (no Spark needed).

Mirrors the reference's in-module UDF tests (src/udfs/eval.rs:144-484,
src/udfs.rs) — return-type extraction, lambda parsing, unknown-function
errors — plus catalog stripping.
"""

from __future__ import annotations

import pytest

from clickhouse_datafusion_spark.dialect import TypeParseError, ch_type_to_spark_ddl
from clickhouse_datafusion_spark.functions.registry import UnknownClickHouseFunction
from clickhouse_datafusion_spark.functions.rewrite import SqlRewriteError, rewrite_sql


# -- type mapping ----------------------------------------------------------

@pytest.mark.parametrize("ch_t,ddl", [
    ("Float64", "DOUBLE"),
    ("Int64", "BIGINT"),
    ("Int32", "INT"),
    ("UInt64", "BIGINT"),
    ("Utf8", "STRING"),
    ("String", "STRING"),
    ("Boolean", "BOOLEAN"),
    ("List(Utf8)", "ARRAY<STRING>"),
    ("Array(String)", "ARRAY<STRING>"),
    ("Nullable(Int64)", "BIGINT"),
    ("LowCardinality(String)", "STRING"),
    ("Map(String, Int64)", "MAP<STRING, BIGINT>"),
    ("Decimal(10, 2)", "DECIMAL(10, 2)"),
    ("DateTime", "TIMESTAMP"),
    ("Date", "DATE"),
    ("List(List(Int32))", "ARRAY<ARRAY<INT>>"),
])
def test_type_mapping(ch_t, ddl):
    assert ch_type_to_spark_ddl(ch_t) == ddl


def test_type_unknown():
    with pytest.raises(TypeParseError):
        ch_type_to_spark_ddl("Widget")


# -- scalar rewrites -------------------------------------------------------

def test_simple_scalar():
    out = rewrite_sql("SELECT clickhouse(exp(x), 'Float64') AS e FROM t")
    assert out == "SELECT CAST((exp(x)) AS DOUBLE) AS e FROM t"


def test_sigmoid_and_backtick():
    out = rewrite_sql("SELECT clickhouse(sigmoid(price), 'Float64') FROM p")
    assert "1.0 / (1.0 + exp(-(price)))" in out
    out = rewrite_sql("SELECT clickhouse(`base64Encode`(name), 'Utf8') FROM u")
    assert "base64(CAST(name AS BINARY))" in out


def test_nested_functions():
    out = rewrite_sql("SELECT clickhouse(abs(mod(x, 3)), 'Int64') FROM t")
    assert out == "SELECT CAST((abs(((x) % (3)))) AS BIGINT) FROM t"


def test_to_string_cast():
    out = rewrite_sql("SELECT clickhouse(toString(id), 'Utf8') FROM t")
    assert "CAST(id AS STRING)" in out


def test_scalar_only_constant():
    # reference: scalar-only clickhouse() unwrapped and evaluated locally
    # (src/analyzer/function_pushdown.rs:427-438, tests/e2e.rs:856-866)
    out = rewrite_sql("SELECT clickhouse(abs(2), 'Int64') AS a")
    assert out == "SELECT CAST((abs(2)) AS BIGINT) AS a"


def test_case_insensitive_entry():
    out = rewrite_sql("SELECT CLICKHOUSE(upper(name), 'Utf8') FROM t")
    assert "upper(name)" in out and "CAST" in out


def test_unknown_backticked_errors():
    with pytest.raises(UnknownClickHouseFunction):
        rewrite_sql("SELECT clickhouse(`noSuchFn`(x), 'Utf8') FROM t")


def test_unknown_plain_passes_through():
    # plain (non-backticked) unknown names are assumed Spark-resolvable
    out = rewrite_sql("SELECT clickhouse(levenshtein(a, b), 'Int64') FROM t")
    assert "levenshtein(a, b)" in out


def test_wrong_arity_errors():
    with pytest.raises(SqlRewriteError):
        rewrite_sql("SELECT clickhouse(exp(x)) FROM t")


# -- eval ------------------------------------------------------------------

def test_eval():
    out = rewrite_sql(
        "SELECT clickhouse_eval('exp(id)', 'Float64') AS e FROM t")
    assert out == "SELECT CAST((exp(id)) AS DOUBLE) AS e FROM t"


def test_eval_upper():
    out = rewrite_sql("SELECT clickhouse_eval('upper(name)', 'Utf8') FROM t")
    assert "upper(name)" in out


# -- lambdas / HOFs --------------------------------------------------------

def test_array_map():
    out = rewrite_sql(
        "SELECT clickhouse(`arrayMap`($x, concat($x, '_p'), names), 'List(Utf8)') FROM t")
    assert "transform(names, x -> concat(x, '_p'))" in out
    assert "AS ARRAY<STRING>" in out


def test_array_map_two_params():
    out = rewrite_sql(
        "SELECT clickhouse(`arrayMap`($x, $y, concat($x, $y), a, b), 'List(Utf8)') FROM t")
    assert "zip_with(a, b, (x, y) -> concat(x, y))" in out


def test_array_filter_with_length():
    out = rewrite_sql(
        "SELECT clickhouse(`arrayFilter`($x, length($x) > 3, names), 'List(Utf8)') FROM t")
    assert "filter(names, x -> length(x) > 3)" in out


def test_array_exists():
    out = rewrite_sql(
        "SELECT clickhouse(`arrayExists`($x, $x = 'Jazz', names), 'Boolean') FROM t")
    assert "exists(names, x -> x = 'Jazz')" in out


def test_lambda_wrapper_transparent():
    out = rewrite_sql(
        "SELECT clickhouse(lambda(`arrayMap`($x, concat($x, id), names)), 'List(Utf8)') FROM t")
    assert "transform(names, x -> concat(x, id))" in out


def test_array_join_generator():
    out = rewrite_sql("SELECT clickhouse(`arrayJoin`(tags), 'Utf8') AS tag FROM t")
    assert out == "SELECT explode(CAST(tags AS ARRAY<STRING>)) AS tag FROM t"


def test_hof_missing_placeholder_errors():
    with pytest.raises(SqlRewriteError):
        rewrite_sql("SELECT clickhouse(`arrayMap`(concat(x), names), 'List(Utf8)') FROM t")


# -- catalog stripping -----------------------------------------------------

def test_catalog_stripped():
    out = rewrite_sql("SELECT * FROM clickhouse.main.orders o")
    assert out == "SELECT * FROM main.orders o"


def test_catalog_stripped_in_join():
    out = rewrite_sql(
        "SELECT * FROM clickhouse.db.a JOIN clickhouse.db.b ON a.id = b.id")
    assert "clickhouse." not in out


def test_two_part_names_untouched():
    out = rewrite_sql("SELECT * FROM main.orders")
    assert out == "SELECT * FROM main.orders"


def test_string_literals_untouched():
    out = rewrite_sql("SELECT 'clickhouse.main.orders' AS s, 'ch(x)' AS t FROM v")
    assert "'clickhouse.main.orders'" in out and "'ch(x)'" in out


def test_comments_preserved():
    out = rewrite_sql("SELECT x -- clickhouse(exp(y),'Float64')\nFROM t")
    assert "-- clickhouse" in out


# -- splitByChar arg order + escaping --------------------------------------

def test_split_by_char():
    out = rewrite_sql("SELECT clickhouse(splitByChar(',', csv), 'List(Utf8)') FROM t")
    assert "split(csv, ','" in out or "split(csv, '\\\\,'" in out


def test_split_by_char_regex_metachar():
    out = rewrite_sql("SELECT clickhouse(splitByChar('.', s), 'List(Utf8)') FROM t")
    assert "\\\\." in out


def test_array_reduce_dispatch(spark):
    """arrayReduce('agg', arr): rewrite-time dispatch on the aggregate-name
    literal; unsupported names error eagerly with the supported list."""
    from clickhouse_datafusion_spark.engine import ClickHouseSparkEngine

    eng = ClickHouseSparkEngine(spark)
    r = eng.sql("""
        SELECT clickhouse(arrayReduce('sum', array(1, 2, 3)), 'Float64') AS s,
               clickhouse(arrayReduce('max', array(1, 7, 3)), 'Int64') AS m,
               clickhouse(arrayReduce('uniqExact',
                                      array(1, 1, 2)), 'Int64') AS u,
               clickhouse(arrayReduce('anyLast',
                                      array(4, 5, 6)), 'Int64') AS al
    """).collect()[0]
    assert (r.s, r.m, r.u, r.al) == (6.0, 7, 2, 6)
    import pytest as _pytest
    with _pytest.raises(Exception, match="unsupported aggregate"):
        eng.sql("SELECT clickhouse(arrayReduce('median', array(1)), "
                "'Float64') AS x")
