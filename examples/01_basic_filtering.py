"""Filtering + the ClickHouse function surface through SQL.

Mirrors reference examples/01_basic_filtering.rs: register a table,
filter it, and call ClickHouse functions (`clickhouse(expr, 'Type')`,
backticked names, lambda HOFs) that lower to native Spark expressions.
"""

from _common import engine

eng = engine()

eng.sql("""
    SELECT o_orderkey, o_totalprice,
           clickhouse(toString(o_orderkey), 'Utf8')       AS key_str,
           clickhouse(sigmoid(o_totalprice / 100000), 'Float64') AS sig
    FROM clickhouse.main.orders
    WHERE o_totalprice > 300000
    ORDER BY o_totalprice DESC LIMIT 5
""").show()

eng.sql("""
    SELECT n_name,
           clickhouse(`arrayMap`($x, concat($x, '!'),
                      array(n_name, lower(n_name))), 'List(Utf8)') AS shouted
    FROM clickhouse.main.nation
    WHERE clickhouse(`arrayExists`($x, $x = 'ASIA',
                     array(n_name)), 'Boolean') OR n_regionkey = 1
    LIMIT 5
""").show(truncate=60)
