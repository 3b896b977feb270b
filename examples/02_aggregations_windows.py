"""Aggregations and window functions (reference examples/02 + 04)."""

from _common import engine

eng = engine()

eng.sql("""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n, round(sum(l_extendedprice), 2) AS revenue
    FROM clickhouse.main.lineitem
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
""").show()

eng.sql("""
    SELECT o_custkey, o_orderkey, o_totalprice,
           rank() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS rk,
           round(sum(o_totalprice) OVER (PARTITION BY o_custkey), 2) AS cust_total
    FROM clickhouse.main.orders
    ORDER BY cust_total DESC, rk LIMIT 8
""").show()
