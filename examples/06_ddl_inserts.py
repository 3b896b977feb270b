"""DDL + count-returning inserts + drop (reference examples/06 + 07 + 09).

INSERT returns a one-row `count` DataFrame (reference src/sink.rs:202-210);
write_concurrency bounds writer parallelism like buffer_unordered(n).
"""

from _common import engine

eng = engine()

eng.sql("CREATE DATABASE IF NOT EXISTS ex")
eng.sql("DROP TABLE IF EXISTS clickhouse.ex.orders_copy")
eng.sql("""
    CREATE TABLE clickhouse.ex.orders_copy
    (o_orderkey BIGINT, o_totalprice DOUBLE) USING parquet
""")
n = eng.sql("""
    INSERT INTO clickhouse.ex.orders_copy
    SELECT o_orderkey, o_totalprice FROM clickhouse.main.orders
""")
n.show()  # -> count row

eng.sql("SELECT count(*) AS rows_landed FROM clickhouse.ex.orders_copy").show()
eng.sql("DROP TABLE clickhouse.ex.orders_copy")
