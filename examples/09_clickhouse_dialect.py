"""ClickHouse drop-in surface added in round 5e: dictionaries,
materialized views, LIMIT BY, PREWHERE / WITH TOTALS / FORMAT, and the
parameterized-aggregate analogs (retention / sequenceMatch /
sequenceCount / sumMap / topK / deltaSum)."""

import tempfile

from _common import SF_DIR, engine

import pyspark.sql.functions as F  # noqa: E402

eng = engine()
spark = eng.spark

from clickhouse_datafusion_spark.catalog import register_testdata_views  # noqa: E402

register_testdata_views(spark, SF_DIR)

# -- external dictionary: joinless constant-map lookups ---------------------
eng.register_dictionary(
    "nations", spark.table("nation").select("n_nationkey", "n_name"),
    key_col="n_nationkey")
eng.sql("""
    SELECT c_custkey,
           clickhouse(dictGet('nations', 'n_name', c_nationkey), 'Utf8')
             AS nation
    FROM customer ORDER BY c_custkey LIMIT 5""").show()

# -- materialized view: refresh-on-demand, snapshot-versioned ---------------
eng._mat_view_dir = tempfile.mkdtemp(prefix="ex_mv_")
eng.sql("CREATE MATERIALIZED VIEW order_sums AS "
        "SELECT o_orderstatus, count(*) AS n, sum(o_totalprice) AS total "
        "FROM orders GROUP BY o_orderstatus")
eng.sql("SELECT * FROM order_sums ORDER BY o_orderstatus").show()
eng.sql("REFRESH MATERIALIZED VIEW order_sums").show()
eng.sql("SHOW MATERIALIZED VIEWS").show(truncate=40)
eng.sql("DROP MATERIALIZED VIEW order_sums")

# -- LIMIT n BY + pasted-dialect conveniences -------------------------------
eng.sql("""
    SELECT o_orderstatus, o_orderkey, ROUND(o_totalprice, 2) AS p
    FROM orders ORDER BY p DESC, o_orderkey
    LIMIT 2 BY o_orderstatus""").show()
eng.sql("""
    SELECT o_orderstatus, count(*) AS n
    FROM orders PREWHERE o_orderkey <= 100
    GROUP BY o_orderstatus WITH TOTALS
    FORMAT JSONEachRow""").show()

# -- aggregate-combinator rewrites in plain SQL -----------------------------
eng.sql("""
    SELECT user_id,
           clickhouse(retention(event_type = 'signup',
                                event_type = 'purchase'), 'List(Int64)')
             AS retained,
           clickhouse(argMax(event_id, ts), 'Int64') AS last_event,
           clickhouse(countIf(event_type = 'click'), 'Int64') AS clicks
    FROM events GROUP BY user_id ORDER BY user_id LIMIT 5""").show()

# -- parameterized aggregates as DataFrame operators ------------------------
from clickhouse_datafusion_spark.operators.funnel import (  # noqa: E402
    delta_sum, funnel_depths, sequence_count, sequence_match, sum_map,
    top_k_values)

ev = spark.table("events")
funnel_depths(ev, [F.col("event_type") == "signup",
                   F.col("event_type") == "view",
                   F.col("event_type") == "purchase"],
              window=F.expr("INTERVAL 7 DAYS")) \
    .orderBy("user_id").show(5)
sequence_match(ev, [F.col("event_type") == "signup",
                    F.col("event_type") == "purchase"]) \
    .orderBy("user_id").show(5)
sequence_count(ev, [F.col("event_type") == "click",
                    F.col("event_type") == "view"]) \
    .orderBy("user_id").show(5)
sum_map(ev, "event_type", "value", ["user_id"]).orderBy("user_id").show(
    3, truncate=60)
top_k_values(ev, "user_id", ["event_type"], k=3).show(truncate=40)
delta_sum(ev, "value", "ts", ["user_id"], tiebreak_col="event_id") \
    .orderBy("user_id").show(5)

print("dialect example done")

# -- mutations, TRUNCATE/RENAME, and SAMPLE (round-5 continuation) ----------
eng.sql("CREATE MATERIALIZED VIEW hot_orders AS "
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders")
eng.sql("ALTER TABLE hot_orders UPDATE o_totalprice = o_totalprice * 1.05 "
        "WHERE o_orderstatus = 'O'")          # new snapshot version
eng.sql("ALTER TABLE hot_orders DELETE WHERE o_totalprice < 1000")
eng.sql("RENAME TABLE hot_orders TO priced_orders")
eng.sql("SELECT count(*) AS rows_left FROM priced_orders").show()
eng.sql("TRUNCATE TABLE priced_orders")
eng.sql("DROP MATERIALIZED VIEW priced_orders")

eng.set_sample_key("orders", "o_orderkey")    # SAMPLE BY analog
eng.sql("""
    SELECT o_orderstatus, count(*) AS n
    FROM orders SAMPLE 0.25
    GROUP BY o_orderstatus ORDER BY o_orderstatus""").show()
eng.sql("SELECT count(*) AS second_quarter "
        "FROM orders SAMPLE 0.25 OFFSET 0.25").show()

print("mutation/sample example done")
