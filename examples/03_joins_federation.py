"""Joins + federation: catalog parquet tables joined with an in-memory
DataFrame registered as a temp view (reference examples/03 + 05 + 08)."""

from pyspark.sql import Row

from _common import engine

eng = engine()
spark = eng.spark

# in-memory "dimension" federated against catalog parquet tables
spark.createDataFrame([
    Row(r_name="AMERICA", greeting="hello america"),
    Row(r_name="ASIA", greeting="hello asia"),
]).createOrReplaceTempView("greetings")

eng.sql("""
    SELECT r.r_name, g.greeting, count(*) AS nations
    FROM clickhouse.main.region r
    JOIN clickhouse.main.nation n ON r.r_regionkey = n.n_regionkey
    JOIN greetings g ON g.r_name = r.r_name
    GROUP BY r.r_name, g.greeting
""").show()
