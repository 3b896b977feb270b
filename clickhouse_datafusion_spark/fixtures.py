"""The reference's e2e fixture corpus (FIXTURES.md; reference
tests/common/helpers.rs) recreated as engine objects — used by the
e2e-mirroring test suite and as living documentation of the data model.

Fixture tables are persistent VALUES-backed views (the reference seeds them
with ``INSERT INTO ... VALUES`` incl. ``make_array`` literals,
helpers.rs:156-190 — SURVEY S19); ``mem_events`` stays a session temp view
because it plays the in-memory/non-ClickHouse source in federation tests
(helpers.rs:200-215).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def create_reference_fixtures(spark: SparkSession, db: str = "fixtures") -> None:
    """people / people2 / knicknames / mem_events / users / orders_f
    (helpers.rs:88-215, examples/03_joins.rs:47-113)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {db}")

    spark.sql(f"""
        CREATE OR REPLACE VIEW {db}.people AS
        SELECT * FROM VALUES (1, 'Alice'), (2, 'Bob') AS t(id, name)""")

    spark.sql(f"""
        CREATE OR REPLACE VIEW {db}.people2 AS
        SELECT * FROM VALUES
          (1, 'Bob',     array('Buddha', 'Zugus', 'Lulu', 'Kitty', 'Mitty')),
          (2, 'Alice',   array('Jazz', 'Kaya', 'Vienna', 'Susie', 'Georgie')),
          (3, 'Charlie', array('Susana', 'Adrienne', 'Blayke'))
        AS t(id, name, names)""")

    spark.sql(f"""
        CREATE OR REPLACE VIEW {db}.knicknames AS
        SELECT CAST(NULL AS INT) AS id, CAST(NULL AS STRING) AS other_name
        WHERE FALSE""")

    spark.createDataFrame([(1,), (2,)], "event_id int") \
        .createOrReplaceTempView("mem_events")

    spark.sql(f"""
        CREATE OR REPLACE VIEW {db}.users AS
        SELECT * FROM VALUES
          (CAST(1 AS BIGINT), 'Alice', 'Engineering'),
          (CAST(2 AS BIGINT), 'Bob', 'Sales'),
          (CAST(3 AS BIGINT), 'Carol', 'Marketing'),
          (CAST(4 AS BIGINT), 'Dave', 'Sales')
        AS t(user_id, name, department)""")

    spark.sql(f"""
        CREATE OR REPLACE VIEW {db}.orders_f AS
        SELECT * FROM VALUES
          (CAST(101 AS BIGINT), CAST(1 AS BIGINT), CAST(250.50 AS DOUBLE)),
          (CAST(102 AS BIGINT), CAST(1 AS BIGINT), CAST(150.00 AS DOUBLE)),
          (CAST(103 AS BIGINT), CAST(2 AS BIGINT), CAST(500.75 AS DOUBLE)),
          (CAST(104 AS BIGINT), CAST(3 AS BIGINT), CAST(99.99 AS DOUBLE)),
          (CAST(105 AS BIGINT), CAST(1 AS BIGINT), CAST(75.25 AS DOUBLE))
        AS t(order_id, user_id, total)""")
