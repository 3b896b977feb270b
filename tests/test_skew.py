"""Skew-mitigation operators: salted results must equal plain results, and
the salted plans must actually spread the hot key."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def _skewed(spark):
    """1 hot key (90% of rows) + long tail."""
    hot = spark.range(9000).select(
        F.lit("HOT").alias("k"), (F.col("id") % 100).cast("double").alias("val"))
    tail = spark.range(1000).select(
        F.concat(F.lit("t"), (F.col("id") % 50)).alias("k"),
        F.col("id").cast("double").alias("val"))
    return hot.unionAll(tail)


def test_salted_count_sum_equals_plain(spark):
    from clickhouse_datafusion_spark.operators.skew import salted_count_sum

    df = _skewed(spark)
    plain = {(r.k): (r.n, r.total) for r in
             df.groupBy("k").agg(F.count("*").alias("n"),
                                 F.sum("val").alias("total")).collect()}
    salted = {(r.k): (r.n, r.total) for r in
              salted_count_sum(df, "k", "val", n_salts=8).collect()}
    assert set(plain) == set(salted)
    for k in plain:
        assert plain[k][0] == salted[k][0]
        assert abs(plain[k][1] - salted[k][1]) < 1e-6


def test_salted_aggregate_generic(spark):
    from clickhouse_datafusion_spark.operators.skew import salted_aggregate

    df = _skewed(spark)
    out = salted_aggregate(df, "k", {
        "n": ("val", F.count, F.sum),
        "total": ("val", F.sum, F.sum),
        "mx": ("val", F.max, F.max),
        "mn": ("val", F.min, F.min),
    }, n_salts=4)
    plain = df.groupBy("k").agg(
        F.count("val").alias("n"), F.sum("val").alias("total"),
        F.max("val").alias("mx"), F.min("val").alias("mn"))
    a = {r.k: (r.n, round(r.total, 6), r.mx, r.mn) for r in out.collect()}
    b = {r.k: (r.n, round(r.total, 6), r.mx, r.mn) for r in plain.collect()}
    assert a == b


def test_salted_partial_spreads_hot_key(spark):
    from clickhouse_datafusion_spark.operators.skew import _salt_col

    df = _skewed(spark)
    n_partials = (df.withColumn("_salt", _salt_col(df, 8, ["val"]))
                  .filter(F.col("k") == "HOT")
                  .select("_salt").distinct().count())
    assert n_partials == 8  # the hot key fans out over all salts


def test_salted_join_equals_plain(spark):
    from clickhouse_datafusion_spark.operators.skew import salted_join

    probe = _skewed(spark)
    build = spark.createDataFrame(
        [("HOT", 1.0)] + [(f"t{i}", i * 1.0) for i in range(50)],
        "k string, w double")
    plain = probe.join(build, "k").agg(
        F.count("*").alias("n"), F.sum(F.col("val") * F.col("w")).alias("s")
    ).collect()[0]
    salted = salted_join(probe, build, "k", n_salts=8).agg(
        F.count("*").alias("n"), F.sum(F.col("val") * F.col("w")).alias("s")
    ).collect()[0]
    assert plain.n == salted.n
    assert abs(plain.s - salted.s) < 1e-6


def test_salted_join_left_outer(spark):
    from clickhouse_datafusion_spark.operators.skew import salted_join

    probe = _skewed(spark)
    build = spark.createDataFrame([("t1", 1.0)], "k string, w double")
    plain = probe.join(build, "k", "left")
    salted = salted_join(probe, build, "k", n_salts=4, how="left")
    assert plain.count() == salted.count()
    assert (plain.filter(F.col("w").isNull()).count()
            == salted.filter(F.col("w").isNull()).count())
