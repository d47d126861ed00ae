"""Skew-mitigation utilities: salted aggregation and salted join."""

from pyspark.sql import functions as F

from wurzel_spark.operators.skew import salted_count, salted_join


def test_salted_count_matches_plain(spark):
    # 10k rows on one hot key + 100 spread over others
    hot = spark.range(10_000).select(F.lit("HOT").alias("k"), F.col("id"))
    cold = spark.range(100).select(
        F.concat(F.lit("k"), (F.col("id") % 10).cast("string")).alias("k"), F.col("id")
    )
    df = hot.unionByName(cold)
    plain = {r["k"]: r["cnt"] for r in df.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    salted = {r["k"]: r["n_rows"] for r in salted_count(df, ["k"], "id").collect()}
    assert salted == plain


def test_salted_join_matches_plain(spark):
    left = spark.range(5_000).select(
        F.when(F.col("id") % 2 == 0, "HOT").otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string"))).alias("k"),
        F.col("id").alias("left_id"),
    )
    right = spark.createDataFrame(
        [("HOT", 1.0), ("k1", 2.0), ("k3", 3.0)], ["k", "weight"]
    )
    plain = left.join(right, "k").agg(
        F.count("*").alias("n"), F.sum("weight").alias("w")
    ).collect()[0]
    salted = salted_join(left, right, "k").agg(
        F.count("*").alias("n"), F.sum("weight").alias("w")
    ).collect()[0]
    assert (salted["n"], salted["w"]) == (plain["n"], plain["w"])


def test_salted_join_spreads_hot_key(spark):
    left = spark.range(1_000).select(F.lit("HOT").alias("k"), F.col("id").alias("left_id"))
    right = spark.createDataFrame([("HOT", 1)], ["k", "v"])
    out = salted_join(left, right, "k", n_salts=8)
    assert out.count() == 1_000
    assert set(out.columns) == {"k", "left_id", "v"}
