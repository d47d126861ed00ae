"""Bucketed range join: equivalence with the naive inequality join and a
nested-loop-free plan."""

from pyspark.sql import functions as F

from wurzel_spark.operators.rangejoin import range_join_time
from wurzel_spark.plans.inspect import plan_text


def _tables(spark):
    left = spark.range(200).select(
        (F.col("id") % 7).alias("k"),
        F.timestamp_millis(F.col("id") * 10_000).alias("t"),
        F.col("id").alias("lid"),
    )
    right = spark.range(500).select(
        (F.col("id") % 7).alias("k"),
        F.timestamp_millis(F.col("id") * 4_000).alias("rt"),
        F.col("id").alias("rid"),
    )
    return left, right


def test_range_join_matches_naive(spark):
    left, right = _tables(spark)
    lower, upper = -30, 15  # seconds
    bucketed = range_join_time(left, right, "k", "t", "rt", lower, upper)
    lt, rt = F.unix_micros(F.col("t")), F.unix_micros(F.col("rt"))
    naive = left.join(right, "k").filter(
        (rt >= lt + lower * 1_000_000) & (rt < lt + upper * 1_000_000)
    )
    b = {(r["lid"], r["rid"]) for r in bucketed.collect()}
    n = {(r["lid"], r["rid"]) for r in naive.collect()}
    assert b == n and len(b) > 0


def test_range_join_plan_is_hash_join(spark):
    left, right = _tables(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = plan_text(range_join_time(left, right, "k", "t", "rt", -30, 15))
        assert "NestedLoop" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
