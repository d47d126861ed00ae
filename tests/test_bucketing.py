"""Bucketed co-located joins: the physical plan must contain no Exchange."""

import pytest
from pyspark.sql import functions as F

from wurzel_spark.plans.bucketing import (
    assert_no_exchange,
    exchange_count,
    write_bucketed,
)
from wurzel_spark.tables import table


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "b_orders", "o_orderkey", 8, path=str(tmp_path / "bo"))
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        8,
        path=str(tmp_path / "bl"),
    )
    yield spark.table("b_orders"), spark.table("b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_is_shuffle_free(spark, bucketed_pair):
    bo, bl = bucketed_pair
    # force the sort-merge path (broadcast would hide the bucket layout)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bo.join(bl, "o_orderkey").groupBy("o_orderkey").agg(
            F.count(F.lit(1)).alias("n")
        )
        # join AND the groupBy on the bucket key reuse the bucket layout:
        # zero shuffle exchanges end-to-end
        assert_no_exchange(joined)
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_unbucketed_join_has_shuffles(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").select("o_orderkey")
    li = table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    ).repartition(7)  # defeat any single-partition shortcut and broadcast
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(li, "o_orderkey")
        assert exchange_count(joined) >= 1  # the shuffle bucketing removes
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_join_matches_plain_results(spark, bucketed_pair, sf_dir):
    bo, bl = bucketed_pair
    bucketed_n = bo.join(bl, "o_orderkey").count()
    plain_n = (
        table(spark, sf_dir, "orders")
        .join(
            table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .count()
    )
    assert bucketed_n == plain_n
