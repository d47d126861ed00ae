"""Time-range join via bucketing: right rows within ``[t+lower, t+upper)``
of each left row, per key.

Spark plans a raw inequality join as BroadcastNestedLoopJoin — O(|L|·|R|)
per key and a broadcast of a whole side; unusable at 100 TB. The bucketed
form turns it into an equi-join: quantize time into buckets as wide as the
window, replicate each LEFT row into the (at most two) buckets its window
can touch, equi-join on (key, bucket), then apply the exact range filter.
Cost: one hash join with ≤2× left replication, no nested loop, no
broadcast of a big side — and AQE still handles per-key skew because the
join key is (key, bucket).

Oracle-checkable: DuckDB runs the equivalent inequality join exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wurzel_spark.tables import table


def range_join_time(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    lower_s: int,
    upper_s: int,
) -> DataFrame:
    """Pairs (left, right) with ``right_time ∈ [left_time+lower_s,
    left_time+upper_s)`` (seconds). Column sets are kept disjoint by the
    caller. Bucket width = window span, so each left window covers at most
    two buckets.
    """
    span = upper_s - lower_s
    if span <= 0:
        raise ValueError("upper_s must exceed lower_s")
    lt = F.unix_micros(F.col(left_time))
    rt = F.unix_micros(F.col(right_time))
    span_us = span * 1_000_000
    lower_us = lower_s * 1_000_000
    upper_us = upper_s * 1_000_000

    l_buckets = left.withColumn(
        "__bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    ((lt + F.lit(lower_us)) / F.lit(span_us)).cast("long"),
                    ((lt + F.lit(upper_us) - 1) / F.lit(span_us)).cast("long"),
                )
            )
        ),
    )
    r_buckets = right.withColumn("__bucket", (rt / F.lit(span_us)).cast("long"))
    joined = l_buckets.join(r_buckets, [key, "__bucket"]).drop("__bucket")
    in_range = (rt >= lt + F.lit(lower_us)) & (rt < lt + F.lit(upper_us))
    return joined.filter(in_range)


# ---------------------------------------------------------------- queries

def q_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase event: how many clicks the same user made in the
    preceding hour. Bucketed range self-join on events; exact agreement
    with DuckDB's inequality join is the oracle.
    """
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pt")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("ct")
    )
    pairs = range_join_time(
        purchases, clicks, "user_id", "pt", "ct", lower_s=-3600, upper_s=0
    )
    return (
        pairs.groupBy("purchase_id", "user_id")
        .agg(F.count(F.lit(1)).alias("n_clicks_prev_hour"))
        .orderBy("purchase_id")
    )


RANGE_JOIN_SQL = """
SELECT p.event_id AS purchase_id, p.user_id,
       COUNT(*) AS n_clicks_prev_hour
FROM events p JOIN events c
  ON p.user_id = c.user_id
 AND c.event_type = 'click'
 AND epoch_us(c.ts) >= epoch_us(p.ts) - CAST(3600 AS BIGINT) * 1000000
 AND epoch_us(c.ts) < epoch_us(p.ts)
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id
ORDER BY purchase_id
"""
