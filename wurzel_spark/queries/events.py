"""Event-stream queries (batch form) over the ``events`` table.

The reference has no streaming (SURVEY §1.3) — cron-batch is its freshness
model. We provide these as batch queries here, and the same computations as
Structured Streaming jobs in ``wurzel_spark.streaming`` (watermarked windows
over readStream) for the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from wurzel_spark.tables import table

SESSION_GAP_SECONDS = 30 * 60


def events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour aggregation: count, distinct users, exact value sum.

    value is a full-precision double → summing via DECIMAL(28,10) keeps the
    result order-independent (double sums are not associative).
    """
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("sum_value"),
        )
        .orderBy("hour")
    )


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1
ORDER BY 1
"""


def events_type_breakdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (pivot-style): per-user event-type counts.
    One shuffle on user_id; the per-type counts are map-side partial aggs.
    """
    ev = table(spark, sf_dir, "events")

    def cnt(t: str):
        return F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")

    return (
        ev.groupBy("user_id")
        .agg(
            cnt("click"),
            cnt("view"),
            cnt("purchase"),
            cnt("signup"),
            cnt("error"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .orderBy("user_id")
    )


EVENTS_TYPES_SQL = """
SELECT user_id,
       SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS n_click,
       SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS n_view,
       SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purchase,
       SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS n_signup,
       SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS n_error,
       COUNT(*) AS n_total
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: per-user sessions split on >30-min inactivity gaps.

    Declarative form of the classic stateful-streaming operator: lag() to
    detect gaps, running sum of gap flags for the session id. All integer
    arithmetic on epoch-micros → cross-engine exact. The streaming twin
    (applyInPandasWithState) lives in wurzel_spark.streaming.sessions.
    """
    ev = table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    is_new = F.when(gap_us.isNull() | (gap_us > SESSION_GAP_SECONDS * 1_000_000), 1).otherwise(0)
    return (
        ev.select(
            "user_id",
            "event_id",
            "ts",
            is_new.alias("is_new_session"),
        )
        .withColumn(
            "session_seq",
            F.sum("is_new_session").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .select("user_id", "event_id", "session_seq")
        .orderBy("user_id", "event_id")
    )


SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {SESSION_GAP_SECONDS * 1_000_000}
              THEN 1 ELSE 0 END AS is_new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id,
       SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_seq
FROM flagged
ORDER BY user_id, event_id
"""
