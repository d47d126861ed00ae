"""As-of join: for each left row, the most recent right row at or before
its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas do). The naive formulations
are both wrong at scale: an inequality join explodes to O(left × right per
key), and a per-key collect is driver-bound. This implementation is the
classic union + carry-forward trick — ONE shuffle, no row blowup:

  1. tag left (probe) and right (reference) rows, union them
  2. window over (key) ordered by (time, tag) with rows-unbounded-preceding:
     ``last(right_value, ignoreNulls)`` carries the latest reference row
     forward onto every probe row
  3. keep probe rows

Ordering puts reference rows BEFORE probe rows at equal timestamps, so the
semantics are ``right.t <= left.t`` (inclusive), matching DuckDB's
``ASOF JOIN ... ON r.t <= l.t`` — which makes the operator oracle-checkable.
Right rows are first deduplicated to one per (key, t) (greatest tiebreak
column wins) so ties are deterministic in both engines.

At 100 TB: one hash shuffle of left+right on the key, then a within-
partition sort — the same cost as a single sort-merge join, independent of
how many reference rows precede each probe row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from wurzel_spark.tables import table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    tiebreak: str,
    how: str = "left",
) -> DataFrame:
    """Attach the latest ``right`` row (by ``right_time`` <= ``left_time``)
    per ``key`` onto every ``left`` row. ``value_cols`` are the right columns
    to carry; ``tiebreak`` resolves multiple right rows at the same instant
    (greatest wins). ``how='inner'`` drops unmatched left rows.
    """
    # one reference row per (key, t): greatest tiebreak wins. max_by is a
    # hash AGGREGATE (map-side partial combine) where the equivalent
    # row_number window had to sort every (key, t) partition — measured
    # 0.5 s faster on the events/orders query at sf0.1, identical rows.
    r = (
        right.groupBy(key, right_time)
        .agg(
            F.max_by(
                F.struct(*[F.col(c) for c in value_cols]), F.col(tiebreak)
            ).alias("__v")
        )
        .select(
            F.col(key).alias("__k"),
            F.col(right_time).alias("__t"),
            F.lit(0).alias("__tag"),
            *[F.col(f"__v.{c}").alias(f"__v_{c}") for c in value_cols],
        )
    )
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__tag"),
        *[F.lit(None).cast(r.schema[f"__v_{c}"].dataType).alias(f"__v_{c}") for c in value_cols],
        F.struct(*left.columns).alias("__left"),
    )
    r = r.withColumn("__left", F.lit(None).cast(l.schema["__left"].dataType))

    unioned = l.unionByName(r)
    wcarry = W.partitionBy("__k").orderBy("__t", "__tag").rowsBetween(
        W.unboundedPreceding, 0
    )
    carried = unioned.select(
        "__tag",
        "__left",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(wcarry).alias(f"__m_{c}")
            for c in value_cols
        ],
    ).filter(F.col("__tag") == 1)

    out = carried.select(
        *[F.col("__left")[c].alias(c) for c in left.columns],
        *[F.col(f"__m_{c}").alias(f"asof_{c}") for c in value_cols],
    )
    if how == "inner":
        out = out.filter(F.col(f"asof_{value_cols[0]}").isNotNull())
    return out


# ---------------------------------------------------------------- queries

def q_asof_last_order_before_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event joined as-of to that customer's latest order at or before
    the event time (events.user_id ↔ orders.o_custkey). Oracle: DuckDB
    native ASOF JOIN — exact row/value agreement proves the composition.
    """
    events = table(spark, sf_dir, "events")
    orders = table(spark, sf_dir, "orders").withColumnRenamed("o_custkey", "user_id")
    out = asof_join(
        events,
        orders,
        "user_id",
        "ts",
        "o_orderdate",
        value_cols=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
        how="inner",
    )
    return out.select(
        "event_id",
        "user_id",
        F.col("asof_o_orderkey").alias("last_orderkey"),
        F.col("asof_o_totalprice").alias("last_order_price"),
    ).orderBy("event_id")


ASOF_SQL = """
WITH dedup AS (
  SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice
  FROM (
    SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
           ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey DESC) AS rn
    FROM orders
  ) WHERE rn = 1
)
SELECT event_id, user_id,
       o.o_orderkey AS last_orderkey,
       o.o_totalprice AS last_order_price
FROM events e
ASOF JOIN dedup o
  ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts
ORDER BY event_id
"""
