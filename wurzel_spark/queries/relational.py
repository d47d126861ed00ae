"""Relational operator coverage: filters, projections, aggregation, joins
(broadcast/semi/anti), windows, set ops — SURVEY.md §2.3/§2.7/§2.9.

Cross-engine determinism rules used throughout (SURVEY §7 "hard parts"):
  - Money aggregation goes through DECIMAL casts: the driver's value-hash
    compares Spark vs DuckDB bit-for-bit, and double summation is
    order-dependent; decimal sums are exact and order-independent. The final
    cast back to DOUBLE is then identical in both engines.
  - Every query that returns a LIMIT/top-k has a total deterministic order
    (tie-broken by a key column).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wurzel_spark.tables import table


def _dec(col, prec: int = 18, scale: int = 2):
    return F.col(col).cast(f"decimal({prec},{scale})")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem.

    Map-side partial aggregation + single shuffle on the (tiny) group keys;
    at 100 TB this is the canonical "scan-heavy, agg-light" query — the scan
    should show PushedFilters on l_shipdate and prune to 7 columns.
    """
    li = table(spark, sf_dir, "lineitem")
    price = _dec("l_extendedprice")
    disc = _dec("l_discount")
    tax = _dec("l_tax")
    one = F.lit(1).cast("decimal(18,2)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (one - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (one - disc) * (one + tax)).cast("double").alias("sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
