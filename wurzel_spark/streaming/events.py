"""Streaming event aggregation: readStream → watermark → window → sink.

Batch twin: wurzel_spark.queries.events.events_hourly_stats (same numbers
when run with Trigger.AvailableNow over a static directory).

Scale notes: the windowed aggregation is stateful; the 1-hour watermark
bounds state size — late events beyond it are dropped deterministically.
State lives in the checkpoint dir (RocksDB on a real cluster).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_event_stream(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """File-source stream over an events directory (schema fixed — streams
    can't infer)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .format(fmt)
        .load(path)
    )


def hourly_window_agg(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Tumbling 1-hour window with watermark for late data."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("sum_value"),
        )
        .select(F.col("win.start").alias("hour"), "n_events", "approx_users", "sum_value")
    )


def run_available_now(
    agg: DataFrame, checkpoint_dir: str, query_name: str = "events_hourly"
) -> None:
    """Process everything currently in the source, then stop — the
    scheduled-batch parity trigger (replaces the reference's cron re-run,
    manifest/models.py:115)."""
    q = (
        agg.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def json_props_agg(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming twin of queries.events.events_json_props: per-event-type
    stats over the JSON props column, windowed so state stays bounded.
    JSON extraction (get_json_object) runs identically in micro-batches.
    """
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("win"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
        )
        .select(
            F.col("win.start").alias("hour"),
            "event_type",
            "n_events",
            "sum_k",
            "min_k",
            "max_k",
        )
    )
