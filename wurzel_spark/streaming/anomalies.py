"""Streaming event-hour anomaly detection: additive hourly-count
partials staged per micro-batch, the rank-median/MAD gate at drain.

Batch twin: queries/events.event_hour_anomalies.  Hourly counts are
additive across batches, so each batch stages its OWN
(event_type, hour) aggregate keyed by (src_batch, event_type, hour) —
deterministic per key (replay overwrites its partition; a crashed fold's
duplicates collapse under the key-dedup, never double-counting) — and
the drain sums partials before the shared median/MAD tail
(`anomalies_from_hourly`, imported).  Bit-equal to batch under any
admission split: integer sums are order-independent, and the order
statistics read only the summed hourly table.

State: n_types × n_hours rows per batch — bounded by the CLOCK, not the
event volume (the same argument as watermarked windowed aggregation,
realized on the replay-safe fold protocol so late events never need a
watermark cutoff: an hour's count just keeps absorbing partials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wurzel_spark.queries.events import anomalies_from_hourly, event_hourly_counts
from wurzel_spark.streaming._fs import path_exists
from wurzel_spark.streaming._state import recover_fold, write_batch_state


def event_anomaly_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    compact_every: int | None = 8,
) -> DataFrame:
    """Drain an availableNow event stream; return the anomaly rows for
    the full stream seen — identical to the batch event_hour_anomalies."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        recover_fold(spark, state_dir, batch_id)
        mine = event_hourly_counts(batch_df).withColumn(
            "src_batch", F.lit(batch_id)
        )
        write_batch_state(
            spark, mine, state_dir, batch_id,
            ["src_batch", "event_type", "hour"], compact_every,
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return drain_anomaly_state(spark, state_dir)


def drain_anomaly_state(spark, state_dir: str) -> DataFrame:
    if not path_exists(spark, state_dir):
        return spark.createDataFrame(
            [],
            "event_type string, hour timestamp, n_events long, "
            "median_events long, mad_events long",
        )
    staged = (
        spark.read.parquet(state_dir)
        .select("src_batch", "event_type", "hour", "c")
        .dropDuplicates(["src_batch", "event_type", "hour"])
    )
    hourly = staged.groupBy("event_type", "hour").agg(F.sum("c").alias("c"))
    return anomalies_from_hourly(hourly)
