"""Streaming distinct-count sketching: HLL registers merged across
micro-batches.

Batch twin: wurzel_spark.operators.sketches.hll_distinct_stats (the
`hll_distinct_stats` query, minus the exact-count audit branch — the
exact count needs the whole corpus; the SKETCH doesn't, which is the
point). HLL registers merge by MAX, so per-batch register tables staged
to parquet and folded with one final (source, bucket) → max aggregate
are EXACTLY the registers of the full input under any admission-control
split — bit-equal estimates, parity-tested against the batch operator
with maxFilesPerTrigger=1 forcing multi-batch runs.

Scale shape: each micro-batch pays one map + one 1024-row-per-source
aggregate; staged state is ≤ (sources × 1024) longs per batch. This is
the monitoring pattern for a continuously-ingesting corpus — "how many
distinct terms/urls/ids have we EVER seen" without storing the set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wurzel_spark.operators.sketches import (
    hll_estimate_from_registers,
    hll_registers,
)


def hll_stream_distinct(
    stream: DataFrame,
    staging_dir: str,
    checkpoint_dir: str,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Drain an availableNow stream, staging per-batch HLL registers;
    return per-source (n_buckets_hit, hll_sum_scaled, hll_estimate) from
    the merged registers."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        regs = hll_registers(batch_df, source_col, text_col)
        regs.write.mode("append").parquet(staging_dir)

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream.sparkSession
    from wurzel_spark.streaming._fs import path_exists

    if not path_exists(spark, staging_dir):  # every batch empty: nothing staged
        return spark.createDataFrame(
            [],
            "source string, n_buckets_hit long, hll_sum_scaled long, hll_estimate double",
        )
    staged = spark.read.parquet(staging_dir)
    merged = staged.groupBy("source", "bucket").agg(F.max("reg").alias("reg"))
    return hll_estimate_from_registers(merged).orderBy("source")
