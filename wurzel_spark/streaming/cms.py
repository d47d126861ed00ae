"""Streaming count-min sketching: cell tables summed across micro-batches.

Batch twin: wurzel_spark.operators.sketches.cms_heavy_hitters (minus the
exact-count audit branch — the sketch needs no second corpus pass). CMS
cells merge by SUM, the additive complement of the HLL registers'
max-merge (streaming/sketch.py): per-batch cell tables staged to parquet
and folded with one (i, cell) → sum aggregate are EXACTLY the cells of
the full input under any admission split — estimates bit-equal to the
batch sketch, parity-tested with one-file-per-trigger admission.

Replay safety: cells are staged under ``staging_dir/batch=N`` with
overwrite (the same batch-keyed idempotence as streaming/clusters.py) —
a foreachBatch retry after the parquet write but before the checkpoint
commit REPLACES its batch's cells instead of double-counting them under
Structured Streaming's at-least-once replay contract.

Scale shape: each micro-batch pays its own vocabulary aggregate + a
depth×width-bounded cell table (4096 rows); staged state per batch is
the same bounded size regardless of batch rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wurzel_spark.operators.sketches import cms_cells, cms_estimate_terms
from wurzel_spark.streaming._fs import path_exists


def write_batch_cells(
    batch_df: DataFrame, batch_id: int, staging_dir: str, text_col: str = "text"
) -> None:
    """Stage one micro-batch's CMS cells, keyed by batch id. Overwrite to
    ``batch=N`` makes a replayed batch (at-least-once delivery) replace
    rather than double-count its cells — calling this twice with the same
    arguments is a no-op for the final (i, cell) sum."""
    if batch_df.isEmpty():
        return
    cms_cells(batch_df, text_col).write.mode("overwrite").parquet(
        f"{staging_dir}/batch={batch_id}"
    )


def cms_stream_estimates(
    stream: DataFrame,
    terms: list[str],
    staging_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
) -> DataFrame:
    """Drain an availableNow stream staging per-batch CMS cells; return
    (w, cms_estimate) for the probe ``terms`` from the summed cells."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        write_batch_cells(batch_df, batch_id, staging_dir, text_col)

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream.sparkSession
    tdf = spark.createDataFrame([(t,) for t in terms], "w string")
    if not path_exists(spark, staging_dir):
        return tdf.select("w", F.lit(None).cast("long").alias("cms_estimate")).limit(0)
    merged = (
        spark.read.parquet(staging_dir)
        .groupBy("i", "cell")
        .agg(F.sum("c").alias("c"))
    )
    return cms_estimate_terms(merged, tdf).orderBy("w")
