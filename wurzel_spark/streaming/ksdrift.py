"""Streaming KS length-drift: additive (source, value) counts staged per
micro-batch, the per-source D table published at drain.

Batch twin: operators/textstats.ks_length_drift.  The ONLY corpus-grain
input of the KS computation is the (source, value) count table — a pure
integer sum, additive across any batch admission split — so each batch
stages its aggregate keyed by (src_batch, source, v) and the drain sums
partials before the shared grid/window/max tail (`ks_from_partials`,
imported, not re-implemented). The rest-of-corpus reference shifts as
batches arrive, so every drain re-derives the dense grid from the
current summed counts — bit-equal to the batch query on the same rows.
Replayed batches overwrite their partition and crash-window duplicates
collapse under the key-dedup (the fold protocol's guarantee).

State size: |sources × distinct values| rows per batch — bounded by the
value domain, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wurzel_spark.operators.textstats import ks_from_partials, ks_length_partials
from wurzel_spark.streaming._fs import path_exists
from wurzel_spark.streaming._state import recover_fold, write_batch_state


def ks_drift_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    value_col: str = "n_chars",
    compact_every: int | None = 8,
) -> DataFrame:
    """Drain an availableNow document stream; return the KS drift table
    for the full corpus seen — identical to the batch ks_length_drift."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        recover_fold(spark, state_dir, batch_id)
        mine = ks_length_partials(batch_df, value_col).withColumn(
            "src_batch", F.lit(batch_id)
        )
        write_batch_state(
            spark, mine, state_dir, batch_id, ["src_batch", "source", "v"],
            compact_every,
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return drain_ks_state(spark, state_dir)


def drain_ks_state(spark, state_dir: str) -> DataFrame:
    """Sum the staged per-batch counts, then the shared grid/max tail."""
    if not path_exists(spark, state_dir):
        return spark.createDataFrame(
            [], "source string, n_docs long, ks_permille long, drift_flag boolean"
        )
    staged = (
        spark.read.parquet(state_dir)
        .select("src_batch", "source", "v", "c")
        .dropDuplicates(["src_batch", "source", "v"])
    )
    partials = staged.groupBy("source", "v").agg(F.sum("c").alias("c"))
    return ks_from_partials(partials)
