"""Streaming source-drift TV matrix: additive per-(source, term) counts
staged per micro-batch, the pairwise usage-rate drift matrix published
at drain.

Batch twin: operators/textstats.source_tv_matrix.  The per-(source,
term) token counts are pure integer sums — additive across any batch
admission split — so each batch stages its term counts keyed by
(src_batch, source, w) and the drain sums them before the shared
head-vocab/dense-grid/TV tail (`source_tv_from_counts`, imported, not
re-implemented).  The live ingest-drift monitor: a new shard whose term
USAGE rates diverge from its source's history moves the drained matrix
the moment it lands, before any model sees it.  Bit-equal to the batch
query on the same rows; replayed batches overwrite their partition (the
fold protocol's guarantee).

State size: |sources × per-batch vocab| rows per batch —
Heaps-sublinear in tokens, never corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wurzel_spark.operators.textstats import source_tv_from_counts
from wurzel_spark.streaming._fs import path_exists
from wurzel_spark.streaming._state import recover_fold, write_batch_state


def _term_counts(batch_df: DataFrame, text_col: str) -> DataFrame:
    toks = batch_df.select(
        "source",
        F.explode(
            F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != "")
        ).alias("w"),
    )
    return toks.groupBy("source", "w").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("c")
    )


def source_tv_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    compact_every: int | None = 8,
) -> DataFrame:
    """Drain an availableNow document stream; return the pairwise TV
    drift matrix for the full corpus seen — identical to the batch twin."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        recover_fold(spark, state_dir, batch_id)
        mine = _term_counts(batch_df, text_col).withColumn(
            "src_batch", F.lit(batch_id)
        )
        write_batch_state(
            spark, mine, state_dir, batch_id,
            ["src_batch", "source", "w"], compact_every,
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return drain_source_tv_state(spark, state_dir)


def drain_source_tv_state(spark, state_dir: str) -> DataFrame:
    """Sum the staged per-batch term counts, then the shared TV tail."""
    if not path_exists(spark, state_dir):
        return spark.createDataFrame(
            [],
            "src_a string, src_b string, head_tv_permille long,"
            " head_share_a long, head_share_b long",
        )
    staged = (
        spark.read.parquet(state_dir)
        .select("src_batch", "source", "w", "c")
        .dropDuplicates(["src_batch", "source", "w"])
    )
    per_sw = staged.groupBy("source", "w").agg(
        F.sum("c").cast("decimal(38,0)").alias("c")
    )
    return source_tv_from_counts(per_sw)
