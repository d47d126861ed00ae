"""Streaming Good-Turing frequency-of-frequencies: per-type count
partials staged per micro-batch with an AGGREGATING fold, the capped
histogram published at drain.

Batch twin: operators/textstats.term_freq_of_freq.  Type counts are
additive across batches, but unlike the quality-sweep/anomaly twins the
per-batch partial table is VOCABULARY-sized — so the per-batch staging
(keyed by (src_batch, source, h), deterministic per key) is compacted by
a custom fold that (1) key-dedups the union (absorbing crash-window
duplicate rows exactly as the protocol's default would) and then
(2) SUMS partials into one row per live type re-keyed under the
``src_batch = -1`` sentinel.  The fold is idempotent (summing singleton
groups is a no-op) and associative (integer addition), so state is
bounded at one row per live type regardless of batch count — the honest
production state for type counting, reached without approximation.

Drain: key-dedup (crash windows outside fold points), sum partials, run
the shared histogram tail (`fof_from_types`, imported) — bit-equal to
the batch operator under any admission split.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wurzel_spark.operators.textstats import fof_from_types, term_type_counts
from wurzel_spark.streaming._fs import path_exists
from wurzel_spark.streaming._state import recover_fold, write_batch_state

_FOLDED = -1  # sentinel src_batch for aggregated rows


def fof_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    compact_every: int | None = 8,
) -> DataFrame:
    """Drain an availableNow document stream; return the per-source
    frequency-of-frequencies for the full corpus seen — identical to the
    batch term_freq_of_freq."""
    spark = stream.sparkSession

    def _fold(union: DataFrame) -> DataFrame:
        return (
            union.dropDuplicates(["src_batch", "source", "h"])
            .groupBy("source", "h")
            .agg(F.sum("c").alias("c"))
            .withColumn("src_batch", F.lit(_FOLDED))
        )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        recover_fold(spark, state_dir, batch_id)
        mine = term_type_counts(batch_df, text_col).withColumn(
            "src_batch", F.lit(batch_id)
        )
        write_batch_state(
            spark, mine, state_dir, batch_id,
            ["src_batch", "source", "h"], compact_every, fold=_fold,
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return drain_fof_state(spark, state_dir)


def drain_fof_state(spark, state_dir: str) -> DataFrame:
    if not path_exists(spark, state_dir):
        return spark.createDataFrame(
            [],
            "source string, n_tokens long, n_types long, f1 long, f2 long, "
            "f3 long, f4 long, f5 long, p_unseen double",
        )
    staged = (
        spark.read.parquet(state_dir)
        .select("src_batch", "source", "h", "c")
        .dropDuplicates(["src_batch", "source", "h"])
    )
    types = staged.groupBy("source", "h").agg(F.sum("c").alias("c"))
    return fof_from_types(types)
