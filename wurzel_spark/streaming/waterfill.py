"""Streaming token-budget water-filling: additive per-source token
availability staged per micro-batch, the allocation table re-solved at
drain.

Batch twin: operators/textstats.token_budget_waterfill.  The ONLY
corpus-dependent input of the allocator is the per-source available
token count — a pure integer sum, additive across any batch split — so
each batch stages (source, avail) keyed by (src_batch, source) and the
drain sums partials before the shared metadata-sized solver tail
(`waterfill_from_avail`, imported, not re-implemented).  Because the
budget is self-normalizing (a fraction of the total seen so far), every
drain yields the allocation a batch run over the admitted corpus would
produce — the always-current mixture-repair table of an unbounded
ingest.  Bit-equal to the batch query under any split; replay-safe via
the fold protocol's overwrite + key-dedup.

State size: n_sources rows per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wurzel_spark.functions import text as TXT
from wurzel_spark.operators.textstats import waterfill_from_avail
from wurzel_spark.streaming._fs import path_exists
from wurzel_spark.streaming._state import recover_fold, write_batch_state


def waterfill_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    rates_permille: dict[str, int] | None = None,
    text_col: str = "text",
    compact_every: int | None = 8,
) -> DataFrame:
    """Drain an availableNow document stream; return the water-filling
    allocation for the full corpus seen — identical to the batch
    token_budget_waterfill."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        recover_fold(spark, state_dir, batch_id)
        mine = (
            batch_df.select(
                "source", TXT.word_count(F.col(text_col)).alias("n_toks")
            )
            .groupBy("source")
            .agg(F.sum("n_toks").alias("avail"))
            .withColumn("src_batch", F.lit(batch_id))
        )
        write_batch_state(
            spark, mine, state_dir, batch_id, ["src_batch", "source"], compact_every
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return drain_waterfill_state(spark, state_dir, rates_permille)


def drain_waterfill_state(
    spark, state_dir: str, rates_permille: dict[str, int] | None = None
) -> DataFrame:
    """Sum the staged per-batch availability partials, then the shared
    metadata-sized water-filling solver."""
    if not path_exists(spark, state_dir):
        return spark.createDataFrame(
            [],
            "source string, weight_permille long, avail_tokens long, "
            "alloc_tokens long, saturated boolean, fill_permille long, "
            "budget_tokens long",
        )
    staged = (
        spark.read.parquet(state_dir)
        .select("src_batch", "source", "avail")
        .dropDuplicates(["src_batch", "source"])
    )
    per = staged.groupBy("source").agg(F.sum("avail").alias("avail"))
    return waterfill_from_avail(per, rates_permille)
