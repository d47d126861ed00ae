"""Streaming code-switching audit: additive per-source verdict counts
staged per micro-batch, the mixed-language table published at drain.

Batch twin: operators/textstats.code_switch_stats.  A document's
marker verdict (unmarked / monolingual / mixed) is row-local, so the
per-source counts are pure integer sums across any batch admission
split; each batch stages its per-source aggregate keyed by
(src_batch, source), the drain sums partials then runs the shared
permille tail (`code_switch_from_partials`, imported).  Bit-equal to
the batch query under any split; replay-safe via the fold protocol's
overwrite + key-dedup.

State size: n_sources rows per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wurzel_spark.operators.textstats import (
    code_switch_from_partials,
    code_switch_partials,
)
from wurzel_spark.streaming._fs import path_exists
from wurzel_spark.streaming._state import recover_fold, write_batch_state

_PARTIAL_COLS = ["n_docs", "n_unmarked", "n_monolingual", "n_mixed"]


def code_switch_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    compact_every: int | None = 8,
) -> DataFrame:
    """Drain an availableNow document stream; return the per-source
    code-switching table for the full corpus seen — identical to the
    batch code_switch_stats."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        recover_fold(spark, state_dir, batch_id)
        mine = code_switch_partials(batch_df, text_col).withColumn(
            "src_batch", F.lit(batch_id)
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
    return drain_code_switch_state(spark, state_dir)


def drain_code_switch_state(spark, state_dir: str) -> DataFrame:
    """Sum the staged per-batch partials, then the shared permille tail."""
    if not path_exists(spark, state_dir):
        return spark.createDataFrame(
            [],
            "source string, n_docs long, n_unmarked long, n_monolingual long, "
            "n_mixed long, mixed_permille long",
        )
    staged = (
        spark.read.parquet(state_dir)
        .select("src_batch", "source", *_PARTIAL_COLS)
        .dropDuplicates(["src_batch", "source"])
    )
    partials = staged.groupBy("source").agg(
        *[F.sum(c).alias(c) for c in _PARTIAL_COLS]
    )
    return code_switch_from_partials(partials)
