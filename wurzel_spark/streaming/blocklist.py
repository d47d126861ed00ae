"""Streaming blocklist exposure: additive per-source hit partials staged
per micro-batch, the filter-rate table published at drain.

Batch twin: operators/textstats.blocklist_filter_stats.  Every partial
column (doc/flag/gate/hit/token counts) is a pure integer sum, so the
corpus aggregate is ADDITIVE across any batch admission split: each
batch stages its own per-source aggregate keyed by (batch_id, source) —
deterministic rows per key, so the fold protocol's crash-window
guarantee holds (a replayed batch OVERWRITES its partition; a crashed
fold's duplicates collapse under the key-dedup, never double-summing) —
and the drain sums partials before the shared permille tail
(`blocklist_from_partials`, imported, not re-implemented).  Bit-equal to
the batch query under any split.

State size: n_sources rows per batch — metadata-sized however large the
batches are; compaction bounds live dirs at O(compact_every).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wurzel_spark.operators.textstats import (
    BLOCKLIST_MAX_PERMILLE,
    BLOCKLIST_TERMS,
    blocklist_from_partials,
    blocklist_source_partials,
)
from wurzel_spark.streaming._fs import path_exists
from wurzel_spark.streaming._state import recover_fold, write_batch_state

_PARTIAL_COLS = ["n_docs", "flagged_docs", "gated_docs", "total_hits", "total_tokens"]


def blocklist_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    terms: tuple[str, ...] = BLOCKLIST_TERMS,
    max_permille: int = BLOCKLIST_MAX_PERMILLE,
    compact_every: int | None = 8,
) -> DataFrame:
    """Drain an availableNow document stream; return the blocklist
    filter-rate table for the full corpus seen — identical to the batch
    blocklist_filter_stats."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        recover_fold(spark, state_dir, batch_id)
        mine = blocklist_source_partials(
            batch_df, text_col, terms, max_permille
        ).withColumn("src_batch", F.lit(batch_id))
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
    return drain_blocklist_state(spark, state_dir)


def drain_blocklist_state(spark, state_dir: str) -> DataFrame:
    """Sum the staged per-batch partials, then the shared permille tail.
    Empty state → empty result with the batch schema."""
    if not path_exists(spark, state_dir):
        return spark.createDataFrame(
            [],
            "source string, n_docs long, flagged_docs long, gated_docs long, "
            "total_hits long, total_tokens long, hit_permille long",
        )
    staged = (
        spark.read.parquet(state_dir)
        .select("src_batch", "source", *_PARTIAL_COLS)
        .dropDuplicates(["src_batch", "source"])
    )
    partials = staged.groupBy("source").agg(
        *[F.sum(c).alias(c) for c in _PARTIAL_COLS]
    )
    return blocklist_from_partials(partials)
