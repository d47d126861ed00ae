"""Streaming unicode-contamination audit: additive per-source counts
staged per micro-batch, the dirty-permille table published at drain.

Batch twin: operators/textstats.unicode_clean_stats.  Every partial
column (doc/affected/char and the four contaminant-class counts) is a
pure integer sum — additive across any batch admission split — so each
batch stages its per-source aggregate keyed by (src_batch, source) and
the drain sums partials before the shared permille tail
(`unicode_stats_from_partials`, imported, not re-implemented).
Bit-equal to the batch query under any split; a replayed batch
overwrites its partition and crash-window duplicates collapse under the
key-dedup (the fold protocol's guarantee).

State size: n_sources rows per batch, metadata-sized at any batch size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wurzel_spark.operators.textstats import (
    unicode_stats_from_partials,
    unicode_stats_partials,
)
from wurzel_spark.streaming._fs import path_exists
from wurzel_spark.streaming._state import recover_fold, write_batch_state

_PARTIAL_COLS = [
    "n_docs",
    "n_docs_affected",
    "n_chars",
    "n_zero_width",
    "n_control",
    "n_space_mapped",
    "n_fullwidth",
]


def unicode_stats_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    compact_every: int | None = 8,
) -> DataFrame:
    """Drain an availableNow document stream; return the per-source
    contamination table for the full corpus seen — identical to the
    batch unicode_clean_stats."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        recover_fold(spark, state_dir, batch_id)
        mine = unicode_stats_partials(batch_df, text_col).withColumn(
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
    return drain_unicode_state(spark, state_dir)


def drain_unicode_state(spark, state_dir: str) -> DataFrame:
    """Sum the staged per-batch partials, then the shared permille tail."""
    if not path_exists(spark, state_dir):
        return spark.createDataFrame(
            [],
            "source string, n_docs long, n_docs_affected long, n_chars long, "
            "n_zero_width long, n_control long, n_space_mapped long, "
            "n_fullwidth long, dirty_permille long",
        )
    staged = (
        spark.read.parquet(state_dir)
        .select("src_batch", "source", *_PARTIAL_COLS)
        .dropDuplicates(["src_batch", "source"])
    )
    partials = staged.groupBy("source").agg(
        *[F.sum(c).alias(c) for c in _PARTIAL_COLS]
    )
    return unicode_stats_from_partials(partials)
