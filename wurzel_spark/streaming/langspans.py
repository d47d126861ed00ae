"""Streaming segment-level language spans: per-(source, lang) additive
line/doc counts staged per micro-batch, the share table published at
drain.

Batch twin: operators/textstats.line_lang_spans.  Line labels are
row-local and documents never straddle a batch, so both partial columns
(n_lines, n_docs) are pure integer sums across any admission split; the
per-source share denominator re-derives as a window sum at drain — no
extra staged state.  Each batch stages its per-(source, lang) aggregate
keyed by (src_batch, source, lang); the drain sums partials then runs
the shared share tail (`line_lang_from_partials`, imported, not
re-implemented).  Bit-equal to the batch query under any split;
replay-safe via the fold protocol's overwrite + key-dedup.

State size: n_sources · (n_langs + 1) rows per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wurzel_spark.operators.textstats import (
    line_lang_from_partials,
    line_lang_partials,
)
from wurzel_spark.streaming._fs import path_exists
from wurzel_spark.streaming._state import recover_fold, write_batch_state


def line_lang_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    compact_every: int | None = 8,
) -> DataFrame:
    """Drain an availableNow document stream; return the per-(source,
    lang) line-share table for the full corpus seen — identical to the
    batch line_lang_spans."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        recover_fold(spark, state_dir, batch_id)
        mine = line_lang_partials(batch_df, text_col).withColumn(
            "src_batch", F.lit(batch_id)
        )
        write_batch_state(
            spark,
            mine,
            state_dir,
            batch_id,
            ["src_batch", "source", "lang"],
            compact_every,
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return drain_line_lang_state(spark, state_dir)


def drain_line_lang_state(spark, state_dir: str) -> DataFrame:
    """Sum the staged per-batch partials, then the shared share tail."""
    if not path_exists(spark, state_dir):
        return spark.createDataFrame(
            [],
            "source string, lang string, n_lines long, n_docs long, "
            "line_share_permille long",
        )
    staged = (
        spark.read.parquet(state_dir)
        .select("src_batch", "source", "lang", "n_lines", "n_docs")
        .dropDuplicates(["src_batch", "source", "lang"])
    )
    partials = staged.groupBy("source", "lang").agg(
        F.sum("n_lines").alias("n_lines"), F.sum("n_docs").alias("n_docs")
    )
    return line_lang_from_partials(partials)
