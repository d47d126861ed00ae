"""Streaming bot triage: additive per-(user, kind, key) flag-domain
counts staged per micro-batch, the 0–3 scoreboard published at drain —
the live ban pipeline: a scraper's flags light up as its batches land,
not at the nightly batch.

Batch twin: queries/events.bot_score_stats.  The three flag domains
(event-type, epoch-hour, minute-of-hour) stage as ONE long-format count
table keyed by (src_batch, user_id, kind, k) — pure integer sums,
additive across any batch admission split — and the drain sums then
runs the shared score tail (`bot_score_from_partials`, imported, not
re-implemented).  Bit-equal to the batch query on the same rows;
replayed batches overwrite their partition (the fold protocol's
guarantee).

State size: |users × (types + active-hours + 60)| rows per batch —
user-grain engagement state, Heaps-bounded per batch, never
event-grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wurzel_spark.queries.events import bot_partials, bot_score_from_partials
from wurzel_spark.streaming._fs import path_exists
from wurzel_spark.streaming._state import recover_fold, write_batch_state


def bot_score_stream(
    stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    compact_every: int | None = 8,
) -> DataFrame:
    """Drain an availableNow event stream; return the bot scoreboard for
    the full stream seen — identical to the batch twin."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        recover_fold(spark, state_dir, batch_id)
        mine = bot_partials(batch_df).withColumn("src_batch", F.lit(batch_id))
        write_batch_state(
            spark, mine, state_dir, batch_id,
            ["src_batch", "user_id", "kind", "k"], compact_every,
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return drain_bot_state(spark, state_dir)


def drain_bot_state(spark, state_dir: str) -> DataFrame:
    """Sum the staged per-batch flag-domain counts, then the score tail."""
    if not path_exists(spark, state_dir):
        return spark.createDataFrame(
            [],
            "bot_score long, n_users long, share_permille long,"
            " n_monotype long, n_burst long, n_clockwork long",
        )
    staged = (
        spark.read.parquet(state_dir)
        .select("src_batch", "user_id", "kind", "k", "c")
        .dropDuplicates(["src_batch", "user_id", "kind", "k"])
    )
    partials = staged.groupBy("user_id", "kind", "k").agg(
        F.sum("c").cast("long").alias("c")
    )
    return bot_score_from_partials(partials)
