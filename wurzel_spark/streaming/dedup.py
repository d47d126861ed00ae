"""Stateful streaming deduplication.

Batch twin: wurzel_spark.operators.dedup.exact_dedup (the reference's
DropDuplicationStep, wurzel/steps/duplication.py:21-51, keyed on
DROP_BY_FIELDS default ["md"]). Here the same key — a sha2 content hash —
is deduplicated *incrementally* as documents arrive on a stream, the
pattern a continuously-ingesting 100 TB corpus needs instead of the
reference's cron full re-runs.

Two state regimes:

- ``dedup_stream``: plain ``dropDuplicates`` on the hash. State holds one
  entry per distinct key forever — exact, but state grows with corpus
  cardinality. Right for bounded key spaces (event types, daily partitions).
- ``dedup_stream_within_watermark``: ``dropDuplicatesWithinWatermark`` —
  duplicates are only suppressed while they can still arrive (within the
  event-time watermark), so state is bounded by the delay window, not the
  corpus. Right for at-least-once ingestion replay (the same event
  re-delivered within minutes), which is the dominant duplicate source in
  a streaming pipeline. On a real cluster back this with the RocksDB state
  store; state per key is just the key hash + one timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["with_content_hash", "dedup_stream", "dedup_stream_within_watermark"]


def with_content_hash(df: DataFrame, text_col: str = "text", out_col: str = "content_hash") -> DataFrame:
    """Stable dedup key: sha2-256 of the content column (the identity rule
    of PydanticModel.__hash__, datacontract.py:194-206, collapsed to one
    column). Hashing before the stateful op keeps state entries at 64 bytes
    regardless of document size."""
    return df.withColumn(out_col, F.sha2(F.col(text_col).cast("string"), 256))


def dedup_stream(stream: DataFrame, keys: list[str]) -> DataFrame:
    """Exact streaming dedup: first arrival of each key wins, forever.
    Unbounded state — prefer the watermark variant for unbounded key
    spaces."""
    return stream.dropDuplicates(keys)


def dedup_stream_within_watermark(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    delay: str = "1 hour",
) -> DataFrame:
    """Watermark-bounded streaming dedup: a duplicate arriving within
    `delay` of the original (event time) is dropped; state for a key is
    reaped once the watermark passes it. Exactly-once semantics for
    at-least-once sources whose redelivery lag is < `delay`."""
    return stream.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)


def curate_stream_to_versioned_sink(
    stream,
    checkpoint_dir: str,
    writer,
    order_col: str = "doc_id",
    text_col: str = "text",
    staging_dir: str | None = None,
):
    """End-to-end STREAMING curation: a document stream is quality-filtered
    (Gopher rule battery) and PII-flag-filtered, exact-deduplicated, and
    published through the versioned-collection sink as ONE collection
    version per RUN (the reference's atomic publish-by-rename semantics).

    The source may split the input into several micro-batches
    (file-count/size admission limits), so per-batch publishing would leave
    the alias pointing at only the LAST batch's rows. Instead each
    micro-batch stages its curated rows to ``staging/batch_id=N`` parquet
    (overwrite per batch id ⇒ idempotent under replay), and after the
    availableNow stream drains, the staged union is deduplicated globally
    (first ``order_col`` per content wins — deterministic) and written
    once: one version, one alias flip, no dropped batches. Dedup is thus
    cross-batch, not within-batch-only.

    ``foreachBatch`` is the right bridge: the per-batch curation runs the
    SAME operators as the batch pipeline — no twin drift — while the
    driver-coordinated create→insert→alias→retire protocol runs exactly
    once per run. Blocks until published; returns the (terminated)
    StreamingQuery.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wurzel_spark.operators.textstats import gopher_quality_flags, pii_scan

    staging = staging_dir or f"{checkpoint_dir.rstrip('/')}_staging"
    spark = stream.sparkSession

    def _process(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        keep_ids = (
            gopher_quality_flags(batch_df, text_col)
            .filter(F.col("ok_mean_word_len") & F.col("ok_symbol_ratio"))
            .select("doc_id")
        )
        clean_ids = pii_scan(batch_df, text_col).filter(~F.col("pii_flag")).select("doc_id")
        curated = (
            batch_df.join(keep_ids, "doc_id", "left_semi")
            .join(clean_ids, "doc_id", "left_semi")
            .dropDuplicates([text_col])  # within-batch shrink before staging
        )
        curated.write.mode("overwrite").parquet(f"{staging}/batch_id={batch_id}")

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    staged = spark.read.option("recursiveFileLookup", "true").parquet(staging)
    if not staged.isEmpty():
        # Global (cross-batch) dedup, deterministic representative:
        # smallest order_col per content hash wins.
        w = Window.partitionBy(F.sha2(F.col(text_col).cast("string"), 256)).orderBy(
            order_col
        )
        final = (
            staged.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        writer.write(final, order_col=order_col, history="stream-run")
    # The staging dir's job is done once the version is published. Drop it
    # so (a) the per-run batch dirs don't accumulate across runs and (b) a
    # later run with a FRESH checkpoint (batch ids restart at 0, and a
    # shorter run would overwrite only a prefix of them) can never union
    # a previous run's stale batches into its publish.
    from wurzel_spark.streaming._fs import delete_path

    delete_path(spark, staging)
    return q
