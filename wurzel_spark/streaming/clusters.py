"""Streaming near-dup CLUSTER maintenance: the live form of the whole
dedup pipeline — per micro-batch, find the batch's near-dup pairs
(within-batch + against everything already ingested via the persistable
index) and fold them into the published (doc_id, cluster_id) labeling
with merge_cluster_labels.

Batch twin: minhash_dedup_pairs → near_dup_cluster_members over the full
corpus. Parity holds because (a) banded-LSH candidate generation is
per-pair symmetric — a pair is found whenever BOTH docs' band hashes
exist, whichever batch each arrived in (new-vs-index + new-vs-new per
batch covers exactly the full pair set across batches), and (b) label
merging is exact by star compression (see merge_cluster_labels).

Scale shape per batch: signature kernel over the batch only; band join
against the ~300 B/doc index, never old text; label merge over the
dup graph. State staged as parquet: the growing index and the current
labels — both orders of magnitude smaller than the corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wurzel_spark.operators.dedup import (
    build_near_dup_index,
    incremental_near_dup_pairs,
    merge_cluster_labels,
    minhash_dedup_pairs,
    near_dup_cluster_members,
)

_EMPTY_PAIRS = "id_a long, id_b long"


def cluster_stream(
    stream: DataFrame,
    index_dir: str,
    labels_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Drain an availableNow document stream maintaining the near-dup
    index and cluster labels; returns the final (doc_id, cluster_id)
    membership frame (also persisted under ``labels_dir``)."""
    spark = stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        batch_df = batch_df.localCheckpoint()
        within = minhash_dedup_pairs(batch_df, threshold=threshold).select(
            "id_a", "id_b"
        )
        if os.path.isdir(index_dir):
            corpus_index = spark.read.parquet(index_dir)
            # corpus text is not needed: incremental verification
            # re-shingles candidates from their stored signatures' doc ids
            # — but the exact-Jaccard verify needs text, so keep a text
            # side-table next to the index
            corpus_docs = spark.read.parquet(index_dir + "_docs")
            cross = incremental_near_dup_pairs(
                batch_df, corpus_docs, corpus_index, threshold=threshold
            ).select("id_a", "id_b")
            pairs = within.unionByName(cross)
        else:
            pairs = within
        if os.path.isdir(labels_dir):
            labels = spark.read.parquet(labels_dir)
            merged = merge_cluster_labels(labels, pairs)
        else:
            merged = near_dup_cluster_members(pairs)
        # stage updated state (write to tmp then replace is the durable
        # pattern; at test scale an overwrite into a fresh dir suffices)
        merged = merged.localCheckpoint()
        merged.write.mode("overwrite").parquet(labels_dir)
        build_near_dup_index(batch_df).write.mode("append").parquet(index_dir)
        batch_df.select("doc_id", "text").write.mode("append").parquet(
            index_dir + "_docs"
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(labels_dir):
        return spark.createDataFrame([], "doc_id long, cluster_id long")
    return spark.read.parquet(labels_dir)
