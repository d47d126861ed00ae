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

State layout (any Hadoop URI — existence checks go through the
FileSystem API, not os.path):
  - ``index_dir/batch=N``       banded signatures, ~300 B/doc — the
                                 candidate-generation state;
  - ``index_dir``+``_docs/batch=N``  (doc_id, text) verification table.
    The exact-Jaccard verify needs document text, so this side table IS
    corpus-sized — it is the cold verification store (or your existing
    lake table), NOT part of the small hot index; only candidate docs
    are ever read from it per batch (broadcast semi-join);
  - ``labels_dir``              current (doc_id, cluster_id) labeling.

Idempotence under Structured Streaming's retry contract: per-batch state
writes go to ``batch=N`` subdirectories with overwrite, so a replayed
batch REPLACES its own partition instead of appending duplicates, and
the incremental band join drops self-pairs (a replayed batch already in
the index would otherwise match itself).

STATE COMPACTION (round 5, VERDICT r4 #4): one ``batch=N`` dir per
micro-batch forever makes the FILE COUNT the bottleneck at thousands of
batches (driver listing, one task per tiny file). Every
``compact_every`` batches, batch N's write FOLDS all prior partitions
into its own: the union of batches < N (final — foreachBatch(N) only
fires after N-1's checkpoint commit, so they can never replay) plus
batch N's rows is deduplicated by id, written to ``batch=N`` with file
count sized by compact_write, and the old dirs are deleted. Write-
before-delete keeps every crash window safe: a crash between the fold
write and the deletes leaves duplicate rows across dirs, which the id
dedup on the next fold — and the set semantics of candidate generation
(distinct pairs, self-pairs dropped) — absorb without changing labels.
State is therefore O(corpus) rows in O(compact_every) directories.
Trade: each fold rewrites the accumulated state once per compact_every
batches; for a 100 TB docs side table raise compact_every (the hot
index at ~300 B/doc folds cheaply at any cadence).

Per-batch cost: the MinHash signature kernel runs ONCE (the same
signatures feed within-batch candidates, the cross-batch band join, and
the index append); verification re-reads only candidate docs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from wurzel_spark.operators.dedup import (
    build_near_dup_index,
    incremental_near_dup_pairs,
    merge_cluster_labels,
    minhash_dedup_pairs,
    near_dup_cluster_members,
)
from wurzel_spark.streaming._fs import path_exists
from wurzel_spark.streaming._state import (  # shared fold protocol
    fold_tmp as _fold_tmp,  # noqa: F401 — re-exported for tests
    recover_fold,
    write_batch_state as _write_batch_state,
)


def cluster_stream(
    stream: DataFrame,
    index_dir: str,
    labels_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    max_iters: int = 20,
    compact_every: int | None = 16,
) -> DataFrame:
    """Drain an availableNow document stream maintaining the near-dup
    index and cluster labels; returns the final (doc_id, cluster_id)
    membership frame (also persisted under ``labels_dir``).
    ``max_iters`` bounds label propagation per merge — raise it for
    long-chain dup graphs (non-convergence raises by default, see
    near_dup_cluster_members). ``compact_every`` bounds the state dirs'
    file count (None disables folding)."""
    spark = stream.sparkSession
    docs_dir = index_dir + "_docs"

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # finish any fold a crashed attempt left behind BEFORE reading state
        recover_fold(spark, index_dir, batch_id)
        recover_fold(spark, docs_dir, batch_id)
        batch_df = batch_df.localCheckpoint()
        # ONE signature pass feeds all three consumers
        sigs = build_near_dup_index(batch_df).localCheckpoint()
        within = minhash_dedup_pairs(batch_df, threshold=threshold, sigs=sigs).select(
            "id_a", "id_b"
        )
        if path_exists(spark, index_dir):
            corpus_index = spark.read.parquet(index_dir)
            corpus_docs = spark.read.parquet(docs_dir).select("doc_id", "text")
            cross = incremental_near_dup_pairs(
                batch_df,
                corpus_docs,
                corpus_index,
                threshold=threshold,
                new_sigs=sigs,
            ).select("id_a", "id_b")
            pairs = within.unionByName(cross)
        else:
            pairs = within
        if path_exists(spark, labels_dir):
            labels = spark.read.parquet(labels_dir)
            merged = merge_cluster_labels(labels, pairs, max_iters)
        else:
            merged = near_dup_cluster_members(pairs, max_iters)
        merged = merged.localCheckpoint()
        merged.write.mode("overwrite").parquet(labels_dir)
        # batch-keyed overwrite => a replayed batch replaces its own
        # partition instead of appending duplicate state forever; the
        # periodic fold bounds the dir count (write-before-delete)
        _write_batch_state(spark, sigs, index_dir, batch_id, "id", compact_every)
        _write_batch_state(
            spark,
            batch_df.select("doc_id", "text"),
            docs_dir,
            batch_id,
            "doc_id",
            compact_every,
        )

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not path_exists(spark, labels_dir):
        return spark.createDataFrame([], "doc_id long, cluster_id long")
    return spark.read.parquet(labels_dir)
