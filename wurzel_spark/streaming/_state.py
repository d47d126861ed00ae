"""Batch-keyed streaming state with crash-safe periodic compaction.

The shared state protocol for foreachBatch operators (clusters, novelty,
and any future index-maintaining stream):

  - each micro-batch lands its state rows under ``state_dir/batch=N``
    with OVERWRITE, so an at-least-once replay replaces rather than
    duplicates its rows;
  - every ``compact_every`` partitions, the write FOLDS all partitions
    plus the current batch into one ``batch=-(N+1)`` dir (negative id ⇒
    never collides with a replayed batch's own partition), bounding the
    directory/file count at O(compact_every) regardless of batch count;
  - the fold is crash-safe by construction: staged to a sibling tmp
    (validated by parquet's ``_SUCCESS`` marker), deletes run only after
    the staged write, the rename is last, and :func:`recover_fold`
    completes or discards an interrupted fold before the next read.
    Duplicate rows in any crash window are absorbed by the key-dedup on
    the next fold — callers must therefore only store rows that are
    deterministic per key (signatures, hashes, id-keyed facts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wurzel_spark.operators.layout import compact_write
from wurzel_spark.streaming._fs import (
    delete_path,
    list_batch_ids,
    path_exists,
    rename_path,
)


def fold_tmp(state_dir: str) -> str:
    return f"{state_dir}__fold_tmp"


def recover_fold(spark, state_dir: str, batch_id: int) -> None:
    """Complete (or roll back) a fold interrupted by a crash, BEFORE the
    state dir is read this batch. A fold tmp with a ``_SUCCESS`` marker is
    a complete superset of every surviving ``batch=`` partition (it was
    written from their union before any delete), so completion = delete
    the partitions, rename tmp in. A tmp WITHOUT the marker is a partial
    job output — the partitions are still intact (deletes only run after
    a successful tmp write), so it is simply discarded."""
    tmp = fold_tmp(state_dir)
    if not path_exists(spark, tmp):
        return
    if not path_exists(spark, f"{tmp}/_SUCCESS"):
        delete_path(spark, tmp)
        return
    for b in list_batch_ids(spark, state_dir):
        delete_path(spark, f"{state_dir}/batch={b}")
    rename_path(spark, tmp, f"{state_dir}/batch={-batch_id - 1}")


def write_batch_state(
    spark,
    df: DataFrame,
    state_dir: str,
    batch_id: int,
    key_cols: str | list[str],
    compact_every: int | None,
    fold=None,
    fold_current: bool = True,
) -> None:
    """Land one batch's state rows (see module docstring for the full
    protocol). ``key_cols``: the identity whose rows are deterministic —
    the fold dedups on it.

    ``fold``: optional ``DataFrame -> DataFrame`` replacing the default
    key-dedup at fold points, for state whose reduction is NOT
    pick-any-per-key (e.g. keep the MIN-ordered row per content hash).
    The callable MUST be idempotent (``fold(fold(x)) == fold(x)``) and
    absorb exact-duplicate rows — those are the crash-window guarantees
    the default dedup provides and every fold must preserve.

    ``fold_current=False``: exclude the IN-FLIGHT batch from the fold —
    required for any fold that RE-KEYS rows (e.g. sums partials under a
    sentinel batch key, destroying per-batch identity). With such a fold,
    absorbing the current batch is replay-unsafe: a crash between the
    fold rename and the checkpoint commit replays batch N, whose re-staged
    ``batch=N`` rows are no longer recognizable as already-counted
    (ADVICE r7, streaming/fof.py). Excluding it is sufficient: every
    PRIOR batch is checkpoint-committed (batch N only runs after N-1
    commits) and can never replay, so re-keying committed rows is safe,
    while batch N keeps its own overwrite-idempotent partition. Folds
    that preserve the staged keys (bottom-k, max-merge, min-per-content,
    plain dedup) stay ``fold_current=True`` — replayed rows are exact
    per-key duplicates the fold absorbs."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    prior = [b for b in list_batch_ids(spark, state_dir) if b != batch_id]
    if compact_every is None or len(prior) + 1 < compact_every:
        df.write.mode("overwrite").parquet(f"{state_dir}/batch={batch_id}")
        return
    if fold is not None and not fold_current:
        # land the current batch first (overwrite ⇒ replay-safe), then
        # fold only the committed priors; deletes must skip batch=N.
        # recover_fold's crash path deletes ALL partitions including
        # batch=N before renaming the tmp in — safe, because a pending
        # tmp implies batch N never committed, so the replaying _process
        # rewrites batch=N immediately after recovery.
        df.write.mode("overwrite").parquet(f"{state_dir}/batch={batch_id}")
        union = (
            spark.read.parquet(state_dir)
            .filter(F.col("batch") != batch_id)
            .drop("batch")
            .select(df.columns)
        )
        folded = fold(union).localCheckpoint(eager=True)
        tmp = fold_tmp(state_dir)
        compact_write(folded, tmp)
        for b in list_batch_ids(spark, state_dir):
            if b != batch_id:
                delete_path(spark, f"{state_dir}/batch={b}")
        rename_path(spark, tmp, f"{state_dir}/batch={-batch_id - 1}")
        return
    # the state read includes a crashed earlier attempt's own batch=N
    # partition if present — the key dedup collapses it with df's rows
    union = df.unionByName(
        spark.read.parquet(state_dir).drop("batch").select(df.columns)
    )
    folded = fold(union) if fold is not None else union.dropDuplicates(keys)
    # cut the file lineage before the source dirs are deleted/renamed
    folded = folded.localCheckpoint(eager=True)
    tmp = fold_tmp(state_dir)
    compact_write(folded, tmp)
    for b in list_batch_ids(spark, state_dir):
        delete_path(spark, f"{state_dir}/batch={b}")
    rename_path(spark, tmp, f"{state_dir}/batch={-batch_id - 1}")
