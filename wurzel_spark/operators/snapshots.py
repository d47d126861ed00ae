"""Corpus snapshot diffing — the incremental-ingest planner.

A continuously-maintained 100 TB corpus is re-crawled/re-exported in
snapshots; the expensive downstream stages (embedding, indexing, KB
upload) must run on the DELTA, not the corpus. ``snapshot_diff`` compares
two snapshots by content hash and emits one row per changed identity:
``added`` (id only in new), ``removed`` (id only in old), ``changed``
(both, different content). Unchanged rows are dropped — at scale the
delta is orders of magnitude smaller than the snapshots.

Extends the reference's hash-identity machinery (content sha256 is the
dedup/idempotence key throughout: datacontract.py:194-206,
qdrant/step.py:282) from within-run identity to BETWEEN-run change
detection; pairs with the versioned sink (upload the delta, flip the
alias) and incremental near-dup maintenance (index only ``added`` +
``changed`` docs).

Scale shape: two map-side sha2 projections + ONE full outer join keyed
on the id — a single co-partitioned shuffle of (id, 32-byte hash), never
of document text. Filter and status derivation are row-local.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wurzel_spark.tables import table


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, status ∈ {added, removed, changed}) between two snapshots.
    Content identity = sha256 of the text column (the reference's
    identity rule); unchanged ids are dropped."""
    oh = old.select(
        F.col(id_col).alias("id"), F.sha2(F.col(text_col), 256).alias("old_hash")
    )
    nh = new.select(
        F.col(id_col).alias("id"), F.sha2(F.col(text_col), 256).alias("new_hash")
    )
    joined = oh.join(nh, "id", "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), F.lit("added"))
        .when(F.col("new_hash").isNull(), F.lit("removed"))
        .when(F.col("old_hash") != F.col("new_hash"), F.lit("changed"))
    )
    return (
        joined.select(F.col("id").alias(id_col), status.alias("status"))
        .filter(F.col("status").isNotNull())
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic two-snapshot scenario over the documents table: the old
    snapshot is missing every 7th-residue doc (they're "new crawls"), the
    new snapshot drops every 13th-residue doc (they're "expired") and
    rewrites the text of every 11th-residue doc (re-crawled content)."""
    docs = table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 7 != 3).select("doc_id", "text")
    new = (
        docs.filter(F.col("doc_id") % 13 != 5)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" [v2]"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    return snapshot_diff(old, new).orderBy("doc_id", "status")


SNAPSHOT_DIFF_SQL = """
WITH old AS (
  SELECT doc_id, sha256(text) AS old_hash FROM documents WHERE doc_id % 7 != 3
), new AS (
  SELECT doc_id,
         sha256(CASE WHEN doc_id % 11 = 0 THEN text || ' [v2]' ELSE text END) AS new_hash
  FROM documents WHERE doc_id % 13 != 5
), j AS (
  SELECT COALESCE(old.doc_id, new.doc_id) AS doc_id, old_hash, new_hash
  FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
)
SELECT doc_id,
       CASE WHEN old_hash IS NULL THEN 'added'
            WHEN new_hash IS NULL THEN 'removed'
            WHEN old_hash != new_hash THEN 'changed' END AS status
FROM j
WHERE old_hash IS NULL OR new_hash IS NULL OR old_hash != new_hash
ORDER BY doc_id, status
"""
