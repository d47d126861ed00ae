"""Streaming quality-classifier scoring: a model trained on the static
corpus scores every micro-batch of new documents.

Batch twin: operators/classifier.py score_documents. Scoring is
embarrassingly batch-decomposable (each row depends only on itself and
the broadcast weights), so running the batch scorer per micro-batch
yields exactly the batch result's union under any admission split —
the canonical train-offline / score-online deployment of the curation
classifier. Weights are resolved ONCE before the stream starts (the
same static-side rule as streaming decontamination/enrichment:
re-deriving per batch would re-run training every trigger).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame

from wurzel_spark.operators.classifier import doc_features, score_documents


def score_stream(
    stream: DataFrame,
    w: np.ndarray,
    bias: float,
    out_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
):
    """Score each micro-batch with the trained (w, bias); append
    (doc_id, score, pred) parquet rows under ``out_dir``. Blocks until
    the availableNow run drains; returns the query."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        feats = doc_features(batch_df, text_col)
        score_documents(feats, w, bias).write.mode("append").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    from wurzel_spark.streaming._fs import path_exists

    spark = stream.sparkSession
    if not path_exists(spark, out_dir):  # every batch empty: nothing was scored
        spark.createDataFrame([], "doc_id long, score double, pred long").write.mode(
            "overwrite"
        ).parquet(out_dir)
    return q
