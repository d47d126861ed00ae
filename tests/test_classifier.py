"""Distributed quality classifier: parity, determinism, learning
(operators/classifier.py)."""

import numpy as np
from pyspark.sql import functions as F

from wurzel_spark.operators import classifier


def _corpus(spark):
    # two clearly separable vocabularies
    good = [f"signal quality curated text sample{i % 3}" for i in range(30)]
    bad = [f"spam noise junk garbage filler{i % 3}" for i in range(30)]
    rows = [(i, t, "en", "s") for i, t in enumerate(good)] + [
        (100 + i, t, "xx", "s") for i, t in enumerate(bad)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )
    return classifier.doc_features(docs).join(
        docs.select("doc_id", (F.col("lang") == "en").cast("long").alias("y")),
        "doc_id",
    )


def test_distributed_matches_numpy_twin_bitwise(spark):
    feats = _corpus(spark)
    w_d, b_d = classifier.train_quality_classifier(feats, n_iters=5)
    local_rows = [
        (list(r["buckets"]), int(r["y"]))
        for r in feats.orderBy("doc_id").collect()
    ]
    w_l, b_l = classifier.train_quality_classifier_local(local_rows, n_iters=5)
    assert b_d == b_l
    np.testing.assert_array_equal(w_d, w_l)  # exact, not approx


def test_training_is_partitioning_independent(spark):
    feats = _corpus(spark)
    w1, b1 = classifier.train_quality_classifier(feats.repartition(1), n_iters=3)
    w8, b8 = classifier.train_quality_classifier(feats.repartition(8), n_iters=3)
    assert b1 == b8
    np.testing.assert_array_equal(w1, w8)


def test_classifier_learns_separable_corpus(spark):
    feats = _corpus(spark)
    w, b = classifier.train_quality_classifier(feats, n_iters=20, lr=1.0)
    scored = classifier.score_documents(feats, w, b).collect()
    acc = sum(1 for r in scored if r["pred"] == r["y"]) / len(scored)
    assert acc >= 0.95
    # scores order the classes, not just threshold them
    good = [r["score"] for r in scored if r["y"] == 1]
    bad = [r["score"] for r in scored if r["y"] == 0]
    assert min(good) > max(bad)


def test_empty_doc_scores_at_bias(spark):
    docs = spark.createDataFrame(
        [(1, "", "en", "s"), (2, "words here", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    feats = classifier.doc_features(docs)
    out = {r["doc_id"]: r for r in classifier.score_documents(feats, np.zeros(1024), 0.0).collect()}
    assert out[1]["score"] == 0.5  # sigmoid(bias=0)
