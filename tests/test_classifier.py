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


# ------------------------------------------------ language classifier (r6)


def _lang_corpus(spark):
    """Three synthetic 'languages' with distinct character statistics."""
    rows = []
    pats = {
        "aa": "the quick brown fox jumps over lazy dogs near {i}",
        "bb": "der schnelle braune fuchs springt ueber faule hunde {i}",
        "cc": "zzxq vvkw qqzz xxvv wwqq zzkk qxqx vzvz wkwk {i}",
    }
    i = 0
    for lang, pat in pats.items():
        for j in range(25):
            rows.append((i, pat.format(i=j), lang, "s"))
            i += 1
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    )


def test_lang_classifier_matches_numpy_twin_bitwise(spark):
    docs = _lang_corpus(spark)
    feats = classifier.char_ngram_features(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    langs = ["aa", "bb", "cc"]
    dist = classifier.train_lang_classifier(feats, langs, n_iters=4)
    local_rows = [
        (list(r["buckets"]), r["lang"]) for r in feats.orderBy("doc_id").collect()
    ]
    local = classifier.train_lang_classifier_local(local_rows, langs, n_iters=4)
    for lang in langs:
        assert dist[lang][1] == local[lang][1]
        np.testing.assert_array_equal(dist[lang][0], local[lang][0])  # exact


def test_lang_classifier_learns_and_scores_argmax(spark):
    docs = _lang_corpus(spark)
    feats = classifier.char_ngram_features(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    langs = ["aa", "bb", "cc"]
    models = classifier.train_lang_classifier(feats, langs, n_iters=15, lr=2.0)
    scored = (
        classifier.score_languages(feats, models)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .collect()
    )
    acc = sum(1 for r in scored if r["predicted_lang"] == r["lang"]) / len(scored)
    assert acc >= 0.95
    assert all(0.0 < r["score"] < 1.0 for r in scored)


def test_lang_features_partitioning_and_truncation(spark):
    docs = _lang_corpus(spark)
    feats = classifier.char_ngram_features(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    m1 = classifier.train_lang_classifier(feats.repartition(1), ["aa"], n_iters=3)
    m8 = classifier.train_lang_classifier(feats.repartition(8), ["aa"], n_iters=3)
    assert m1["aa"][1] == m8["aa"][1]
    np.testing.assert_array_equal(m1["aa"][0], m8["aa"][0])
    # features see only the first LANG_ID_MAX_CHARS chars — a doc padded
    # beyond the cap has identical buckets
    long_docs = spark.createDataFrame(
        [(1, "abc def " * 32, "aa", "s"), (2, "abc def " * 320, "aa", "s")],
        "doc_id long, text string, lang string, source string",
    )
    out = {
        r["doc_id"]: sorted(r["buckets"])
        for r in classifier.char_ngram_features(long_docs).collect()
    }
    assert out[1] == out[2]
