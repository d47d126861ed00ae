"""Selection operators: cluster representatives, domain caps, temperature
sampling (operators/selection.py)."""

import pytest
from pyspark.sql import functions as F

from wurzel_spark.operators import dedup, selection


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def test_cluster_members_match_cluster_sizes(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    members = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.near_dup_cluster_members(pairs).collect()
    }
    assert members == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
    sizes = {r["cluster_id"]: r["size"] for r in dedup.near_dup_clusters(pairs).collect()}
    assert sizes == {1: 3, 10: 2}


def test_cluster_best_keep_prefers_longest_then_min_id(spark):
    docs = _docs(
        spark,
        [
            (1, "a b", "en", "s"),
            (2, "a b c d e", "en", "s"),   # longest in cluster {1,2,3}
            (3, "a b c", "en", "s"),
            (10, "x y", "en", "s"),
            (11, "p q", "en", "s"),        # tie with 10 on n_words → keep 10
        ],
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "id_a long, id_b long")
    out = {r["cluster_id"]: r for r in selection.cluster_best_keep(docs, pairs).collect()}
    assert out[1]["keep_doc_id"] == 2 and out[1]["keep_n_words"] == 5
    assert out[1]["size"] == 3
    assert out[10]["keep_doc_id"] == 10 and out[10]["size"] == 2


def test_domain_cap_sample_caps_and_is_deterministic(spark):
    rows = [(i, "t", "en", f"s{i % 3}") for i in range(60)]
    docs = _docs(spark, rows)
    kept = selection.domain_cap_sample(docs, cap=5)
    a = kept.collect()
    per = {}
    for r in a:
        per[r["source"]] = per.get(r["source"], 0) + 1
        assert 1 <= r["rk"] <= 5
    assert per == {"s0": 5, "s1": 5, "s2": 5}
    assert a == selection.domain_cap_sample(docs, cap=5).collect()  # stable


def test_domain_cap_under_cap_keeps_all(spark):
    docs = _docs(spark, [(1, "t", "en", "a"), (2, "t", "en", "a")])
    assert selection.domain_cap_sample(docs, cap=10).count() == 2


def test_temperature_sample_keeps_smallest_lang_fully(spark):
    rows = [(i, "t", "big", "s") for i in range(400)] + [
        (1000 + i, "t", "small", "s") for i in range(4)
    ]
    docs = _docs(spark, rows)
    out = {r["lang"]: r for r in selection.temperature_mixture_sample(docs).collect()}
    # smallest language: threshold = 2^32 → every hash < threshold → all kept
    assert out["small"]["n_kept"] == out["small"]["n_docs"] == 4
    # head language is downweighted: kept strictly fewer, roughly sqrt share
    big = out["big"]
    assert 0 < big["n_kept"] < big["n_docs"]
    expected_rate = (4 / 400) ** 0.5
    assert big["n_kept"] == pytest.approx(400 * expected_rate, rel=0.8)


def test_temperature_sample_single_lang_keeps_everything(spark):
    docs = _docs(spark, [(i, "t", "en", "s") for i in range(10)])
    row = selection.temperature_mixture_sample(docs).collect()[0]
    assert row["n_kept"] == row["n_docs"] == 10
