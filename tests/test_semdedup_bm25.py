"""SemDeDup keep-rule semantics and BM25 ranking math, hand-checked on
tiny corpora (oracle parity for both queries is covered by
tools/verify_local.py / the driver gate)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from wurzel_spark.operators.similarity import semdedup_keep
from wurzel_spark.operators.textstats import (
    _BM25_B,
    _BM25_K1,
    _BM25_SCALE,
    bm25_topk,
)


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_semdedup_drops_later_ranked_near_dup(spark):
    # centroid c0=(1,0); members: a=(1,0) sim 1.0 (rank 1),
    # b=(0.99,0.141) sim≈0.99 (rank 2, cos(a,b)≈0.99 → dropped),
    # c=(0.5,0.866) sim 0.5 (rank 3, cos to a = 0.5, to b ≈ 0.62 → kept)
    rows = [
        (0, [1.0, 0.0]),
        (10, [1.0, 0.0]),
        (11, [0.99, 0.141]),
        (12, [0.5, 0.866]),
    ]
    emb = _emb(spark, rows)
    cents = emb.filter(F.col("vec_id") == 0)
    kept = semdedup_keep(emb, cents, threshold=0.9).collect()
    ids = [r["vec_id"] for r in kept]
    assert 11 not in ids  # near-dup of higher-ranked 0/10
    assert 12 in ids  # below threshold to everything kept
    # ties: 0 and 10 are identical vectors; rank orders ties by id, so 0
    # is rank 1 and 10 (cos=1.0 to it) is dropped
    assert 0 in ids and 10 not in ids


def test_semdedup_keeps_lowest_centroid_sim_representative(spark):
    # two clusters of near-identical vectors: within each, only the
    # FIRST-ranked (highest centroid sim, lowest id on ties) survives a
    # chain where all pairwise sims exceed the threshold
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])] + [
        (100 + i, [1.0, 0.001 * i]) for i in range(5)
    ] + [(200 + i, [0.002 * i, 1.0]) for i in range(3)]
    emb = _emb(spark, rows)
    cents = emb.filter(F.col("vec_id") < 2)
    kept = {r["vec_id"] for r in semdedup_keep(emb, cents, threshold=0.99).collect()}
    # every near-identical chain collapses to exactly one member per cell
    assert {v for v in kept if v >= 200 or v == 1} == {1}
    assert {v for v in kept if 2 <= v < 200 or v == 0} == {0}


def _bm25_expected(docs, queries, k1=_BM25_K1, b=_BM25_B):
    n = len(docs)
    avgdl = sum(len(ws) for ws in docs.values()) / n
    terms = {t for ts in queries.values() for t in ts}
    dfc = {t: sum(1 for ws in docs.values() if t in ws) for t in terms}
    out = {}
    for qid, ts in queries.items():
        for did, ws in docs.items():
            s = 0
            for t in ts:
                tf = ws.count(t)
                if tf == 0 or dfc[t] == 0:
                    continue
                idf = math.log((n - dfc[t] + 0.5) / (dfc[t] + 0.5) + 1.0)
                sc = idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * ((1.0 - b) + b * len(ws) / avgdl)
                )
                s += math.floor(sc * _BM25_SCALE)
            if s:
                out[(qid, did)] = s
    return out


def test_bm25_matches_hand_math(spark):
    docs = {
        0: "spark join join fast".split(),
        1: "hash table scan scan scan".split(),
        2: "spark stream window dup".split(),
        3: "the a value".split(),
    }
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in docs.items()], "doc_id bigint, text string"
    )
    queries = {0: ("spark", "join"), 1: ("scan", "dup")}
    got = {
        (r["query_id"], r["doc_id"]): r["score_q20"]
        for r in bm25_topk(df, queries, k=10).collect()
    }
    assert got == _bm25_expected(docs, queries)


def test_bm25_rank_order_and_k(spark):
    df = spark.createDataFrame(
        [(i, "spark " * (i + 1)) for i in range(6)], "doc_id bigint, text string"
    )
    rows = bm25_topk(df, {0: ("spark",)}, k=3).collect()
    assert [r["rank"] for r in rows] == [1, 2, 3]
    # scores non-increasing, ties broken by doc_id ascending
    scores = [r["score_q20"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert len(rows) == 3


# ------------------------------------------------------- retrieval eval

def test_retrieval_self_eval_ranks_unique_prefix_first(spark):
    from wurzel_spark.operators.textstats import retrieval_self_eval

    rows = [
        (0, "zebra qualia xylophone unique prefix tokens plus shared tail words", "en", "s"),
        (1, "shared tail words appear here too", "en", "s"),
        (2, "more shared tail words filler", "en", "s"),
        (3, "completely different content block", "en", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    out = {r["query_id"]: r for r in retrieval_self_eval(docs, every=4).collect()}
    # doc 0 is the only query; its distinctive prefix must retrieve itself first
    assert list(out) == [0]
    assert out[0]["gold_rank"] == 1 and out[0]["hit_at_1"] == 1
    assert out[0]["rr"] == 1.0


def test_retrieval_self_eval_skips_empty_query_docs(spark):
    rows = [(0, "   ", "en", "s"), (1, "some words", "en", "s")]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    from wurzel_spark.operators.textstats import retrieval_self_eval

    assert retrieval_self_eval(docs, every=2).count() == 0  # doc 0 empty, doc 1 not a query
