"""Production-hasher twins (VERDICT r6 Missing #3): the xxhash64
configurations of winnowing and Bloom decontamination are rows-only by
design (engine-internal hash values), so these tests pin every
hasher-INDEPENDENT guarantee instead — the properties a 100 TB run
relies on when it switches off the md5-for-oracle hasher.

Winnowing (Schleimer et al. 2003 §4): WHICH hashes get selected as
fingerprints depends on the hash function, but (a) identical documents
select identical fingerprint sets under ANY hash, and (b) any shared run
of w + k - 1 words shares ≥1 selected fingerprint under ANY hash. Bloom:
true containment hits are membership of the actual span string — a
contained span always hits whatever the hash; only the (bounded) false
positives move.
"""

import pytest
from pyspark.sql import functions as F


def _pairs(df, hasher, threshold=1e-9):
    from wurzel_spark.operators.dedup import winnow_overlap_pairs

    rows = winnow_overlap_pairs(
        df, k=5, w=4, threshold=threshold, hasher=hasher
    ).collect()
    return {(r["id_a"], r["id_b"]): r["overlap"] for r in rows}


def test_winnow_hasher_independent_guarantees(spark):
    shared_run = "alpha beta gamma delta epsilon zeta eta theta"  # w+k-1 = 8 words
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
            (3, f"intro words here {shared_run} closing remarks one"),
            (4, f"totally different opening {shared_run} and another ending"),
            (5, "unrelated content about completely independent topics entirely"),
        ],
        "doc_id long, text string",
    )
    md5 = _pairs(df, "md5")
    xx = _pairs(df, "xxhash64")
    # identical docs: overlap exactly 1.0 under BOTH hashers
    assert md5[(1, 2)] == 1.0 and xx[(1, 2)] == 1.0
    # the shared-run guarantee: (3,4) share an 8-word run → ≥1 shared
    # fingerprint under ANY hash function
    assert (3, 4) in md5 and (3, 4) in xx
    # doc 5 shares no gram with anyone → no pair under either hasher
    assert not any(5 in p for p in md5) and not any(5 in p for p in xx)


def test_winnow_fast_query_runs_and_finds_exact_dups(spark, sf_dir):
    """The registered production query: every pair the md5 twin reports
    at overlap 1.0 (exact containment — hash-independent) must also be
    reported by the xxhash64 twin."""
    from wurzel_spark.operators.dedup import q_winnow_overlap, q_winnow_overlap_fast

    md5_pairs = {
        (r["id_a"], r["id_b"])
        for r in q_winnow_overlap(spark, sf_dir).collect()
        if r["overlap"] >= 1.0
    }
    fast = q_winnow_overlap_fast(spark, sf_dir)
    fast_pairs = {(r["id_a"], r["id_b"]) for r in fast.collect()}
    assert md5_pairs, "test corpus lost its exact-dup pairs"
    assert md5_pairs <= fast_pairs
    assert fast.columns == ["id_a", "id_b", "n_shared", "overlap"]


def test_bloom_kernel_hasher_parity_on_corpus(spark, sf_dir):
    """md5 vs xxhash64 kernel on the real corpus: n_spans and
    n_exact_hits are hash-independent and must match PER DOC; bloom hits
    only ever add false positives (n_false_pos ≥ 0)."""
    from wurzel_spark.operators.sketches import bloom_decontamination_kernel
    from wurzel_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 100 != 0)
    ev = docs.filter(F.col("doc_id") % 100 == 0)
    a = bloom_decontamination_kernel(corpus, ev, hasher="md5").collect()
    b = bloom_decontamination_kernel(corpus, ev, hasher="xxhash64").collect()
    am = {r["doc_id"]: r for r in a}
    bm = {r["doc_id"]: r for r in b}
    assert am.keys() == bm.keys()
    for did, ra in am.items():
        rb = bm[did]
        assert ra["n_spans"] == rb["n_spans"]
        assert ra["n_exact_hits"] == rb["n_exact_hits"], did
        assert rb["n_false_pos"] >= 0
    assert sum(r["n_exact_hits"] for r in a) > 0, "vacuous: no true hits"


def test_bloom_xxhash_no_false_negatives(spark):
    """The signed-shift hazard (negative xxhash64 on the driver vs uint64
    logical shift in the numpy probe): a true contained span must ALWAYS
    bloom-hit. 200 planted spans make a sign-bit mismatch statistically
    impossible to miss (~half of xxhash64 values are negative)."""
    from wurzel_spark.operators.sketches import bloom_decontamination_kernel

    rows = [(i, f"planted span number {i} " * 4) for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = bloom_decontamination_kernel(docs, docs, hasher="xxhash64").collect()
    for r in out:
        assert r["n_bloom_hits"] >= r["n_exact_hits"]
        assert r["n_exact_hits"] == r["n_spans"], r  # every span is planted
