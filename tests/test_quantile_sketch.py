"""Bottom-k hash-sample quantile sketch — guarantee tests: small-group
exactness (sample ⊇ group ⇒ zero rank error), merge semilattice law,
and streaming parity (in test_streaming.py)."""

from pyspark.sql import functions as F

from wurzel_spark.operators.sketches import (
    bottomk_sample,
    hash_sample_quantile_eval,
    sample_quantile_estimates,
)


def _docs(spark, n, source="s"):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit(source).alias("source"),
        # spread of values with ties: 7 distinct values over n docs
        (F.col("id") % 7 * 10 + 3).cast("int").alias("n_chars"),
    )


def test_small_group_sample_is_exact(spark):
    """A group with ≤ k rows is fully contained in its own bottom-k
    sample, so est == exact and the rank interval covers the target."""
    out = hash_sample_quantile_eval(_docs(spark, 100), k=128).collect()
    assert len(out) == 3
    for r in out:
        assert r["sample_k"] == 100 and r["n_docs"] == 100
        assert r["est"] == r["exact"]
        assert r["rank_err"] == 0


def test_rank_interval_semantics(spark):
    """n_below < rank_target ≤ n_at_or_below ⇔ rank_err == 0; the exact
    quantile itself always satisfies it (definitional self-check)."""
    out = hash_sample_quantile_eval(_docs(spark, 500), k=64).collect()
    for r in out:
        covered = r["n_below"] + 1 <= r["rank_target"] <= r["n_at_or_below"]
        assert covered == (r["rank_err"] == 0)
        # with k=64 over 7 distinct values the sample hits every value,
        # so estimates are exact despite 8x subsampling
        assert r["rank_err"] == 0


def test_bottomk_merge_semilattice(spark):
    """bottomk(bottomk(A) ∪ bottomk(B)) == bottomk(A ∪ B) — the law that
    makes the sketch partitioning- and batch-order-independent."""
    a = _docs(spark, 300).filter(F.col("doc_id") % 2 == 0)
    b = _docs(spark, 300).filter(F.col("doc_id") % 2 == 1)
    k = 32
    merged = bottomk_sample(
        bottomk_sample(a, k).unionByName(bottomk_sample(b, k)), k
    )
    direct = bottomk_sample(a.unionByName(b), k)
    assert sorted(r["doc_id"] for r in merged.collect()) == sorted(
        r["doc_id"] for r in direct.collect()
    )


def test_estimates_partitioning_independent(spark):
    d = _docs(spark, 400)
    e1 = sample_quantile_estimates(bottomk_sample(d.repartition(1), 64), 64)
    e7 = sample_quantile_estimates(bottomk_sample(d.repartition(7), 64), 64)
    assert sorted(map(tuple, e1.collect())) == sorted(map(tuple, e7.collect()))
