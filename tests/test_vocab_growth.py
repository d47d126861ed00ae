"""vocab_growth_curve — Heaps-law readout fixture tests."""

from wurzel_spark.operators.textstats import (
    VOCAB_GROWTH_POINTS,
    vocab_growth_curve,
)

# 8 docs; doc i introduces exactly one new token and repeats an old one
DOCS = [
    (1, "t1 t1", "s"),
    (2, "t2 t1", "s"),
    (3, "t3 t1 t1", "s"),
    (4, "t4 t2", "s"),
    (5, "t5", "s"),
    (6, "t6 t3 t3", "s"),
    (7, "t7 t1", "s"),
    (8, "t8 t4 t4 t4", "s"),
]


def _curve(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, source string")
    return {r["k"]: r.asDict() for r in vocab_growth_curve(df).collect()}


def test_exact_curve(spark):
    out = _curve(spark)
    assert len(out) == VOCAB_GROWTH_POINTS
    # with n = 8 docs, boundary k covers exactly the first k docs
    tok_counts = [2, 2, 3, 2, 1, 3, 2, 4]
    for k in range(1, 9):
        r = out[k]
        assert r["boundary_doc_id"] == k
        assert r["n_docs_prefix"] == k
        assert r["n_tokens_prefix"] == sum(tok_counts[:k])
        assert r["n_distinct_terms"] == k  # one new type per doc


def test_monotone(spark):
    out = _curve(spark)
    for col in ("n_tokens_prefix", "n_distinct_terms", "n_docs_prefix"):
        vals = [out[k][col] for k in sorted(out)]
        assert vals == sorted(vals)
