"""quality_threshold_sweep — yield-curve fixture tests: exact counts on
a crafted corpus, monotone curves, empty-doc handling, grid completeness
(the registered query's oracle pins cross-engine equality; these pin the
semantics on inputs the driver corpus can't discriminate)."""

from pyspark.sql import functions as F

from wurzel_spark.operators.textstats import (
    QUALITY_SWEEP_POINTS,
    QUALITY_SWEEP_STEP,
    quality_threshold_sweep,
)

# stopword density: "the the the the" → q1000 = 1000; "x y z w" → 0;
# "the x" → 500; "" → 0 (empty doc rule)
DOCS = [
    (1, "the the the the", "a"),  # q1000 = 1000, 4 tokens
    (2, "x y z w", "a"),          # q1000 = 0,    4 tokens
    (3, "the x", "a"),            # q1000 = 500,  2 tokens
    (4, "", "b"),                 # q1000 = 0,    0 tokens (empty)
    (5, "the of in", "b"),        # q1000 = 1000, 3 tokens
]


def _sweep(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, source string")
    rows = quality_threshold_sweep(df).collect()
    return {(r["source"], r["threshold"]): r.asDict() for r in rows}


def test_grid_complete_per_source(spark):
    out = _sweep(spark)
    assert len(out) == 2 * QUALITY_SWEEP_POINTS
    for src in ("a", "b"):
        for k in range(QUALITY_SWEEP_POINTS):
            assert (src, k * QUALITY_SWEEP_STEP) in out


def test_exact_counts_source_a(spark):
    out = _sweep(spark)
    # threshold 0 keeps everything
    assert out[("a", 0)]["n_docs_kept"] == 3
    assert out[("a", 0)]["n_tokens_kept"] == 10
    assert out[("a", 0)]["doc_frac"] == 1.0
    # threshold 500 keeps docs 1 and 3 (q1000 = 1000, 500)
    assert out[("a", 500)]["n_docs_kept"] == 2
    assert out[("a", 500)]["n_tokens_kept"] == 6
    # threshold 600..1000 keeps only doc 1
    for t in (600, 1000):
        assert out[("a", t)]["n_docs_kept"] == 1
        assert out[("a", t)]["n_tokens_kept"] == 4
    assert out[("a", 1000)]["doc_frac"] == 1.0 / 3.0
    assert out[("a", 1000)]["token_frac"] == 4.0 / 10.0


def test_empty_doc_scores_zero_and_counts_in_totals(spark):
    out = _sweep(spark)
    # source b: empty doc 4 (q=0) + doc 5 (q=1000)
    assert out[("b", 0)]["n_docs_kept"] == 2
    assert out[("b", 0)]["n_tokens_kept"] == 3
    assert out[("b", 100)]["n_docs_kept"] == 1  # empty doc gated out
    assert out[("b", 1000)]["n_docs_kept"] == 1
    assert out[("b", 1000)]["token_frac"] == 1.0  # all tokens survive


def test_curves_monotone_nonincreasing(spark):
    out = _sweep(spark)
    for src in ("a", "b"):
        for col in ("n_docs_kept", "n_tokens_kept", "doc_frac", "token_frac"):
            vals = [
                out[(src, k * QUALITY_SWEEP_STEP)][col]
                for k in range(QUALITY_SWEEP_POINTS)
            ]
            assert vals == sorted(vals, reverse=True), (src, col, vals)
