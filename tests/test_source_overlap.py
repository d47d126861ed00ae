"""source_overlap_matrix — containment fixture tests (asymmetry, zero
overlap, self-pairs excluded)."""

from wurzel_spark.operators.textstats import source_overlap_matrix

SHARED = "alpha beta gamma delta epsilon"  # one 5-gram

DOCS = [
    # source a: 2 distinct 5-grams (the shared one + one private)
    (1, SHARED + " zeta", "a"),          # grams: SHARED, "beta..zeta"
    # source b: 4 tokens of filler then the shared gram → several grams,
    # exactly one of which equals SHARED
    (2, "one two three four " + SHARED, "b"),
    # source c: no 5-gram at all (4 tokens)
    (3, "too short for grams", "c"),
]


def _m(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string, source string")
    return {(r["src_a"], r["src_b"]): r.asDict() for r in source_overlap_matrix(df).collect()}


def test_shared_gram_counted_and_asymmetric(spark):
    m = _m(spark)
    # doc1 has 2 grams; doc2 has 5 grams (9 tokens → 5 windows)
    assert m[("a", "b")]["n_grams_a"] == 2
    assert m[("b", "a")]["n_grams_a"] == 5
    assert m[("a", "b")]["n_shared"] == 1
    assert m[("b", "a")]["n_shared"] == 1
    assert m[("a", "b")]["containment"] == 0.5
    assert m[("b", "a")]["containment"] == 0.2


def test_empty_source_zero_rows_handled(spark):
    m = _m(spark)
    # source c produced no grams → absent from the frame (sizes-driven);
    # a and b pairs with c don't exist
    assert ("a", "c") not in m and ("c", "a") not in m
    # no self-pairs
    assert ("a", "a") not in m
    assert len(m) == 2
