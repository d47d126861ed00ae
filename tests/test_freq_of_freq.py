"""term_freq_of_freq (Good-Turing input) + eval_sample_manifest —
fixture tests."""

from pyspark.sql import functions as F

from wurzel_spark.operators.textstats import (
    EVAL_SAMPLE_PER_STRATUM,
    eval_sample_manifest,
    term_freq_of_freq,
)

# source a: "x" ×3, "y" ×2, "z" ×1  →  f1=1 (z), f2=1 (y), f3=1 (x),
# n_types=3, n_tokens=6, p_unseen = 1/6
DOCS = [
    (1, "x y z", "a", "en"),
    (2, "x y", "a", "en"),
    (3, "x", "a", "en"),
]


def test_freq_of_freq_exact(spark):
    df = spark.createDataFrame(
        DOCS, "doc_id long, text string, source string, lang string"
    )
    r = term_freq_of_freq(df).collect()
    assert len(r) == 1
    d = r[0].asDict()
    assert d["n_tokens"] == 6 and d["n_types"] == 3
    assert (d["f1"], d["f2"], d["f3"], d["f4"], d["f5"]) == (1, 1, 1, 0, 0)
    assert d["p_unseen"] == 1.0 / 6.0


def test_freq_cap_buckets_heavy_terms(spark):
    # a term occurring 10 times lands in the capped bucket, not f1..f5
    df = spark.createDataFrame(
        [(1, " ".join(["w"] * 10), "s", "en")],
        "doc_id long, text string, source string, lang string",
    )
    d = term_freq_of_freq(df).collect()[0].asDict()
    assert d["n_tokens"] == 10 and d["n_types"] == 1
    assert all(d[f"f{i}"] == 0 for i in range(1, 6))
    assert d["p_unseen"] == 0.0


def test_eval_sample_deterministic_and_bounded(spark):
    rows = [(i, "t", f"s{i % 3}", "en" if i % 2 else "de") for i in range(200)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string"
    )
    a = sorted(map(tuple, eval_sample_manifest(df.repartition(1)).collect()))
    b = sorted(map(tuple, eval_sample_manifest(df.repartition(7)).collect()))
    assert a == b
    per = {}
    for src, lang, _, rk in a:
        per.setdefault((src, lang), []).append(rk)
    for key, rks in per.items():
        assert sorted(rks) == list(range(1, len(rks) + 1))
        assert len(rks) <= EVAL_SAMPLE_PER_STRATUM
