"""Round-8 additions: classifier-eval battery (score calibration,
tokenizer fertility, lang-ID confusion) + DoReMi-lite mixture weights."""

from pyspark.sql import functions as F

from wurzel_spark.operators.selection import (
    _DOREMI_SCALE,
    doremi_mixture_weights,
)
from wurzel_spark.operators.textstats import (
    langid_confusion,
    score_calibration_bins,
    tokenizer_fertility_stats,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string"
    )


# ------------------------------------------------------------ calibration


def test_calibration_bins_exact(spark):
    # doc 1: 4 words, 2 STOPWORDS hits ("the", "a") → q1000 = 500 → bin 5;
    #        fails gopher (word count < 50) → keep 0
    # doc 2: 0 stop hits → q1000 = 0 → bin 0, keep 0
    docs = _docs(
        spark,
        [
            (1, "the a xxx yyy", "s", "en"),
            (2, "xxx yyy zzz www", "s", "en"),
        ],
    )
    rows = {r["bin"]: r for r in score_calibration_bins(docs).collect()}
    assert set(rows) == {0, 5}
    assert rows[5]["n_docs"] == 1 and rows[5]["n_keep"] == 0
    assert rows[5]["mean_score_permille"] == 500
    assert rows[5]["keep_permille"] == 0
    assert rows[5]["abs_gap_permille"] == 500
    assert rows[0]["mean_score_permille"] == 0 and rows[0]["abs_gap_permille"] == 0


def test_calibration_bin_is_capped_at_last_bin(spark):
    # all-stopword doc: q1000 = 1000 → bin floor(1000/100)=10 must cap at 9
    docs = _docs(spark, [(1, "the the the the", "s", "en")])
    rows = score_calibration_bins(docs).collect()
    assert len(rows) == 1 and rows[0]["bin"] == 9


def test_calibration_keep_side_matches_gopher(spark):
    # a genuinely gopher-passing doc: >=50 words, mean len in [3,10],
    # >=2 distinct gopher stop words, mostly alphabetic
    words = ["the", "be", "to", "of", "and"] + [f"word{i}" for i in range(50)]
    docs = _docs(spark, [(1, " ".join(words), "s", "en")])
    from wurzel_spark.operators.textstats import gopher_quality_flags

    assert gopher_quality_flags(docs).collect()[0]["gopher_keep"] is True
    rows = score_calibration_bins(docs).collect()
    assert len(rows) == 1 and rows[0]["n_keep"] == 1
    assert rows[0]["keep_permille"] == 1000


# -------------------------------------------------------------- fertility


def test_fertility_exact_integers(spark):
    # "abcd efghijkl" → ws tokens 2; subwords ceil(4/4)+ceil(8/4) = 1+2 = 3
    # fertility = 1500 permille; chars = 13
    docs = _docs(spark, [(1, "abcd efghijkl", "s1", "en")])
    r = tokenizer_fertility_stats(docs).collect()[0]
    assert (r["n_ws_tokens"], r["n_subword_tokens"], r["n_chars"]) == (2, 3, 13)
    assert r["fertility_permille"] == 1500
    assert r["chars_per_subword"] == 13.0 / 3.0


def test_fertility_groups_by_source_lang(spark):
    docs = _docs(
        spark,
        [
            (1, "aa bb", "s1", "en"),
            (2, "cc dd", "s1", "de"),
            (3, "ee ff", "s2", "en"),
        ],
    )
    rows = tokenizer_fertility_stats(docs).collect()
    assert [(r["source"], r["lang"]) for r in rows] == [
        ("s1", "de"), ("s1", "en"), ("s2", "en"),
    ]
    assert all(r["n_docs"] == 1 for r in rows)


def test_fertility_zero_word_doc_is_safe(spark):
    docs = _docs(spark, [(1, "", "s", "en"), (2, "abcd efgh", "s", "en")])
    r = tokenizer_fertility_stats(docs).collect()[0]
    assert r["n_docs"] == 2 and r["n_ws_tokens"] == 2
    assert r["fertility_permille"] == 1000


# -------------------------------------------------------------- confusion


def test_confusion_counts_and_permilles(spark):
    # 2 docs labeled en predicted en ("the"); 1 labeled en predicted de
    # ("der"); 1 labeled de predicted de
    docs = _docs(
        spark,
        [
            (1, "the cat", "s", "en"),
            (2, "the dog", "s", "en"),
            (3, "der hund", "s", "en"),
            (4, "der die", "s", "de"),
        ],
    )
    cells = {
        (r["labeled_lang"], r["predicted_lang"]): r
        for r in langid_confusion(docs).collect()
    }
    assert cells[("en", "en")]["n"] == 2
    assert cells[("en", "de")]["n"] == 1
    assert cells[("de", "de")]["n"] == 1
    # recall: en→en 2 of 3 labeled-en = 666‰ (floor)
    assert cells[("en", "en")]["recall_permille"] == 666
    # precision: de column has 2 predictions, 1 correctly labeled de
    assert cells[("de", "de")]["precision_permille"] == 500
    assert cells[("en", "de")]["n_pred_total"] == 2
    assert cells[("en", "en")]["n_label_total"] == 3


# ----------------------------------------------------------------- doremi


def test_doremi_monotone_in_loss_and_normalized(spark):
    # src_low: all stopwords (loss 0) — src_high: no stopwords (loss 1000)
    docs = _docs(
        spark,
        [
            (1, "the a and of", "src_low", "en"),
            (2, "qqq www eee rrr", "src_high", "en"),
            (3, "the qqq a www", "src_mid", "en"),  # density 500 → loss 500
        ],
    )
    rows = {r["source"]: r for r in doremi_mixture_weights(docs).collect()}
    assert rows["src_low"]["loss_permille"] == 0
    assert rows["src_high"]["loss_permille"] == 1000
    assert rows["src_mid"]["loss_permille"] == 500
    w = {s: r["weight_ppm"] for s, r in rows.items()}
    assert w["src_high"] > w["src_mid"] > w["src_low"]
    # floor-normalized each round: sum within K of the scale, never above
    assert _DOREMI_SCALE - 3 <= sum(w.values()) <= _DOREMI_SCALE
    assert all(r["uniform_ppm"] == _DOREMI_SCALE // 3 for r in rows.values())
    assert rows["src_high"]["boost_permille"] > 1000
    assert rows["src_low"]["boost_permille"] < 1000


def test_doremi_uniform_when_losses_equal(spark):
    docs = _docs(
        spark,
        [(i, "the xxx", f"s{i}", "en") for i in range(4)],
    )
    rows = doremi_mixture_weights(docs).collect()
    assert len({r["weight_ppm"] for r in rows}) == 1
    assert all(r["boost_permille"] == 1000 for r in rows)


def test_doremi_partitioning_independent(spark):
    docs = _docs(
        spark,
        [(i, ("the " * (i % 5)) + "x y z", f"s{i % 6}", "en") for i in range(60)],
    )
    a = sorted(map(tuple, doremi_mixture_weights(docs.repartition(1)).collect()))
    b = sorted(map(tuple, doremi_mixture_weights(docs.repartition(7)).collect()))
    assert a == b


# ---------------------------------------------------------- third wave


def test_luhn_validation_fixtures(spark):
    docs = _docs(
        spark,
        [
            (1, "pay with 4242424242424242 now", "s", "en"),     # valid Visa test
            (2, "fake 4242424242424243 number", "s", "en"),      # bad checksum
            (3, "call +1 555 123 4567 ok", "s", "en"),           # 11 digits: too short
            (4, "card 4242 4242 4242 4242 spaced", "s", "en"),   # separators ok
            (5, "no digits at all", "s", "en"),
        ],
    )
    from wurzel_spark.operators.textstats import pii_luhn_validated

    got = {
        r["doc_id"]: (r["n_candidates"], r["n_luhn_valid"], r["card_flag"])
        for r in pii_luhn_validated(docs).collect()
    }
    assert got == {
        1: (1, 1, True),
        2: (1, 0, False),
        3: (1, 0, False),
        4: (1, 1, True),
        5: (0, 0, False),
    }


def test_shuffle_runs_detect_unshuffled_order(spark):
    """Ingest order (all of source a, then all of source b) must report
    n_runs=1 per source; the hash shuffle must break the blocks up."""
    from wurzel_spark.operators.ordering import corpus_shuffle, shuffle_run_stats
    from pyspark.sql import functions as F

    rows = [(i, "t", "a" if i < 50 else "b", "en") for i in range(100)]
    docs = _docs(spark, rows)
    ingest = docs.select(
        "source", (F.col("doc_id") + 1).alias("shuffle_pos")
    )
    flat = {r["source"]: r["n_runs"] for r in shuffle_run_stats(ingest).collect()}
    assert flat == {"a": 1, "b": 1}
    shuffled = {
        r["source"]: r["n_runs"]
        for r in shuffle_run_stats(corpus_shuffle(docs)).collect()
    }
    assert shuffled["a"] > 10 and shuffled["b"] > 10


def test_shuffle_runs_partitioning_independent(spark):
    from wurzel_spark.operators.ordering import corpus_shuffle, shuffle_run_stats

    rows = [(i, "t", f"s{i % 3}", "en") for i in range(90)]
    docs = _docs(spark, rows)
    a = sorted(map(tuple, shuffle_run_stats(corpus_shuffle(docs.repartition(1))).collect()))
    b = sorted(map(tuple, shuffle_run_stats(corpus_shuffle(docs.repartition(7))).collect()))
    assert a == b


def test_inverted_index_accounting(spark):
    """Bucket rows must account for every token exactly once: Σ n_tokens
    = corpus token count, Σ n_postings = distinct (term, doc) pairs, and
    a hot term's posting length shows up in max_posting_len."""
    from pyspark.sql import functions as F

    from wurzel_spark.operators.textstats import inverted_index_stats

    rows = [(i, "common unique%d common" % i, "s", "en") for i in range(40)]
    docs = _docs(spark, rows)
    out = inverted_index_stats(docs).collect()
    assert sum(r["n_tokens"] for r in out) == 120  # 3 tokens x 40 docs
    assert sum(r["n_postings"] for r in out) == 80  # (common,doc)x40 + uniques
    assert sum(r["n_terms"] for r in out) == 41
    assert max(r["max_posting_len"] for r in out) == 40  # "common" df


# --------------------------------------------------------------- exact AUC


def test_score_auc_matches_bruteforce(spark):
    """The histogram-collapsed U statistic equals the O(n²) pairwise
    definition (ties = ½ credit), on a corpus with real positives and
    negatives and tied scores."""
    from wurzel_spark.operators.textstats import (
        STOPWORDS,
        gopher_quality_flags,
        score_auc_stats,
    )

    gopher_stops = "the be to of and that have with".split()
    rows = []
    for i in range(24):
        if i % 3 == 0:
            # gopher-passing doc: >=50 words, varying stopword density
            words = gopher_stops + [f"word{j}" for j in range(50)] + ["the"] * (i % 4)
        else:
            # short doc -> gopher fail; density varies (incl. ties)
            words = (["the"] * (i % 3)) + ["xxx", "yyy", "zzz"]
        rows.append((i, " ".join(words), "s", "en"))
    docs = _docs(spark, rows)
    out = score_auc_stats(docs).collect()
    assert len(out) == 1
    r = out[0]
    # brute force
    flags = {x["doc_id"]: x["gopher_keep"] for x in gopher_quality_flags(docs).collect()}

    def q1000(t):
        ws = [w for w in t.split() if w]
        sh = sum(1 for w in ws if w in STOPWORDS)
        return (1000 * sh) // len(ws) if ws else 0

    pairs = [(q1000(t), flags[i]) for i, t, _, _ in rows]
    pos = [s for s, k in pairs if k]
    neg = [s for s, k in pairs if not k]
    assert pos and neg, "fixture must have both classes"
    u2 = sum(2 * (p > n) + (p == n) for p in pos for n in neg)
    assert r["n_pos"] == len(pos) and r["n_neg"] == len(neg)
    assert r["u2"] == u2
    assert r["auc_permille"] == (1000 * u2) // (2 * len(pos) * len(neg))


def test_score_auc_degenerate_sources_null(spark):
    from wurzel_spark.operators.textstats import score_auc_stats

    docs = _docs(spark, [(1, "tiny", "only_negs", "en")])
    r = score_auc_stats(docs).collect()[0]
    assert r["n_pos"] == 0 and r["auc_permille"] is None
