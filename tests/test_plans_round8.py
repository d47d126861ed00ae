"""Plan-shape guards for the round-8 operators: every family costs ONE
corpus scan, text never enters an exchange, and the DoReMi iteration runs
on the K-row source table (no per-iteration corpus rescan)."""

from __future__ import annotations

import re

from wurzel_spark.plans import plan_text
from wurzel_spark.tables import table


def _no_text_in_exchanges(t, col="text"):
    for block in re.findall(r"\(\d+\) Exchange\n(.*?)(?:\n\n|\Z)", t, re.S):
        if "RoundRobinPartitioning" in block:
            continue
        assert not re.search(rf"[\[, ]{col}#\d+[,\]]", block), block


def _n_scans(t):
    # formatted plans list each physical scan once in the tree and once in
    # the numbered detail section — count the detail headers only
    return len(re.findall(r"\(\d+\) Scan parquet", t))


def test_calibration_single_scan_no_text_shuffle(spark, sf_dir):
    """Score AND Gopher verdict come from one select over one scan —
    the shuffle carries (q1000, bin, keep) ints only."""
    from wurzel_spark.operators.textstats import score_calibration_bins

    t = plan_text(score_calibration_bins(table(spark, sf_dir, "documents")))
    assert _n_scans(t) == 1, t
    _no_text_in_exchanges(t)


def test_fertility_single_scan_no_text_shuffle(spark, sf_dir):
    from wurzel_spark.operators.textstats import tokenizer_fertility_stats

    t = plan_text(tokenizer_fertility_stats(table(spark, sf_dir, "documents")))
    assert _n_scans(t) == 1, t
    _no_text_in_exchanges(t)


def test_confusion_single_scan_no_text_shuffle(spark, sf_dir):
    from wurzel_spark.operators.textstats import langid_confusion

    t = plan_text(langid_confusion(table(spark, sf_dir, "documents")))
    assert _n_scans(t) == 1, t
    _no_text_in_exchanges(t)


def test_doremi_iteration_never_rescans_corpus(spark, sf_dir):
    """Six multiplicative-weights rounds over the K-row source table must
    not multiply corpus scans: exactly ONE parquet scan in the whole plan,
    and text stays out of every exchange."""
    from wurzel_spark.operators.selection import doremi_mixture_weights

    t = plan_text(doremi_mixture_weights(table(spark, sf_dir, "documents")))
    assert _n_scans(t) == 1, t
    _no_text_in_exchanges(t)


# ---- round-8 late additions: blocklist / l-diversity / ccnet / HRW ----


def test_blocklist_single_scan_no_text_shuffle(spark, sf_dir):
    """Hit counting is a row-local array filter — one scan, and the
    per-source exchange carries integer counts only."""
    from wurzel_spark.operators.textstats import blocklist_filter_stats

    t = plan_text(blocklist_filter_stats(table(spark, sf_dir, "documents")))
    assert _n_scans(t) == 1, t
    _no_text_in_exchanges(t)


def test_ldiversity_single_scan(spark, sf_dir):
    from wurzel_spark.operators.textstats import ldiversity_release

    t = plan_text(ldiversity_release(table(spark, sf_dir, "documents")))
    assert _n_scans(t) == 1, t
    _no_text_in_exchanges(t)


def test_rendezvous_single_scan_rowlocal_owner(spark, sf_dir):
    """Owner columns are codegen expressions — one scan, one NS-row
    aggregate exchange, no UDF anywhere in the plan."""
    from wurzel_spark.operators.layout import rendezvous_shard_stats

    t = plan_text(rendezvous_shard_stats(table(spark, sf_dir, "documents")))
    assert _n_scans(t) == 1, t
    assert "Python" not in t, t
    _no_text_in_exchanges(t)


def test_ccnet_reuses_corpus_exchange_no_word_shuffle(spark, sf_dir):
    """The LM family's scale contract: the doc-grain aggregate exchange
    is REUSED by the train-count branch rather than recomputed (AQE stage
    reuse — statically the plan shows duplicate subtrees, so the guard
    inspects the EXECUTED adaptive plan; the measured 6× trap was eagerly
    materializing the corpus-grain table instead), and no exchange
    carries raw text or word strings (lang is folded into the md5-prefix
    hashes before any shuffle)."""
    from wurzel_spark.operators.textstats import ccnet_lm_perplexity

    df = ccnet_lm_perplexity(table(spark, sf_dir, "documents"))
    t = plan_text(df)
    _no_text_in_exchanges(t)
    _no_text_in_exchanges(t, col="w1")
    _no_text_in_exchanges(t, col="w2")
    df.collect()
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in executed
    assert re.search(r"ReusedQueryStage|ReusedExchange", executed), executed


def test_filter_agreement_single_scan_no_text_shuffle(spark, sf_dir):
    """All three verdicts in one row-local select — one scan, and the
    per-source exchange carries booleans/ints only."""
    from wurzel_spark.operators.textstats import filter_agreement_stats

    t = plan_text(filter_agreement_stats(table(spark, sf_dir, "documents")))
    assert _n_scans(t) == 1, t
    _no_text_in_exchanges(t)


def test_norm_outliers_histogram_grain_windows(spark, sf_dir):
    """The only corpus-sized shuffle is the (label, b) histogram
    aggregate; every window sits above it on metadata-sized rows, and no
    exchange carries the embedding array."""
    from wurzel_spark.operators.linalg import embedding_norm_outliers

    t = plan_text(embedding_norm_outliers(table(spark, sf_dir, "embeddings")))
    _no_text_in_exchanges(t, col="embedding")
    assert "Python" not in t, t
