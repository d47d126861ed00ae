"""Plan-shape guards for the round-9 operators: group-limit pushdown on
the stratified sampler, single-scan/no-text-shuffle audits, UDF-free
row-local projections, and no cartesian products in the bitext miner."""

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
    return len(re.findall(r"\(\d+\) Scan parquet", t))


def test_stratified_priority_group_limit_and_single_scan(spark, sf_dir):
    """Partial WindowGroupLimit prunes to top-(k+1) per (partition,
    source) BEFORE the one exchange; one scan; text never read at all
    (ReadSchema carries doc_id/source/n_chars only)."""
    from wurzel_spark.operators.selection import priority_sample_stratified

    t = plan_text(priority_sample_stratified(table(spark, sf_dir, "documents")))
    assert _n_scans(t) == 1, t
    assert "WindowGroupLimit" in t and "Partial" in t
    m = re.search(r"ReadSchema: ([^\n]*)", t)
    assert m and "text" not in m.group(1), m.group(0)


def test_unicode_stats_single_scan_no_text_shuffle(spark, sf_dir):
    """All four contaminant counts are row-local translate() lengths over
    ONE scan; the exchange carries integers only."""
    from wurzel_spark.operators.textstats import unicode_clean_stats

    t = plan_text(unicode_clean_stats(table(spark, sf_dir, "documents")))
    assert _n_scans(t) == 1, t
    _no_text_in_exchanges(t)
    assert "pythonUDF" not in t and "ArrowEval" not in t


def test_unicode_docs_is_pure_codegen(spark, sf_dir):
    """The mutation is translate() chains only — no Python, no regex-free
    assertion needed, no exchange except the output sort."""
    from wurzel_spark.operators.textstats import unicode_clean_docs

    t = plan_text(unicode_clean_docs(table(spark, sf_dir, "documents")))
    assert _n_scans(t) == 1, t
    assert "pythonUDF" not in t and "ArrowEval" not in t


def test_waterfill_single_corpus_scan(spark, sf_dir):
    """One corpus scan feeds the per-source aggregate; every later stage
    (totals, ratio sort, prefix sums, saturation algebra) runs on
    |sources| rows — and the corpus text never enters an exchange."""
    from wurzel_spark.operators.textstats import token_budget_waterfill

    t = plan_text(token_budget_waterfill(table(spark, sf_dir, "documents")))
    # the documents parquet appears once for the token-count aggregate;
    # Spark may re-list it for the metadata-sized totals branch — what
    # matters is the TEXT column is aggregated away before any exchange
    _no_text_in_exchanges(t)
    assert "pythonUDF" not in t and "ArrowEval" not in t


def test_iban_is_pure_codegen_single_scan(spark, sf_dir):
    from wurzel_spark.operators.textstats import pii_iban_validated

    t = plan_text(pii_iban_validated(table(spark, sf_dir, "documents")))
    assert _n_scans(t) == 1, t
    assert "pythonUDF" not in t and "ArrowEval" not in t


def test_bitext_no_cartesian_product(spark, sf_dir):
    """Candidate generation must be an equi hash join on (band, bits) —
    never a CartesianProduct/BroadcastNestedLoop over the sides. (The
    hyperplane bucketer is an Arrow-batched kernel, so ArrowEval IS
    expected here.)"""
    from wurzel_spark.operators.similarity import bitext_margin_pairs

    t = plan_text(
        bitext_margin_pairs(
            table(spark, sf_dir, "documents"), table(spark, sf_dir, "embeddings")
        )
    )
    assert "CartesianProduct" not in t, t
    assert "BroadcastNestedLoopJoin" not in t, t


def test_bitext_vectors_dropped_before_margin_windows(spark, sf_dir):
    """The window pipeline over candidates shuffles (ids, cos_q) only —
    embeddings must not survive past the cos projection."""
    from wurzel_spark.operators.similarity import bitext_margin_pairs

    t = plan_text(
        bitext_margin_pairs(
            table(spark, sf_dir, "documents"), table(spark, sf_dir, "embeddings")
        )
    )
    for block in re.findall(r"\(\d+\) Exchange\n(.*?)(?:\n\n|\Z)", t, re.S):
        if "hashpartitioning(src_id" in block or "hashpartitioning(tgt_id" in block:
            assert "_vec" not in block, block
