"""Plan-shape guards for the round-6 operators — the 100 TB-relevant
properties (no nested-loop or cartesian joins, no global-order windows,
no Python in relational paths, text kept out of exchanges, broadcasts
where broadcasts belong) locked in as regressions."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from wurzel_spark.plans import plan_text
from wurzel_spark.tables import table


def _clean(df, allow_cross_broadcast=False):
    t = plan_text(df)
    if allow_cross_broadcast:
        # a crossJoin against a broadcast 1-row aggregate panel compiles
        # to BroadcastNestedLoopJoin Cross BuildRight — that IS the
        # intended scale shape; only the non-broadcast form is a hazard.
        # Check the plan TREE lines (the detail section repeats the node
        # name without its join type).
        for line in t.splitlines():
            if "BroadcastNestedLoopJoin" in line and ("+-" in line or ":-" in line):
                assert "Cross BuildRight" in line, line
    else:
        assert "BroadcastNestedLoopJoin" not in t, t
    assert "CartesianProduct" not in t, t
    return t


def _no_text_in_exchanges(t):
    # a BARE text attribute in an Exchange's input means document text is
    # shuffled; "text#N" INSIDE an expression (e.g. sha2(...text#1...))
    # names a pre-exchange computed column and is fine
    for block in re.findall(r"\(\d+\) Exchange\n(.*?)(?:\n\n|\Z)", t, re.S):
        assert not re.search(r"[\[, ]text#\d+[,\]]", block), block


def test_duplication_profile_plan(spark, sf_dir):
    """One grouped aggregate; the exchange carries (source, 64-char
    fingerprint), never the document text; no Python evaluation."""
    from wurzel_spark.operators.textstats import duplication_profile

    df = duplication_profile(table(spark, sf_dir, "documents"))
    t = _clean(df)
    assert "BatchEvalPython" not in t and "ArrowEvalPython" not in t, t
    _no_text_in_exchanges(t)


def test_pmi_plan_single_stream_shuffle_no_windows(spark, sf_dir):
    """The bigram stream is shuffled exactly once (the (w1,w2) count
    aggregate); marginals/total derive from the vocab-sized table — NO
    window over the stream at all (a stop-word w1 window would have no
    map-side combine), and the 1-row total rides a broadcast."""
    from wurzel_spark.operators.textstats import pmi_bigrams

    df = pmi_bigrams(table(spark, sf_dir, "documents"))
    t = _clean(df, allow_cross_broadcast=True)  # 1-row n_total panel
    assert "BatchEvalPython" not in t and "ArrowEvalPython" not in t, t
    assert "Window" not in t, t
    assert "BroadcastExchange" in t, t  # the 1-row n_total panel


def test_event_drift_plan_small_state_windows(spark, sf_dir):
    """The lag window partitions by event_type (day×type grid — tiny);
    the type panel is broadcast for the grid cross join; nothing
    corpus-sized flows after the first aggregate."""
    from wurzel_spark.queries.events import event_type_drift

    df = event_type_drift(spark, sf_dir)
    t = _clean(df, allow_cross_broadcast=True)  # broadcast type panel grid
    assert "BatchEvalPython" not in t, t
    for line in t.splitlines():
        if "Window" in line and "windowspecdefinition" in line.lower():
            assert "event_type" in line, line


def test_cdc_apply_plan_broadcast_anti_join(spark, sf_dir):
    """MERGE semantics = one broadcast LEFT ANTI against the change keys
    — base text must not shuffle (no sort-merge join at all)."""
    from wurzel_spark.operators.snapshots import q_cdc_apply_changes

    df = q_cdc_apply_changes(spark, sf_dir)
    t = _clean(df)
    assert "SortMergeJoin" not in t, t
    assert "BroadcastHashJoin" in t and "LeftAnti" in t, t


def test_cdc_snapshot_at_plan_one_window_no_join(spark, sf_dir):
    """Time travel is ONE id-partitioned window over the filtered log —
    no join anywhere in the plan."""
    from wurzel_spark.operators.snapshots import q_cdc_snapshot_at

    df = q_cdc_snapshot_at(spark, sf_dir)
    t = _clean(df)
    assert "Join" not in t, t
    for line in t.splitlines():
        if "Window" in line and "windowspecdefinition" in line.lower():
            assert "doc_id" in line, line


def test_table_stats_single_aggregate_pass(spark, sf_dir):
    """Column stats = ONE aggregate over the table (Spark's Expand for
    multi-distinct), then a row-local unpivot — no join, no window."""
    from wurzel_spark.operators.layout import q_table_stats_documents

    df = q_table_stats_documents(spark, sf_dir)
    t = _clean(df)
    assert "Join" not in t, t
    assert "Window" not in t, t
    assert "Expand" in t, t  # the multi-countDistinct expansion


def test_lang_share_broadcast_total(spark, sf_dir):
    """The 1-row totals panel must broadcast; text never read (scan
    schema is (lang, n_chars) only)."""
    from wurzel_spark.operators.textstats import q_lang_share

    df = q_lang_share(spark, sf_dir)
    t = _clean(df, allow_cross_broadcast=True)  # 1-row totals panel
    assert "BroadcastExchange" in t, t
    if "ReadSchema" in t:
        assert all(
            "text" not in seg[:200] for seg in t.split("ReadSchema")[1:]
        ), t


def test_lang_classifier_features_pure_jvm(spark, sf_dir):
    """The gram-hash feature projection must be whole-stage-codegen JVM
    work — Python appears ONLY in the Arrow-batched training/scoring
    kernels, never in feature extraction."""
    from wurzel_spark.operators.classifier import char_ngram_features

    df = char_ngram_features(table(spark, sf_dir, "documents"))
    t = _clean(df)
    assert "BatchEvalPython" not in t and "ArrowEvalPython" not in t, t
    # (HOF transform projections sit outside WholeStageCodegen by design;
    # the no-Python assertion is the load-bearing one)
