"""Plan-shape guards for the round-9 late-session operators — the
100 TB-relevant properties locked in as regressions: no cartesian/NLJ
hazards, no Python in relational paths, text kept out of exchanges,
pre-shuffle WindowGroupLimit prunes where the design promises them."""

from __future__ import annotations

import re

from wurzel_spark.plans import plan_text
from wurzel_spark.tables import table


def _clean(df, allow_cross_broadcast=False):
    t = plan_text(df)
    if allow_cross_broadcast:
        for line in t.splitlines():
            if "BroadcastNestedLoopJoin" in line and ("+-" in line or ":-" in line):
                # broadcast panel may be the build side on either end
                # (srcs × vals builds LEFT: the tiny sources panel)
                assert re.search(r"Cross Build(Left|Right)", line), line
    else:
        assert "BroadcastNestedLoopJoin" not in t, t
    assert "CartesianProduct" not in t, t
    return t


def _no_python(t):
    assert "BatchEvalPython" not in t and "ArrowEvalPython" not in t, t


def _no_text_in_exchanges(t):
    for block in re.findall(r"\(\d+\) Exchange\n(.*?)(?:\n\n|\Z)", t, re.S):
        assert not re.search(r"[\[, ]text#\d+[,\]]", block), block


def test_tcloseness_plan(spark, sf_dir):
    """One corpus-grain aggregate; exchanges carry (source, lang) counts,
    never text; pure codegen."""
    from wurzel_spark.operators.textstats import tcloseness_release

    t = _clean(tcloseness_release(table(spark, sf_dir, "documents")))
    _no_python(t)
    _no_text_in_exchanges(t)


def test_part_affinity_plan(spark, sf_dir):
    """Basket cap prunes pre-shuffle (WindowGroupLimit); the 1-row
    n_orders panel broadcasts; no Python."""
    from wurzel_spark.queries.relational import part_affinity_pairs

    t = _clean(part_affinity_pairs(spark, sf_dir), allow_cross_broadcast=True)
    _no_python(t)
    assert "WindowGroupLimit" in t, t


def test_readability_plan(spark, sf_dir):
    """Row-local regexp counts + one per-source aggregate — text never
    reaches an exchange; pure codegen."""
    from wurzel_spark.operators.textstats import readability_stats

    t = _clean(readability_stats(table(spark, sf_dir, "documents")))
    _no_python(t)
    _no_text_in_exchanges(t)


def test_benford_plan(spark, sf_dir):
    """Row-local cents projection reads only l_extendedprice; the 9-digit
    group aggregate is map-side combinable; exclusion panel broadcasts."""
    from wurzel_spark.queries.relational import benford_value_audit

    t = _clean(benford_value_audit(spark, sf_dir), allow_cross_broadcast=True)
    _no_python(t)
    m = re.search(r"ReadSchema: struct<([^>]*)>", t)
    assert m and m.group(1).strip() == "l_extendedprice:double", m and m.group(1)


def test_doc_tfidf_plan(spark, sf_dir):
    """The audit-slice filter pushes to the scan; the per-doc top-k
    window carries the WindowGroupLimit prune; candidate prune joins are
    broadcasts; no Python."""
    from wurzel_spark.operators.textstats import doc_tfidf_keywords

    t = _clean(doc_tfidf_keywords(table(spark, sf_dir, "documents")),
               allow_cross_broadcast=True)
    _no_python(t)
    assert "WindowGroupLimit" in t, t
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,50)]" in t or \
        "LessThan(doc_id,50)" in t, t


def test_hilbert_plan(spark, sf_dir):
    """The 16 unrolled steps collapse into projections inside ONE
    whole-stage codegen span before the aggregate — no per-step plan
    nodes survive; only the two key columns are read."""
    from wurzel_spark.operators.layout import hilbert_layout_stats

    t = _clean(
        hilbert_layout_stats(table(spark, sf_dir, "lineitem"), "l_partkey", "l_suppkey"),
        allow_cross_broadcast=True,
    )
    _no_python(t)
    m = re.search(r"ReadSchema: struct<([^>]*)>", t)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "l_partkey",
        "l_suppkey",
    }, m and m.group(1)


def test_ks_drift_plan(spark, sf_dir):
    """One corpus-grain aggregate; the grid windows run over group-sized
    rows; text never shuffles; no Python."""
    from wurzel_spark.operators.textstats import ks_length_drift

    t = _clean(ks_length_drift(table(spark, sf_dir, "documents")),
               allow_cross_broadcast=True)
    _no_python(t)
    _no_text_in_exchanges(t)
    m = re.search(r"ReadSchema: struct<([^>]*)>", t)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "source",
        "n_chars",
    }, m and m.group(1)


def test_cusum_plan(spark, sf_dir):
    """One corpus-grain rollup; windows partition by event_type (no
    global-order window over event rows); no Python."""
    from wurzel_spark.queries.events import event_cusum_drift

    t = _clean(event_cusum_drift(spark, sf_dir))
    _no_python(t)
    m = re.search(r"ReadSchema: struct<([^>]*)>", t)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "event_type",
        "ts",
    }, m and m.group(1)


def test_mannkendall_plan(spark, sf_dir):
    """The O(H²) pair join runs AFTER the rollup (rollup-sized inputs);
    only (event_type, ts) read; no Python."""
    from wurzel_spark.queries.events import event_mannkendall_trend

    t = _clean(event_mannkendall_trend(spark, sf_dir))
    _no_python(t)
    m = re.search(r"ReadSchema: struct<([^>]*)>", t)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "event_type", "ts",
    }


def test_acf_plan(spark, sf_dir):
    """Lead windows partition by event_type — no global-order window."""
    from wurzel_spark.queries.events import event_acf_stats

    t = _clean(event_acf_stats(spark, sf_dir))
    _no_python(t)


def test_concentration_plans(spark, sf_dir):
    """Gini reads only (c_nationkey, c_acctbal); HHI broadcasts the
    supplier dim and reads only three lineitem columns."""
    from wurzel_spark.queries.relational import (
        customer_balance_gini,
        revenue_hhi_stats,
    )

    t = _clean(customer_balance_gini(spark, sf_dir))
    _no_python(t)
    m = re.search(r"ReadSchema: struct<([^>]*)>", t)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "c_nationkey", "c_acctbal",
    }
    t2 = _clean(revenue_hhi_stats(spark, sf_dir))
    _no_python(t2)
    assert "BroadcastHashJoin" in t2 or "BroadcastExchange" in t2, t2


def test_spearman_and_robust_plans(spark, sf_dir):
    """Rank windows partition by their group key; two-column ReadSchemas."""
    from wurzel_spark.operators.textstats import robust_length_stats
    from wurzel_spark.queries.relational import spearman_qty_price
    from wurzel_spark.tables import table as _table

    t = _clean(spearman_qty_price(spark, sf_dir))
    _no_python(t)
    m = re.search(r"ReadSchema: struct<([^>]*)>", t)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "l_returnflag", "l_quantity", "l_extendedprice",
    }
    t2 = _clean(robust_length_stats(_table(spark, sf_dir, "documents")))
    _no_python(t2)
    m2 = re.search(r"ReadSchema: struct<([^>]*)>", t2)
    assert m2 and set(c.split(":")[0] for c in m2.group(1).split(",")) == {
        "source", "n_chars",
    }


def test_cohort_ltv_plan(spark, sf_dir):
    """Reads only the three needed order columns; cohort windows
    partition by custkey then cohort — no global-order window."""
    from wurzel_spark.queries.relational import cohort_ltv_curve

    t = _clean(cohort_ltv_curve(spark, sf_dir))
    _no_python(t)
    m = re.search(r"ReadSchema: struct<([^>]*)>", t)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "o_custkey", "o_totalprice", "o_orderdate",
    }


def test_burstiness_plan(spark, sf_dir):
    """One corpus-grain rollup then a rollup-sized grouped aggregate —
    no join anywhere, only (event_type, ts) read; pure codegen."""
    from wurzel_spark.queries.events import event_burstiness_stats

    t = _clean(event_burstiness_stats(spark, sf_dir))
    _no_python(t)
    assert "Join" not in t, t
    m = re.search(r"ReadSchema: struct<([^>]*)>", t)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "event_type",
        "ts",
    }, m and m.group(1)


def test_theil_sen_plan(spark, sf_dir):
    """The O(H²) pair join runs AFTER the rollup (rollup-sized inputs);
    only (event_type, ts) read; rank window partitions by type; no
    Python."""
    from wurzel_spark.queries.events import event_theil_sen_trend

    t = _clean(event_theil_sen_trend(spark, sf_dir))
    _no_python(t)
    m = re.search(r"ReadSchema: struct<([^>]*)>", t)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "event_type",
        "ts",
    }, m and m.group(1)
    # the join keys are (event_type) post-rollup — HashAggregate must
    # appear BEFORE the join in the plan's scan->join chain
    agg_pos = t.find("HashAggregate")
    join_pos = t.find("SortMergeJoin")
    if join_pos == -1:
        join_pos = t.find("BroadcastHashJoin")
    assert agg_pos != -1 and join_pos != -1


def test_independence_plan(spark, sf_dir):
    """One corpus-grain grouped count to (type × 24) cells; windows and
    the aggregate run over cell-grain rows; only (event_type, ts) read;
    no join, no Python."""
    from wurzel_spark.queries.events import event_hour_independence

    t = _clean(event_hour_independence(spark, sf_dir))
    _no_python(t)
    assert "Join" not in t, t
    m = re.search(r"ReadSchema: struct<([^>]*)>", t)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "event_type",
        "ts",
    }, m and m.group(1)


def test_order_gap_plan(spark, sf_dir):
    """Reads only (o_custkey, o_orderkey, o_orderdate) + two customer
    columns; the lag window partitions by custkey (never global-order
    over the fact stream); no Python."""
    from wurzel_spark.queries.relational import order_gap_stats

    t = _clean(order_gap_stats(spark, sf_dir))
    _no_python(t)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", t)
    cols = set()
    for s in schemas:
        cols |= {c.split(":")[0] for c in s.split(",")}
    assert cols <= {
        "o_custkey", "o_orderkey", "o_orderdate", "c_custkey", "c_mktsegment",
    }, cols


def test_file_pruning_plan(spark, sf_dir):
    """Reads only (o_orderkey, o_orderdate). Round-10 shape: the file-id
    ranks are TWO-PHASE (range-bucket + per-bucket row_number + prefix-
    sum offsets) — NO unpartitioned window touches the fact stream; the
    bounds panel and bucket offsets arrive by broadcast join only (never
    a shuffle join); no Python."""
    from wurzel_spark.operators.layout import q_file_pruning_stats

    t = _clean(q_file_pruning_stats(spark, sf_dir), allow_cross_broadcast=True)
    _no_python(t)
    assert "SortMergeJoin" not in t and "ShuffledHashJoin" not in t, t
    # every row_number window over order rows must be bucket-partitioned:
    # unpartitioned Window nodes may only carry the ≤1024-row offset
    # prefix sums (they mention the bucket-count column, never eday/fid)
    for m in re.finditer(r"\(\d+\) Window\n(.*?)(?:\n\n|\Z)", t, re.S):
        blk = m.group(1)
        if "row_number" in blk:
            assert "__bkt" in blk, blk
    for s in re.findall(r"ReadSchema: struct<([^>]*)>", t):
        assert {c.split(":")[0] for c in s.split(",")} <= {
            "o_orderkey",
            "o_orderdate",
        }, s


def test_migration_matrix_plan(spark, sf_dir):
    """One fact-grain conditional aggregate to customer grain; reads only
    (o_custkey, o_orderdate) + two customer columns; no Python."""
    from wurzel_spark.queries.relational import customer_migration_matrix

    t = _clean(customer_migration_matrix(spark, sf_dir),
               allow_cross_broadcast=True)
    _no_python(t)
    for s in re.findall(r"ReadSchema: struct<([^>]*)>", t):
        assert {c.split(":")[0] for c in s.split(",")} <= {
            "o_custkey", "o_orderdate", "c_custkey", "c_mktsegment",
        }, s


def test_ols_plan(spark, sf_dir):
    """ONE map-side-combinable grouped aggregate; reads only the three
    fit columns; no join, no window, no Python."""
    from wurzel_spark.queries.relational import ols_price_quantity

    t = _clean(ols_price_quantity(spark, sf_dir))
    _no_python(t)
    assert "Join" not in t and "Window" not in t, t
    m = re.search(r"ReadSchema: struct<([^>]*)>", t)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "l_returnflag", "l_quantity", "l_extendedprice",
    }, m and m.group(1)


def test_ivf_sweep_plan(spark, sf_dir):
    """Centroids and queries broadcast against the corpus (no shuffle of
    the embedding table for the pair passes); the brute top-k window
    prunes pre-shuffle; the only nested-loop joins are the crank ≤ nprobe
    conditional joins over ≤ n_centroids-row histogram panels (LeftOuter
    by construction — corpus-grain data never reaches them); no Python."""
    from wurzel_spark.plans import plan_text
    from wurzel_spark.operators.similarity import q_ivf_nprobe_sweep

    t = plan_text(q_ivf_nprobe_sweep(spark, sf_dir))
    assert "CartesianProduct" not in t, t
    for line in t.splitlines():
        if "BroadcastNestedLoopJoin" in line and ("+-" in line or ":-" in line):
            assert re.search(r"(Cross Build(Left|Right)|LeftOuter Build)", line), line
    _no_python(t)
    assert "WindowGroupLimit" in t, t


def test_importance_ess_plan(spark, sf_dir):
    """The DSIR bucket table broadcasts back to the token stream (no
    corpus-grain shuffle on the join); one per-source aggregate; no
    Python."""
    from wurzel_spark.operators.textstats import q_importance_ess

    t = _clean(q_importance_ess(spark, sf_dir), allow_cross_broadcast=True)
    _no_python(t)
    assert "BroadcastHashJoin" in t, t


def test_scd2_plan(spark, sf_dir):
    """ONE id-partitioned ordered window builds the whole history — no
    self-join, no as-of loop; no Python."""
    from wurzel_spark.operators.snapshots import q_scd2_intervals

    t = _clean(q_scd2_intervals(spark, sf_dir))
    _no_python(t)
    assert "SortMergeJoin" not in t and "BroadcastHashJoin" not in t, t


def test_source_tv_plan(spark, sf_dir):
    """Text never reaches an exchange (counts fold at term grain before
    any shuffle); the head vocab broadcasts into the prune and grid
    joins; no Python."""
    from wurzel_spark.operators.textstats import q_source_tv_matrix

    t = _clean(q_source_tv_matrix(spark, sf_dir), allow_cross_broadcast=True)
    _no_python(t)
    _no_text_in_exchanges(t)
    assert "BroadcastHashJoin" in t, t


def test_retention_plan(spark, sf_dir):
    """One distinct fold to (user, week) grain, user-grain min, cell
    count — reads only (user_id, ts); no Python."""
    from wurzel_spark.queries.events import user_retention_curve

    t = _clean(user_retention_curve(spark, sf_dir))
    _no_python(t)
    m = re.search(r"ReadSchema: struct<([^>]*)>", t)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "user_id", "ts",
    }, m and m.group(1)


def test_funnel_latency_plan(spark, sf_dir):
    """One user-grain conditional aggregate; rank windows partition by
    leg; reads only (user_id, event_type, ts); no Python."""
    from wurzel_spark.queries.events import funnel_latency_stats

    t = _clean(funnel_latency_stats(spark, sf_dir))
    _no_python(t)
    for s in re.findall(r"ReadSchema: struct<([^>]*)>", t):
        assert {c.split(":")[0] for c in s.split(",")} <= {
            "user_id", "event_type", "ts",
        }, s


def test_brier_plan(spark, sf_dir):
    """One shared corpus pass (the score_label_hist subtree), then
    histogram-sized algebra; text never reaches an exchange; no Python."""
    from wurzel_spark.operators.textstats import q_brier_decomposition

    t = _clean(q_brier_decomposition(spark, sf_dir), allow_cross_broadcast=True)
    _no_python(t)
    _no_text_in_exchanges(t)


def test_attribution_plan(spark, sf_dir):
    """ONE user-partitioned ordered window (both conditional lasts share
    the frame); reads only (user_id, event_type, ts, event_id); no
    Python."""
    from wurzel_spark.queries.events import purchase_attribution

    t = _clean(purchase_attribution(spark, sf_dir))
    _no_python(t)
    assert t.count("Window") <= 4, t
    for s in re.findall(r"ReadSchema: struct<([^>]*)>", t):
        assert {c.split(":")[0] for c in s.split(",")} <= {
            "user_id", "event_type", "ts", "event_id",
        }, s


def test_anova_plan(spark, sf_dir):
    """ONE grouped aggregate to language grain; reads only (lang,
    n_chars); no join, no window, no Python."""
    from wurzel_spark.operators.textstats import q_length_anova

    t = _clean(q_length_anova(spark, sf_dir))
    _no_python(t)
    assert "Join" not in t and "Window" not in t, t
    m = re.search(r"ReadSchema: struct<([^>]*)>", t)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "lang", "n_chars",
    }, m and m.group(1)


def test_fisher_plan(spark, sf_dir):
    """One corpus aggregate to |labels|×129 integers (the posexplode runs
    at LABEL grain, after the aggregate); reads only (embedding, label);
    no join; no Python."""
    from wurzel_spark.operators.linalg import q_fisher_separability

    t = _clean(q_fisher_separability(spark, sf_dir))
    _no_python(t)
    assert "Join" not in t, t
    m = re.search(r"ReadSchema: struct<(.*)$", t[t.index("ReadSchema"):].split("\n")[0])
    s = m.group(1) if m else ""
    # the nested array<float> defeats comma-splitting: assert by name
    assert "embedding" in s and "label" in s and "vec_id" not in s, s


def test_slo_burn_plan(spark, sf_dir):
    """One corpus-grain rollup collapsed to hour grain; the ordered
    window runs over hour-grain (rollup-sized) rows; reads only
    (event_type, ts); no Python."""
    from wurzel_spark.queries.events import slo_burn_stats

    t = _clean(slo_burn_stats(spark, sf_dir))
    _no_python(t)
    m = re.search(r"ReadSchema: struct<([^>]*)>", t)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "event_type", "ts",
    }, m and m.group(1)


def test_value_percentiles_plan(spark, sf_dir):
    """Rank windows partition by event_type; reads only (event_type,
    value); no join, no Python."""
    from wurzel_spark.queries.events import value_percentiles_by_type

    t = _clean(value_percentiles_by_type(spark, sf_dir))
    _no_python(t)
    assert "Join" not in t, t
    m = re.search(r"ReadSchema: struct<([^>]*)>", t)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "event_type", "value",
    }, m and m.group(1)


def test_column_encoding_plan(spark, sf_dir):
    """Round-10 shape: the run count is SEGMENTED — every lag over
    lineitem rows comes from ONE bucket-partitioned Window (a single
    sorted pass for all four columns, never one sort per column, never
    a single-partition window over the fact stream); the seam
    correction's unpartitioned lag runs on the ≤1024-row bucket
    aggregate only; the bounds panel arrives by broadcast; no Python."""
    from wurzel_spark.operators.layout import q_column_encoding_stats

    t = _clean(q_column_encoding_stats(spark, sf_dir), allow_cross_broadcast=True)
    _no_python(t)
    assert "SortMergeJoin" not in t and "ShuffledHashJoin" not in t, t
    # exactly two Window operators: the bucket-partitioned fact lag and
    # the bucket-grain seam lag
    wins = re.findall(r"\(\d+\) Window\n(.*?)(?:\n\n|\Z)", t, re.S)
    assert len(wins) == 2, t
    fact = [w for w in wins if "chg_" in w or "l_linenumber" in w]
    assert fact and all("__bkt" in w for w in fact), wins


def test_knn_plan(spark, sf_dir):
    """Queries broadcast against the corpus; the per-query top-k prunes
    pre-shuffle (WindowGroupLimit); the only Python is the Arrow cosine
    kernel (the brute_force_topk precedent — bit-identical to the fold)."""
    from wurzel_spark.operators.similarity import q_knn_label_accuracy

    t = _clean(q_knn_label_accuracy(spark, sf_dir), allow_cross_broadcast=True)
    assert "BatchEvalPython" not in t, t  # never row-at-a-time
    assert "WindowGroupLimit" in t, t


def test_bot_score_plan(spark, sf_dir):
    """Three (user × small-domain) counts share the user_id shuffle key;
    reads only (user_id, event_type, ts); no Python."""
    from wurzel_spark.queries.events import bot_score_stats

    t = _clean(bot_score_stats(spark, sf_dir))
    _no_python(t)
    for s in re.findall(r"ReadSchema: struct<([^>]*)>", t):
        assert {c.split(":")[0] for c in s.split(",")} <= {
            "user_id", "event_type", "ts",
        }, s


def test_stickiness_plan(spark, sf_dir):
    """The trailing windows come from an explode-to-EQUI-join (a BETWEEN
    range join would be a BroadcastNestedLoopJoin hazard — asserted
    absent); reads only (user_id, ts); no Python."""
    from wurzel_spark.queries.events import active_user_stickiness

    t = _clean(active_user_stickiness(spark, sf_dir))
    _no_python(t)
    for s in re.findall(r"ReadSchema: struct<([^>]*)>", t):
        assert {c.split(":")[0] for c in s.split(",")} <= {"user_id", "ts"}, s


def test_lift_and_dups_plans(spark, sf_dir):
    """Lift: the shared hist subtree, text never in exchanges. Dups:
    one groupBy on the vector column, defect-sized output."""
    from wurzel_spark.operators.linalg import q_embedding_exact_dups
    from wurzel_spark.operators.textstats import q_score_lift_table

    t = _clean(q_score_lift_table(spark, sf_dir), allow_cross_broadcast=True)
    _no_python(t)
    _no_text_in_exchanges(t)
    t2 = _clean(q_embedding_exact_dups(spark, sf_dir))
    _no_python(t2)
    assert "Join" not in t2, t2


def test_simpson_plan(spark, sf_dir):
    """The shared partials aggregate feeds both fit levels; the pooled
    1-row panel broadcasts; no Python."""
    from wurzel_spark.queries.relational import simpson_flip_audit

    t = _clean(simpson_flip_audit(spark, sf_dir), allow_cross_broadcast=True)
    _no_python(t)


def test_leadtime_plan(spark, sf_dir):
    """Supplier dim broadcasts; quantiles come from nation-partitioned
    windows over HISTOGRAM rows (distinct lags, not lineitems); no
    Python."""
    from wurzel_spark.queries.relational import supplier_leadtime_stats

    t = _clean(supplier_leadtime_stats(spark, sf_dir))
    _no_python(t)
    assert "BroadcastHashJoin" in t, t


def test_transition_predictability_plan(spark, sf_dir):
    """The transition matrix's own cost (one user window + grouped
    count), then |types|-grain algebra; reads only the three needed
    columns; no Python."""
    from wurzel_spark.queries.events import transition_predictability

    t = _clean(transition_predictability(spark, sf_dir))
    _no_python(t)
    for s in re.findall(r"ReadSchema: struct<([^>]*)>", t):
        assert {c.split(":")[0] for c in s.split(",")} <= {
            "user_id", "event_type", "ts", "event_id",
        }, s


def test_prefix_template_plan(spark, sf_dir):
    """Text leaves the scan as a ≤8-word prefix: full bodies never reach
    an exchange; source-grain windows over prefix-grain rows; no
    Python."""
    from wurzel_spark.operators.textstats import q_prefix_template_stats

    t = _clean(q_prefix_template_stats(spark, sf_dir))
    _no_python(t)
    _no_text_in_exchanges(t)


def test_peak_concurrency_plan(spark, sf_dir):
    """One user window (the sessionize pass), a session-grain fold, a
    bounded hour explode; reads only (user_id, ts, event_id); no
    Python."""
    from wurzel_spark.queries.events import peak_concurrency_stats

    t = _clean(peak_concurrency_stats(spark, sf_dir))
    _no_python(t)
    for s in re.findall(r"ReadSchema: struct<([^>]*)>", t):
        assert {c.split(":")[0] for c in s.split(",")} <= {
            "user_id", "ts", "event_id",
        }, s


def test_backlog_aging_plan(spark, sf_dir):
    """One fact scan + broadcast 1-row max-date panel + tiny count; the
    status filter reaches the scan; no Python."""
    from wurzel_spark.queries.relational import backlog_aging_stats

    t = _clean(backlog_aging_stats(spark, sf_dir), allow_cross_broadcast=True)
    _no_python(t)
    assert "o_orderstatus" in t and "PushedFilters" in t, t


def test_revenue_growth_plan(spark, sf_dir):
    """One fact-grain month rollup, then month-grain index self-joins
    (never positional lags that misalign over gaps); reads only
    (o_orderdate, o_totalprice); no Python."""
    from wurzel_spark.queries.relational import revenue_growth_stats

    t = _clean(revenue_growth_stats(spark, sf_dir))
    _no_python(t)
    for s in re.findall(r"ReadSchema: struct<([^>]*)>", t):
        assert {c.split(":")[0] for c in s.split(",")} <= {
            "o_orderdate", "o_totalprice",
        }, s


def test_seasonality_plan(spark, sf_dir):
    """The shared rollup then (type × 24)-grain algebra; reads only
    (event_type, ts); no join, no window, no Python."""
    from wurzel_spark.queries.events import seasonality_strength

    t = _clean(seasonality_strength(spark, sf_dir))
    _no_python(t)
    assert "Join" not in t and "Window" not in t, t
    m = re.search(r"ReadSchema: struct<([^>]*)>", t)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "event_type", "ts",
    }, m and m.group(1)


def test_discount_band_plan(spark, sf_dir):
    """Row-local projection + 4-group map-side-combinable aggregate;
    reads only the three needed columns; no join, no window, no
    Python."""
    from wurzel_spark.queries.relational import discount_band_stats

    t = _clean(discount_band_stats(spark, sf_dir))
    _no_python(t)
    assert "Join" not in t and "Window" not in t, t
    m = re.search(r"ReadSchema: struct<([^>]*)>", t)
    assert m and set(c.split(":")[0] for c in m.group(1).split(",")) == {
        "l_discount", "l_quantity", "l_extendedprice",
    }, m and m.group(1)


def test_user_fof_and_single_source_plans(spark, sf_dir):
    """FoF: one user-grain count + ≤64-row band aggregate, (user_id)-only
    read. Single-source: part dim broadcasts over the fact fold."""
    from wurzel_spark.queries.events import user_activity_fof
    from wurzel_spark.queries.relational import single_source_parts

    t = _clean(user_activity_fof(spark, sf_dir))
    _no_python(t)
    m = re.search(r"ReadSchema: struct<([^>]*)>", t)
    assert m and m.group(1).startswith("user_id"), m and m.group(1)
    t2 = _clean(single_source_parts(spark, sf_dir))
    _no_python(t2)
    assert "BroadcastHashJoin" in t2, t2


def test_anisotropy_plan(spark, sf_dir):
    """ONE aggregate to 64 sums — O(n) for a pairwise statistic, the
    pair join never materializes; reads only the vector column; no join,
    no Python."""
    from wurzel_spark.operators.linalg import q_embedding_anisotropy

    t = _clean(q_embedding_anisotropy(spark, sf_dir))
    _no_python(t)
    assert "Join" not in t, t


def test_session_duration_plan(spark, sf_dir):
    """The sessionize window + session-grain fold + duration-histogram
    rank; reads only (user_id, ts, event_id); no Python."""
    from wurzel_spark.queries.events import session_duration_stats

    t = _clean(session_duration_stats(spark, sf_dir))
    _no_python(t)
    for s in re.findall(r"ReadSchema: struct<([^>]*)>", t):
        assert {c.split(":")[0] for c in s.split(",")} <= {
            "user_id", "ts", "event_id",
        }, s


def test_metadata_consistency_plan(spark, sf_dir):
    """Row-local projection + per-source aggregate; text never reaches
    an exchange; no Python."""
    from wurzel_spark.operators.textstats import q_metadata_consistency

    t = _clean(q_metadata_consistency(spark, sf_dir))
    _no_python(t)
    _no_text_in_exchanges(t)
