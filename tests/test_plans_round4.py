"""Plan-shape + skew guards for the round-4 operators: the 100 TB-relevant
properties (no nested-loop joins, scans pruned to needed columns, bounded
kernels under degenerate clustering) locked in as regressions."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from wurzel_spark.operators.packing import sequence_pack_stats
from wurzel_spark.operators.similarity import semdedup_keep
from wurzel_spark.operators.textstats import bm25_topk
from wurzel_spark.plans import plan_text
from wurzel_spark.tables import table


def _no_nested_loop(df):
    t = plan_text(df)
    assert "BroadcastNestedLoopJoin" not in t, t
    assert "CartesianProduct" not in t, t


def test_bm25_plan_prunes_and_filters_before_shuffle(spark, sf_dir):
    df = bm25_topk(table(spark, sf_dir, "documents"))
    t = plan_text(df)
    # exactly ONE nested-loop join is designed in: the broadcast of the
    # 1-row (n_docs, avgdl) corpus-stats relation; anything more means a
    # real cartesian crept in (formatted plans print each node twice —
    # count unique node ids)
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", t)) <= 1, t
    assert "CartesianProduct" not in t, t
    # the parquet scan must read only doc_id + text — never lang/source
    if "ReadSchema" in t:
        assert "lang" not in t.split("ReadSchema")[1][:200]
    # query-term filter is a plain Filter on the exploded stream (isin →
    # no join against a term table for the corpus-side pruning)
    assert "term#" in t or "Filter" in t


def test_semdedup_plan_has_no_pair_join(spark, sf_dir):
    emb = table(spark, sf_dir, "embeddings")
    df = semdedup_keep(emb, emb.filter(F.col("vec_id") < 8), threshold=0.4)
    t = plan_text(df)
    # the one designed nested-loop is the k-row centroid broadcast for
    # assignment; the within-cell pairwise work must be ONE grouped Arrow
    # kernel — never a self-join of the ranked table
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", t)) <= 1, t
    assert "CartesianProduct" not in t, t
    assert "FlatMapGroupsInPandas" in t
    assert t.count("SortMergeJoin") == 0


def test_semdedup_single_cell_degenerate(spark, sf_dir):
    """All vectors landing in ONE cell (single centroid) — the worst-case
    cell for the kernel — still completes and keeps exactly the rule's
    survivors (every member within threshold of a higher-ranked mate is
    dropped)."""
    emb = table(spark, sf_dir, "embeddings").limit(200)
    one = emb.filter(F.col("vec_id") == 0)
    kept = semdedup_keep(emb, one, threshold=0.99).collect()
    assert 0 < len(kept) <= 200
    assert {r["cell"] for r in kept} == {0}


def test_sequence_pack_doc_window_stays_bucket_partitioned(spark, sf_dir):
    """The prefix sum's doc-grain window must partition by bucket — a
    global-order window there would serialize the corpus through one
    partition. Since r12 the bucket offsets ride the plan via a
    two-level scan, so exactly ONE unpartitioned window is allowed: the
    superbucket-grain offsets window (one row per 2^26 docs),
    whitelisted + runtime-row-bounded by test_plans_round10."""
    df = sequence_pack_stats(table(spark, sf_dir, "documents"))
    _no_nested_loop(df)
    jplan = df._jdf.queryExecution().executedPlan()
    partitioned, global_ = [], []
    stack = [jplan]
    while stack:
        n = stack.pop()
        if n.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            stack.append(n.initialPlan())
            continue
        if n.getClass().getSimpleName() == "WindowExec":
            spec = n.simpleString(300)
            (global_ if n.partitionSpec().isEmpty() else partitioned).append(spec)
        ch = n.children()
        for i in range(ch.size()):
            stack.append(ch.apply(i))
    # doc-grain window (ordered by doc_id) partitions by __bkt; the
    # bucket-totals window partitions by __sbkt
    assert any("doc_id" in s and "__bkt" in s for s in partitioned), partitioned
    assert len(global_) == 1, global_
    assert "__sbkt" in global_[0], global_[0]


# ------------------------- round-4 cont.: selection / bloom / layout plans

def test_bloom_decontam_plan_is_broadcast_only(spark, sf_dir):
    """The corpus side of the Bloom probe must stay map-only: four
    position probes + the exact-hit check are ALL broadcast hash joins —
    no sort-merge join, no shuffle of the span stream before the final
    per-doc aggregate."""
    from wurzel_spark.operators.sketches import bloom_decontamination

    docs = table(spark, sf_dir, "documents")
    df = bloom_decontamination(
        docs.filter(F.col("doc_id") % 100 != 0),
        docs.filter(F.col("doc_id") % 100 == 0),
    )
    t = plan_text(df)
    assert "SortMergeJoin" not in t, t
    assert "CartesianProduct" not in t, t
    assert t.count("BroadcastHashJoin") >= 4, t


def test_temperature_sample_plan_broadcasts_thresholds(spark, sf_dir):
    """The per-language threshold table must ride a broadcast join; the
    corpus is scanned for (lang, doc_id) only — text never read."""
    from wurzel_spark.operators.selection import temperature_mixture_sample

    df = temperature_mixture_sample(table(spark, sf_dir, "documents"))
    t = plan_text(df)
    assert "BroadcastHashJoin" in t, t
    assert "SortMergeJoin" not in t, t
    if "ReadSchema" in t:
        # at least one scan reads only lang/doc_id (the filter side)
        assert any(
            "text" not in seg[:200] for seg in t.split("ReadSchema")[1:]
        ), t


def test_domain_cap_window_sorts_longs_not_text(spark, sf_dir):
    """The per-source rank window must operate on the projected
    (doc_id, source, h) longs — the document text must not appear in the
    plan at all past the scan."""
    from wurzel_spark.operators.selection import domain_cap_sample

    df = domain_cap_sample(table(spark, sf_dir, "documents"))
    t = plan_text(df)
    if "ReadSchema" in t:
        assert "text" not in t.split("ReadSchema")[1][:300], t


def test_cluster_best_keep_plan_no_nested_loop(spark, sf_dir):
    from wurzel_spark.operators import dedup as D
    from wurzel_spark.operators.selection import cluster_best_keep

    docs = table(spark, sf_dir, "documents").limit(300)
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.5, sort=False)
    df = cluster_best_keep(docs, pairs)
    _no_nested_loop(df)


def test_cms_plan_hashes_vocab_not_occurrences(spark, sf_dir):
    """The depth-explode must sit ABOVE the vocabulary aggregate: every
    Generate node producing the cell index i consumes the aggregated
    (word, exact_count) table — hashing runs per distinct word, never per
    token occurrence. A revert to per-occurrence hashing (the 5.2× regress
    PERF.md records) would explode the sequence over the raw token stream,
    whose Generate input has no exact_count column."""
    import re as _re

    from wurzel_spark.operators.sketches import cms_heavy_hitters

    df = cms_heavy_hitters(table(spark, sf_dir, "documents"))
    t = plan_text(df)
    gens = _re.findall(r"\(\d+\) Generate\nInput \[\d+\]: \[([^\]]*)\]", t)
    seq_gens = [g for g in gens if "w#" in g]  # cell-index explodes over words
    assert seq_gens, t
    for g in seq_gens:
        assert "exact_count" in g, (g, t)
    assert "CartesianProduct" not in t, t


def test_ivfpq_plan_broadcasts_query_side(spark, sf_dir):
    """IVF-PQ (VERDICT r4 #8): everything per-query must be broadcast —
    the probe LUT, the centroid table, the rerank shortlist's query
    vectors. The only designed nested-loop is the k-row centroid
    broadcast per query; corpus codes must never cartesian-join."""
    from wurzel_spark.operators.similarity import ivfpq_topk

    emb = table(spark, sf_dir, "embeddings")
    df = ivfpq_topk(
        emb,
        emb.filter(F.col("vec_id") < 3),
        emb.filter(F.col("vec_id") < 8),
        k=10,
        nprobe=3,
        rerank=50,
    )
    t = plan_text(df)
    assert "CartesianProduct" not in t, t
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", t)) <= 1, t
    # LUT→codes, centroid→residual, query-vec→rerank: broadcast hash joins
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", t)) >= 2, t


def test_incremental_cluster_merge_plan_broadcasts_membership(spark, sf_dir):
    """merge_cluster_labels' singleton carry-through anti-join must
    broadcast the (small) merged labeling — never sort-merge the
    corpus-sized labels table against it."""
    from wurzel_spark.operators.dedup import merge_cluster_labels

    labels = spark.createDataFrame(
        [(i, i % 7) for i in range(500)], "doc_id long, cluster_id long"
    )
    pairs = spark.createDataFrame([(1, 8), (2, 9)], "id_a long, id_b long")
    df = merge_cluster_labels(labels, pairs)
    t = plan_text(df)
    assert "CartesianProduct" not in t, t
    assert "BroadcastNestedLoopJoin" not in t, t
    # the anti-join against the merged membership is broadcast
    assert re.search(r"BroadcastHashJoin .*LeftAnti", t) or "LeftAnti" not in t, t


def test_winnow_overlap_plan_shape(spark, sf_dir):
    """Winnowing overlap: fingerprint equi-join (never nested-loop), scan
    pruned to doc_id + text only."""
    from wurzel_spark.operators.dedup import winnow_overlap_pairs

    df = winnow_overlap_pairs(table(spark, sf_dir, "documents"), threshold=0.2)
    t = plan_text(df)
    assert "CartesianProduct" not in t, t
    assert "BroadcastNestedLoopJoin" not in t, t
    if "ReadSchema" in t:
        tail = t.split("ReadSchema")[1][:200]
        assert "lang" not in tail and "source" not in tail, tail


def test_snapshot_diff_plan_joins_hashes_not_text(spark, sf_dir):
    """snapshot_diff: ONE join, keyed on the id, carrying 32-byte hashes —
    document text must be projected away before the shuffle."""
    from wurzel_spark.operators.snapshots import q_snapshot_diff

    t = plan_text(q_snapshot_diff(spark, sf_dir))
    assert "CartesianProduct" not in t and "BroadcastNestedLoopJoin" not in t, t
    # exactly one join node (full outer on id)
    n_joins = len(re.findall(r"\(\d+\) (SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", t))
    assert n_joins == 1, t
    # the shuffled columns are id + hash — text never crosses an exchange
    for block in re.findall(r"\(\d+\) Exchange\n(.*?)(?:\n\n|\Z)", t, re.S):
        m = re.search(r"Input \[\d+\]: \[(.*?)\]", block)
        assert m and "text#" not in m.group(1), block


def test_ngram_novelty_plan_has_no_shingle_level_join(spark, sf_dir):
    """Novelty merges two doc-cardinality tables; the only join must be on
    the doc id (the shingle table is aggregated before any join)."""
    from wurzel_spark.operators.dedup import q_ngram_novelty

    t = plan_text(q_ngram_novelty(spark, sf_dir))
    assert "CartesianProduct" not in t and "BroadcastNestedLoopJoin" not in t, t
    n_joins = len(re.findall(r"\(\d+\) (SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)", t))
    assert n_joins == 1, t
    # and that one join's keys are the doc id, never the shingle
    for key_line in re.findall(r"Left keys \[\d+\]: \[(.*?)\]", t):
        assert "shingle" not in key_line, key_line


def test_percentile_gate_and_length_buckets_project_before_window(spark, sf_dir):
    """Both planners must sort small projected rows, never text."""
    from wurzel_spark.operators.packing import q_length_bucket_batches
    from wurzel_spark.operators.selection import q_quality_percentile_gate

    for q in (q_quality_percentile_gate, q_length_bucket_batches):
        t = plan_text(q(spark, sf_dir))
        assert "CartesianProduct" not in t and "BroadcastNestedLoopJoin" not in t, t
        # no text column flows through any exchange: check each Exchange
        # node's Input list in the formatted details
        for block in re.findall(r"\(\d+\) Exchange\n(.*?)(?:\n\n|\Z)", t, re.S):
            m = re.search(r"Input \[\d+\]: \[(.*?)\]", block)
            assert m and "text#" not in m.group(1), block
