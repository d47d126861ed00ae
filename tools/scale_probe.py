"""10x scale probe (VERDICT r3 #9): time the near-dup + span/sentence +
ANN families at the driver's bench sf (sf0.1, 5k docs / 2k embeddings)
and at a locally generated ~sf1 (10x) dataset, and report the growth
factor per query.

Linear-shape operators (everything here except the d^2-bounded exact
verifiers) should grow ~= data ratio x shuffle constant — well under the
~12x bar PERF.md documents; a quadratic regression (missed cap, skewed
window) shows up as >>10x growth.

Usage:
  python tools/gen_scale_probe.py /tmp/sfprobe 10
  python tools/scale_probe.py [probe_dir] [repeats]
Prints a markdown table (paste into PERF.md) and exits nonzero if any
probed query grew more than MAX_GROWTH.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

BASE = "/root/testdata/sf0.1"
MAX_GROWTH = 14.0  # 10x data * headroom for the host's noisy cores

# (name, needs) — every query reads only documents/embeddings so the
# probe dir doesn't need the TPC-H tables.
QUERIES = [
    "dedup_exact",
    "dedup_clusters",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "combined_near_dup_pairs",
    "ngram_jaccard_capped",
    "containment_capped",
    "duplicated_spans",
    "duplicated_sentences",
    "decontamination_overlap",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "cosine_near_dup_pairs",
    "kmeans_cell_stats",
    "semdedup_keep",
    "bm25_topk",
    "sequence_pack_stats",
    "kmeans_train_stats",
    # round-4 additions
    "winnow_fingerprints",
    "winnow_overlap_pairs",
    "train_split_stats",
    "corpus_shuffle",
    "importance_sample",
    "pq_code_stats",
    "ann_topk_pq",
    "ann_topk_multiprobe",
    "corpus_length_quantiles",
    "hybrid_rrf_topk",
    # round-4 session additions
    "cluster_best_keep",
    "domain_cap_sample",
    "temperature_mixture_sample",
    "bloom_decontam",
    "bpe_pair_counts",
    # zorder_layout_stats reads lineitem — not in the documents-only probe dir
    "quality_classifier_scores",
    "retrieval_self_eval",
    "pii_redact",
    "curriculum_order",
    "sq8_code_stats",
    "hll_distinct_stats",
    "cms_heavy_hitters",
    "kmv_distinct_stats",
    "markdown_structure_stats",
    "license_scan",
    # round-5 additions
    "snapshot_diff",
    "ngram_novelty",
    "incremental_novelty",
    "quality_percentile_gate",
    "length_bucket_batches",
    "training_shard_stats",
    "leakage_safe_split",
    # tlsh_fingerprints is EXCLUDED: count() prunes the 1:1 scalar UDF so
    # the probe would time an empty projection; PERF.md records the honest
    # digest-consuming measurement instead
    # round-6 additions
    "event_type_drift",
    "lang_share",
    "duplication_profile",
    "pmi_bigrams",
    "cdc_apply_changes",
    "cdc_snapshot_at",
    "chunk_dedup_stats",
    "table_stats_documents",
    "lang_id_classifier_scores",
    "kanon_source_lang_stats",
    "dup_graph_transitivity",
    # round-7 additions
    "dup_graph_transitivity_capped",
    "winnow_overlap_pairs_fast",
    "bloom_decontam_fast",
    "exact_substring_removal",
    # strip_exact_substrings EXCLUDED: count() prunes the 1:1 token
    # reconstruction through the unique-keyed join (tlsh precedent) —
    # the stats twin above carries the family's detection cost.
    # round-7 second wave
    "c4_line_filter_stats",
    "ngram_diversity_stats",
    "hard_negative_mining",
    "quality_threshold_sweep",
    "hash_sample_quantiles",
    "embedding_gram_matrix",
    "embedding_pca_power",
    "embedding_projection_stats",
    "vocab_growth_curve",
    "source_overlap_matrix",
    "dup_graph_kcore",
    "event_hour_anomalies",
    "term_freq_of_freq",
    "eval_sample_manifest",
    "proportional_interleave",
    "lsh_param_sweep",
    "ngram_diversity_hll",
    # round-8 additions
    "score_calibration_bins",
    "tokenizer_fertility_stats",
    "langid_confusion",
    "doremi_mixture_weights",
    "shuffle_run_stats",
    # pii_luhn_validated EXCLUDED: count() prunes the 1:1 Luhn projection
    # (tlsh precedent) — the probe would time an empty scan.
    "inverted_index_stats",
    "score_auc_stats",
    "blocklist_filter_stats",
    "ldiversity_release",
    "ccnet_lm_perplexity",
    "rendezvous_shard_stats",
    "filter_agreement_stats",
    "embedding_norm_outliers",
    "ngram_diversity_hll_fast",
    "corpus_checksum",
    "charclass_stats",
    "join_size_estimate",
    "embedding_nan_stats",
    "priority_sample",
    # round-9 additions
    "priority_sample_stratified",
    "unicode_clean_stats",
    # unicode_clean_docs + pii_iban_validated EXCLUDED: count() prunes
    # their 1:1 row-local projections (tlsh/luhn precedent); the stats
    # twin carries the unicode family's cost, and PERF.md records the
    # IBAN digest-consuming measurement.
    "token_budget_waterfill",
    "bitext_margin_pairs",
    "code_switch_stats",
    "referential_integrity",
    "lsh_recall_audit",
    "waterfill_sample_stats",
    "line_lang_spans",
    "embedding_centroid_stats",
    "dup_pair_evidence",
    "event_transition_matrix",
    "dedup_verdict_matrix",
    "binary_embedding_recall",
    "user_type_gini",
    "tcloseness_release",
    "retrieval_ndcg_eval",
    # name_edit_near_pairs / entity_blocking_stats EXCLUDED: they read the
    # part table, absent from the documents-only probe dir (zorder
    # precedent); growth is vocab-bounded by construction (edit distance
    # runs on DISTINCT names, Heaps-sublinear in rows).
    # part_affinity_pairs EXCLUDED: reads lineitem (zorder precedent);
    # growth is linear-in-orders by the BASKET_CAP bound (<= C(cap,2)
    # pairs per order), plan-asserted WindowGroupLimit prune.
    "readability_stats",
    "event_cusum_drift",
    "magic_byte_stats",
    # benford_value_audit EXCLUDED: reads lineitem (zorder precedent);
    # one row-local projection + a 9-group aggregate - map-side
    # combinable, trivially linear.
    "doc_tfidf_keywords",
    # hilbert_layout_stats EXCLUDED: reads lineitem (zorder precedent);
    # identical shape to the probed-linear z twin (one collapsed
    # projection + one grouped aggregate).
    "ks_length_drift",
    "event_path_trigrams",
    "event_mannkendall_trend",
    "event_acf_stats",
    "event_burstiness_stats",
    "event_theil_sen_trend",
    "event_hour_independence",
    "ivf_nprobe_sweep",
    "importance_ess_stats",
    "source_tv_matrix",
    "user_retention_curve",
    "funnel_latency_stats",
    "brier_decomposition",
    "purchase_attribution",
    "length_anova_stats",
    "fisher_separability_stats",
    "slo_burn_stats",
    "value_percentiles_by_type",
    "knn_label_accuracy",
    "bot_score_stats",
    "active_user_stickiness",
    "embedding_exact_dups",
    "score_lift_table",
    "transition_predictability",
    "prefix_template_stats",
    "peak_concurrency_stats",
    "seasonality_strength",
    "user_activity_fof",
    "embedding_anisotropy",
    "session_duration_stats",
    "kmv_overlap_matrix",
    "robust_length_stats",
    # customer_balance_gini / revenue_hhi_stats / cohort_ltv_curve
    # EXCLUDED: read customer/lineitem/supplier/orders (zorder precedent);
    # dimension-sized windows / one fact-grain sum / one custkey window.
    # fd_violation_stats / iqr_outlier_stats EXCLUDED: read part/customer/
    # lineitem (zorder precedent); both are one grouped count + group-
    # sized tails per the plan guards.
    # round-11: rfm went two-phase (bucketed ranks over a customer
    # population that now SCALES in the probe dir — gen_scale_probe
    # shifts custkeys per replica); probing it is the point of the
    # restructure. curation_funnel_v2 joined after its fact-grain
    # checkpoint removal.
    "rfm_segments",
    "curation_funnel_v2",
    # round-12: the standing heavy family joins the probe (VERDICT r11
    # Next #3) — pagerank needed the scaled lineitem gen_scale_probe now
    # writes (suppkey domain scales, so nodes AND edges grow 10x);
    # incremental_cluster_members' star-compressed label fold reads only
    # documents.
    "supplier_pagerank",
    "incremental_cluster_members",
]


def main(
    probe_dir: str = "/tmp/sfprobe", repeats: int = 2, only: list[str] | None = None
) -> int:
    import __spark_entry__ as entrymod
    from wurzel_spark.session import get_spark

    spark = get_spark()
    qs = entrymod.queries()
    queries = [q for q in QUERIES if q in only] if only else QUERIES
    # warmup: JIT + codegen caches, so the first timed query isn't paying
    # session startup.
    qs["dedup_exact"](spark, BASE).count()

    rows = []
    fail = False
    for name in queries:
        fn = qs[name]
        times = {}
        for label, d in (("sf0.1", BASE), ("sf1-probe", probe_dir)):
            best = None
            n = None
            for _ in range(repeats):
                t0 = time.monotonic()
                n = fn(spark, d).count()
                dt = time.monotonic() - t0
                best = dt if best is None else min(best, dt)
            times[label] = (best, n)
        g = times["sf1-probe"][0] / max(times["sf0.1"][0], 1e-9)
        flag = "" if g <= MAX_GROWTH else " **SUPRALINEAR**"
        if g > MAX_GROWTH:
            fail = True
        rows.append(
            f"| {name} | {times['sf0.1'][0]:.2f} | {times['sf1-probe'][0]:.2f} "
            f"| {g:.1f}x{flag} | {times['sf0.1'][1]} | {times['sf1-probe'][1]} |"
        )
        print(rows[-1], flush=True)
    print()
    print("| query | sf0.1 s | sf1 s | growth | rows sf0.1 | rows sf1 |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(r)
    return 1 if fail else 0


if __name__ == "__main__":
    probe = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfprobe"
    rep = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    names = sys.argv[3].split(",") if len(sys.argv) > 3 else None
    raise SystemExit(main(probe, rep, names))
