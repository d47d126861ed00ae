"""Driver-contract consistency guards: the cross-file invariants that
scripted edits can silently break (r6 lesson: a dedup script ate two
oracle_sql entries — caught only by a full verify run)."""

import re


def _entry():
    import __spark_entry__ as e

    return e


def test_every_oracle_key_has_a_query():
    e = _entry()
    qs, orc = e.queries(), e.oracle_sql()
    missing = sorted(set(orc) - set(qs))
    assert not missing, f"oracle entries without queries: {missing}"


def test_known_rows_only_set_is_intentional():
    """Every queries() entry WITHOUT an oracle must be on the declared
    rows-only list — a new query landing here unintentionally (or an
    oracle entry getting dropped by a scripted edit) fails loudly."""
    e = _entry()
    rows_only = sorted(set(e.queries()) - set(e.oracle_sql()))
    declared = sorted([
        "ann_topk_ivf", "ann_topk_ivfpq", "ann_topk_lsh", "ann_topk_multiprobe",
        "ann_topk_pq", "bloom_decontam_fast", "bpe_merges", "bpe_token_stats",
        "chunk_dedup_stats", "winnow_overlap_pairs_fast",
        "combined_near_dup_pairs", "compressibility_stats", "embed_documents",
        "embed_multivector_docs", "image_near_dup_pairs",
        "lang_id_classifier_scores", "minhash_lsh_pairs",
        "multimodal_audio_features", "multimodal_decode_stats",
        "multimodal_frame_stats", "quality_classifier_scores",
        "retrieval_self_eval", "semantic_split_chunks", "simhash_near_pairs",
        "tlsh_fingerprints",
        # r7: engine-hash banding internals; S-curve pinned in
        # tests/test_lsh_sweep.py
        "lsh_param_sweep",
        # r8: xxhash64 production twin of ngram_diversity_hll (register
        # values engine-specific; n_grams parity pinned in test_round8b)
        "ngram_diversity_hll_fast",
        # r9: recall/precision audit of the engine-specific MinHash-LSH
        # pair set vs exact Jaccard; invariants pinned in test_round9
        "lsh_recall_audit",
    ])
    # retrieval_self_eval HAS an oracle since its r6 restoration
    declared = [d for d in declared if d != "retrieval_self_eval"]
    assert rows_only == declared, (
        f"unexpected rows-only drift:\n  extra={sorted(set(rows_only)-set(declared))}"
        f"\n  missing={sorted(set(declared)-set(rows_only))}"
    )


def test_bench_headline_subset_of_queries_and_abbrs_unique():
    e = _entry()
    src = open("/root/repo/bench.py").read()
    names = re.findall(
        r'^\s+"([a-z0-9_]+)",', src.split("HEADLINE = [")[1].split("]")[0], re.M
    )
    qs = e.queries()
    missing = [n for n in names if n not in qs]
    assert not missing, f"bench HEADLINE entries not in queries(): {missing}"

    def abbr(n):
        return "".join(t[:3] for t in n.split("_"))

    abbrs = [abbr(n) for n in names]
    assert len(set(abbrs)) == len(abbrs), "compact-line abbreviation collision"


def test_window_boundary_marker_position():
    """The 'driver 50-query window boundary' comment must sit exactly
    after the 50th queries() entry — the driver checks the first 50, and
    a drifting marker misstates driver coverage (ADVICE r6 #1)."""
    src = open("/root/repo/__spark_entry__.py").read()
    marker = src.index("driver 50-query window boundary")
    before = re.findall(r'^\s{8}"[a-z0-9_]+":', src[:marker], re.M)
    assert len(before) == 50, (
        f"boundary marker sits after {len(before)} entries, expected 50"
    )


def test_driver_window_has_50_entries_and_no_dups():
    import ast
    import collections

    src = open("/root/repo/__spark_entry__.py").read()
    tree = ast.parse(src)
    for node in ast.walk(tree):
        if isinstance(node, ast.FunctionDef) and node.name == "queries":
            d = [n for n in ast.walk(node) if isinstance(n, ast.Dict)][0]
            keys = [k.value for k in d.keys]
            dups = [k for k, v in collections.Counter(keys).items() if v > 1]
            assert not dups, f"duplicate queries() keys: {dups}"
            assert len(keys) >= 50, "driver window underfilled"
            return
    raise AssertionError("queries() not found")


def test_bench_compact_line_fits_driver_tail_capture():
    """The driver keeps only the LAST 2000 chars of bench.py stdout and
    json-parses the final line — r7's combined-dict line (~3.9 KB) came
    back "parsed": null and the round lost its bench metric. Guard: the
    compact line stays under budget for the CURRENT headline list even in
    the worst width case (every query slow → 4-digit centiseconds), and
    the fold-into-"oth" path keeps totals reconstructible."""
    import json

    import bench

    names = bench.HEADLINE  # the module attribute IS the current list
    assert len(names) >= 100
    # worst realistic case: every query at 99.99 s → 4-digit centiseconds
    times = {n: 99.99 for n in names}
    line = bench.compact_line(times, 0.1, sum(times.values()), 123.456)
    # r13: with the FIXED keep-set (VERDICT r12 What's-wrong #2) the
    # worst case is deterministic at ~1.89 KB — the bound is
    # compact_line's own trim budget (1900), under which the emergency
    # fold would start trimming keep-set names; the hard driver contract
    # is "one whole line inside the 2000-char tail capture", which 1900
    # plus the newline satisfies. The old 1800 margin belonged to the
    # speed-ranked fold, whose membership churn it was padding against.
    assert len(line) <= 1900, f"compact line too long: {len(line)}"
    parsed = json.loads(line)
    assert parsed["m"] == "spark_q_cs" and parsed["unit"] == "sec"
    kept_cs = sum(parsed["queries"].values())
    oth = parsed.get("oth", {"n": 0, "cs": 0})
    assert oth["n"] + len(parsed["queries"]) == len(names)
    # total reconstructible from kept + oth within rounding slack
    assert abs((kept_cs + oth["cs"]) / 100.0 - parsed["value"]) < 1.0
    # fixed keep-set semantics (r13): a keep-set member stays named even
    # in a tiny dict; a non-member ALWAYS folds to "oth" regardless of
    # speed — membership is by name, never a timing artifact.
    small = bench.compact_line({"rfm_segments": 0.315}, 0.01, 0.315, 0.08)
    sp = json.loads(small)
    assert sp["queries"] == {"rfmseg": 32} and "oth" not in sp
    other = bench.compact_line({"q1_pricing_summary": 0.315}, 0.01, 0.315, 0.08)
    op = json.loads(other)
    assert op["queries"] == {} and op["oth"] == {"n": 1, "cs": 32}


def test_bench_headline_names_all_resolve():
    """bench.py silently skips battery names missing from queries()
    (qs.get(name) -> None) — a typo would drop a query from the
    headline without any signal. Every HEADLINE name must resolve, and
    no name may repeat."""
    import bench

    import __spark_entry__ as e

    qs = e.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, missing
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
