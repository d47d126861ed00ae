"""Corpus-curation operators: repetition stats, distinctive terms,
deterministic mixture sampling, near-dedup keep-set, dup clusters."""

from pyspark.sql import functions as F

from wurzel_spark.operators import dedup, textstats


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_repetition_stats_flags_boilerplate(spark):
    rows = [
        (1, "s", "click here click here click here now"),
        (2, "s", "entirely unique words with no repeats at all today"),
    ]
    out = {
        r["doc_id"]: r
        for r in textstats.repetition_stats(_docs(spark, rows)).collect()
    }
    assert out[1]["top_2gram"] == "click here"
    assert out[1]["top_2gram_count"] == 3
    # "click here" x3 = 30 chars of 36
    assert abs(out[1]["top_2gram_char_frac"] - 30 / 36) < 1e-12
    assert out[2]["top_2gram_count"] == 1
    # doc 1: 5-grams of 6 words = 2, both distinct? ["click here click here click",
    # "here click here click here"] -> distinct -> dup frac 0
    assert out[1]["dup_5gram_frac"] == 0.0


def test_repetition_dup_5gram_fraction():
    # pure-python twin of the column algebra on a crafted repeat
    words = ("a b c d e " * 3).split()
    ngrams = [" ".join(words[i : i + 5]) for i in range(len(words) - 4)]
    assert (len(ngrams) - len(set(ngrams))) / len(ngrams) > 0.5


def test_repetition_dup_5gram_on_spark(spark):
    rows = [(1, "s", "a b c d e " * 3)]
    row = textstats.repetition_stats(_docs(spark, rows)).collect()[0]
    words = ("a b c d e " * 3).split()
    ngrams = [" ".join(words[i : i + 5]) for i in range(len(words) - 4)]
    expect = (len(ngrams) - len(set(ngrams))) / len(ngrams)
    assert abs(row["dup_5gram_frac"] - expect) < 1e-12


def test_distinctive_terms_ranks_rare_terms_first(spark):
    rows = [
        (1, "a", "zebra zebra zebra common"),
        (2, "b", "common common yak yak yak"),
    ]
    out = textstats.distinctive_terms_per_source(_docs(spark, rows), k=1).collect()
    top = {r["source"]: r for r in out}
    # 'common' appears in both sources; zebra/yak are exclusive AND more
    # frequent within their source -> they win rank 1
    assert top["a"]["term"] == "zebra" and top["a"]["df_sources"] == 1
    assert top["b"]["term"] == "yak" and top["b"]["n_sources"] == 2


def test_mixture_sample_deterministic_and_rate_shaped(spark):
    rows = [(i, f"src{i % 20}", "x") for i in range(2000)]
    df = _docs(spark, rows)
    a = textstats.mixture_sample(df, textstats.MIXTURE_PERMILLE)
    b = textstats.mixture_sample(df, textstats.MIXTURE_PERMILLE)
    ids_a = sorted(r.doc_id for r in a.collect())
    assert ids_a == sorted(r.doc_id for r in b.collect())
    by_src = {
        r["source"]: r["n"]
        for r in a.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    # full-rate sources keep everything; low-rate sources keep visibly less
    assert by_src["src0"] == 100
    assert by_src.get("src19", 0) < 35


def test_near_dedup_keep_stats_drops_larger_ids(spark):
    docs = _docs(
        spark,
        [(1, "a", "x"), (2, "a", "y"), (3, "b", "z"), (4, "b", "w")],
    )
    pairs = spark.createDataFrame([(1, 2), (2, 4)], "id_a long, id_b long")
    out = {
        r["source"]: r
        for r in dedup.near_dedup_keep_stats(docs, pairs).collect()
    }
    assert out["a"]["n_dropped"] == 1 and out["a"]["n_kept"] == 1  # doc 2
    assert out["b"]["n_dropped"] == 1 and out["b"]["n_kept"] == 1  # doc 4


def test_near_dup_clusters_chain_converges(spark):
    # chain 1-2-3-4 plus isolated pair 10-11: two components
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    out = {r["cluster_id"]: r["size"] for r in dedup.near_dup_clusters(pairs).collect()}
    assert out == {1: 4, 10: 2}


# ---------------- kernel property tests (no Spark session needed) ----------

def _py_splitmix64(z: int) -> int:
    mask = (1 << 64) - 1
    z ^= z >> 30
    z = (z * 0xBF58476D1CE4E5B9) & mask
    z ^= z >> 27
    z = (z * 0x94D049BB133111EB) & mask
    return z ^ (z >> 31)


def _py_minhash(words: list[int], num_hashes: int, n: int) -> list[int]:
    mask = (1 << 64) - 1
    if len(words) >= n:
        shingles = []
        for j in range(len(words) - n + 1):
            acc = words[j] & mask
            for t in range(1, n):
                acc = _py_splitmix64(acc) ^ (words[j + t] & mask)
            shingles.append(_py_splitmix64(acc))
    else:
        acc = words[0] & mask
        for t in range(1, len(words)):
            acc = _py_splitmix64(acc) ^ (words[t] & mask)
        shingles = [_py_splitmix64(acc)]
    out = []
    for i in range(num_hashes):
        seed = _py_splitmix64(((i + 1) * 0x9E3779B97F4A7C15) & mask)
        m = min(_py_splitmix64(h ^ seed) for h in shingles)
        out.append(m - (1 << 64) if m >= (1 << 63) else m)
    return out


def _py_simhash(words: list[int]) -> int:
    mask = (1 << 64) - 1
    sig = 0
    for j in range(64):
        votes = sum(1 if ((w & mask) >> j) & 1 else -1 for w in words)
        if votes > 0:
            sig |= 1 << j
    return sig - (1 << 64) if sig >= (1 << 63) else sig


def test_minhash_kernel_matches_python_reference():
    import numpy as np
    from hypothesis import given, settings, strategies as st
    from wurzel_spark.operators.dedup import _minhash_rows, _pad_hash_matrix

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=12),
            min_size=1,
            max_size=6,
        )
    )
    def check(rows):
        H, M = _pad_hash_matrix([np.array(r, dtype=np.int64) for r in rows])
        got = _minhash_rows(H, M, 8, 3)
        for i, r in enumerate(rows):
            assert list(got[i]) == _py_minhash(r, 8, 3)

    check()


def test_simhash_kernel_matches_python_reference():
    import numpy as np
    from hypothesis import given, settings, strategies as st
    from wurzel_spark.operators.dedup import _simhash_rows, _pad_hash_matrix

    @settings(max_examples=30, deadline=None)
    @given(
        st.lists(
            st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), min_size=1, max_size=12),
            min_size=1,
            max_size=6,
        )
    )
    def check(rows):
        H, M = _pad_hash_matrix([np.array(r, dtype=np.int64) for r in rows])
        got = _simhash_rows(H, M)
        for i, r in enumerate(rows):
            assert int(got[i]) == _py_simhash(r)

    check()


def test_quality_mixture_sample_bands(spark, sf_dir):
    from wurzel_spark.operators.textstats import (
        QUALITY_BAND_PERMILLE,
        bigram_lm_score,
        quality_mixture_sample,
    )
    from wurzel_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    out = quality_mixture_sample(docs).collect()
    assert out, "sample should be non-empty at test scale"
    n_by_band = {}
    for r in out:
        n_by_band[r["band"]] = n_by_band.get(r["band"], 0) + 1
    # every kept row's band is consistent with its familiarity + edges
    from wurzel_spark.operators.textstats import QUALITY_BAND_EDGES

    for r in out:
        fam, band = r["familiarity"], r["band"]
        lo = (None, *QUALITY_BAND_EDGES)[band]
        hi = (*QUALITY_BAND_EDGES, None)[band]
        assert (lo is None or fam >= lo) and (hi is None or fam < hi)
    # zero-rate bands would be absent; rates order roughly visible: the
    # 900-permille band keeps more than the 100-permille band when both
    # have comparable populations (sanity, not a statistical assertion)
    total = bigram_lm_score(docs).count()
    assert sum(n_by_band.values()) < total


# ---------------------------------------------- DSIR importance sampling

def test_dsir_target_docs_score_higher(spark):
    """Docs drawn from the target distribution must out-score off-target
    docs (the estimator's separating property on a synthetic corpus with
    disjoint vocabularies)."""
    from wurzel_spark.operators.textstats import dsir_importance_scores

    rows = [(i, " ".join(f"med{j % 7}" for j in range(30)), "en", "src0", 0)
            for i in range(10)]
    rows += [(100 + i, " ".join(f"web{j % 11}" for j in range(30)), "en", "src9", 0)
             for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    scores = {r.doc_id: r.importance for r in
              dsir_importance_scores(df, target_sources=("src0",)).collect()}
    tgt = [scores[i] for i in range(10)]
    raw = [scores[100 + i] for i in range(30)]
    assert min(tgt) > max(raw)


def test_dsir_count_table_is_broadcast(spark, sf_dir):
    """The hashed-bucket count table must broadcast back to the token
    stream — a shuffle join there would defeat the hashed-feature trick."""
    from wurzel_spark.operators.textstats import dsir_importance_scores
    from wurzel_spark.plans import plan_text
    from wurzel_spark.tables import table

    t = plan_text(dsir_importance_scores(table(spark, sf_dir, "documents")))
    assert "BroadcastHashJoin" in t, t
    assert "SortMergeJoin" not in t, t


def test_bpe_token_stats_match_local_tokenizer(spark, sf_dir):
    """Distributed counts must equal a driver-side encode of the same
    texts (the UDF adds no batching artifacts)."""
    from wurzel_spark.functions import tokens as TK
    from wurzel_spark.operators.textstats import bpe_token_stats
    from wurzel_spark.tables import table

    docs = table(spark, sf_dir, "documents").filter(F.col("doc_id") < 40)
    got = {r.doc_id: r.n_bpe_tokens for r in bpe_token_stats(docs).collect()}
    count = TK.token_counter("bpe")
    local = {r.doc_id: count(r.text) for r in docs.select("doc_id", "text").collect()}
    assert got == local
    assert all(v > 0 for v in got.values())


def test_corpus_quantiles_are_order_statistics(spark):
    """p50/p90/p99 must be actual member values at the ceil(p*n) rank."""
    from wurzel_spark.operators.textstats import corpus_length_quantiles

    rows = [(i, "x", "en", "s0", length) for i, length in enumerate(range(100, 200))]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang", "source", "n_chars"])
    r = corpus_length_quantiles(df).collect()[0]
    assert (r.n_docs, r.min_chars, r.max_chars) == (100, 100, 199)
    assert r.p50_chars == 149  # rank 50 of 100..199
    assert r.p90_chars == 189
    assert r.p99_chars == 198


def test_pii_redact_replaces_and_accounts(spark):
    from wurzel_spark.operators.textstats import pii_redact

    docs = spark.createDataFrame(
        [
            (1, "mail me at alice@example.com or visit https://example.com/x", "en", "s"),
            (2, "server 10.0.0.1 phone +49 151 1234567 ok", "en", "s"),
            (3, "nothing sensitive here", "en", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {r["doc_id"]: r for r in pii_redact(docs).collect()}
    assert out[1]["n_emails"] == 1 and out[1]["n_urls"] == 1
    assert "<EMAIL>" in out[1]["redacted_text"] and "<URL>" in out[1]["redacted_text"]
    assert "alice@example.com" not in out[1]["redacted_text"]
    assert out[2]["n_ipv4"] == 1 and out[2]["n_phones"] == 1
    assert "<IP>" in out[2]["redacted_text"] and "<PHONE>" in out[2]["redacted_text"]
    assert out[3]["redacted_text"] == "nothing sensitive here"
    assert out[3]["len_delta"] == 0


def test_data_budget_plan_flags_constrained_sources(spark):
    from wurzel_spark.operators.textstats import data_budget_plan

    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 100), "en", "big"),   # 100 tokens available
         (2, " ".join(["w"] * 10), "en", "tiny")],  # 10 tokens available
        "doc_id long, text string, lang string, source string",
    )
    out = {r["source"]: r for r in data_budget_plan(
        docs, rates_permille={"big": 500, "tiny": 500}, total_tokens=400
    ).collect()}
    # both need 200 tokens; big has 100 (2 epochs), tiny has 10 (20 epochs)
    assert out["big"]["needed_tokens"] == 200
    assert out["big"]["epochs_needed"] == 2.0 and not out["big"]["data_constrained"]
    assert out["tiny"]["epochs_needed"] == 20.0 and out["tiny"]["data_constrained"]


def test_markdown_structure_stats_counts(spark):
    from wurzel_spark.operators.textstats import markdown_structure_stats

    md = "# Title\n\n```py\ncode\n```\n\n| a | b |\n| 1 | 2 |\n\n- item\n[x](http://e)\n"
    docs = spark.createDataFrame(
        [(1, md, "en", "s"), (2, "plain words only", "en", "s")],
        "doc_id long, text string, lang string, source string",
    )
    out = {r["doc_id"]: r for r in markdown_structure_stats(docs).collect()}
    assert out[1]["n_headings"] == 1 and out[1]["n_code_blocks"] == 1
    assert out[1]["n_table_rows"] == 2 and out[1]["n_bullets"] == 1
    assert out[1]["n_links"] == 1
    assert out[2]["n_headings"] == 0 and out[2]["table_line_ratio"] == 0.0


def test_license_scan_flags_grants_not_bare_copyright(spark):
    from wurzel_spark.operators.textstats import license_scan

    docs = spark.createDataFrame(
        [
            (1, "Licensed under the Apache License, Version 2.0", "en", "s"),
            (2, "Copyright (c) 2024 Someone. All rights reserved.", "en", "s"),
            (3, "nothing legal here", "en", "s"),
        ],
        "doc_id long, text string, lang string, source string",
    )
    out = {r["doc_id"]: r for r in license_scan(docs).collect()}
    assert out[1]["n_apache"] == 1 and out[1]["any_license"]
    assert out[2]["n_copyright"] == 1 and not out[2]["any_license"]
    assert not out[3]["any_license"]


# ------------------------------------------------------- round-6 additions


def test_duplication_profile_counts_and_rate(spark):
    from wurzel_spark.operators.textstats import duplication_profile

    rows = [
        (1, "Same   Text", "a"), (2, "same text", "a"), (3, "other", "a"),
        (4, "unique one", "b"), (5, "unique two", "b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r["source"]: r for r in duplication_profile(docs).collect()}
    # casefold + whitespace collapse => docs 1,2 are duplicates
    assert (out["a"]["n_docs"], out["a"]["n_distinct"], out["a"]["n_dups"]) == (3, 2, 1)
    assert out["a"]["dup_rate"] == 1.0 / 3.0
    assert out["b"]["n_dups"] == 0 and out["b"]["dup_rate"] == 0.0


def test_pmi_bigrams_ranks_collocations(spark):
    from wurzel_spark.operators.textstats import pmi_bigrams

    # "new york" always co-occurs; filler words pair freely
    docs = spark.createDataFrame(
        [(i, "the visit to new york was the thing of the day " + ("a b " * (i % 3)))
         for i in range(20)],
        "doc_id long, text string",
    )
    out = pmi_bigrams(docs, min_count=5, top_k=10).collect()
    assert out, "no bigrams above floor"
    pmi = {(r["w1"], r["w2"]): r["pmi_q20"] for r in out}
    # the perfect collocation outranks the promiscuous pair: "the" pairs
    # with many second words, diluting p(x)p(y) relative to p(xy)
    assert pmi[("new", "york")] > pmi[("of", "the")]
    # exactness bookkeeping: integer counts, long fixed-point pmi
    assert all(isinstance(r["pmi_q20"], int) for r in out)


def test_event_type_drift_zero_when_stable(spark, tmp_path):
    import datetime

    from wurzel_spark.queries import events as EV

    rows = []
    base = datetime.datetime(2026, 1, 1)
    for d in range(3):
        for i in range(100):
            # identical mix every day: 50 view / 50 click
            t = "view" if i < 50 else "click"
            rows.append((d * 1000 + i, base + datetime.timedelta(days=d, seconds=i),
                         i % 7, t, 1.0, "{}"))
    # day 3: drifted mix 90/10
    for i in range(100):
        t = "view" if i < 90 else "click"
        rows.append((9000 + i, base + datetime.timedelta(days=3, seconds=i),
                     i % 7, t, 1.0, "{}"))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    d = str(tmp_path / "ev")
    ev.write.mode("overwrite").parquet(d + "/events.parquet")
    out = {str(r["day"])[:10]: r["psi_q20"] for r in EV.event_type_drift(spark, d).collect()}
    assert out["2026-01-02"] in (0, -1, -2)  # identical mix → psi ≈ 0 (floor slack)
    assert out["2026-01-03"] in (0, -1, -2)
    assert out["2026-01-04"] > 100_000  # 40-point shift → large psi


def test_kanon_suppression_reconciles_totals(spark):
    from wurzel_spark.operators.textstats import kanon_group_stats

    rows = []
    for i in range(20):
        rows.append((i, "big", "en", 100))          # 20-member group
    for i in range(3):
        rows.append((100 + i, "tiny", "de", 50))    # 3-member -> suppressed
    for i in range(2):
        rows.append((200 + i, "tiny2", "fr", 10))   # 2-member -> suppressed
    docs = spark.createDataFrame(rows, "doc_id long, source string, lang string, n_chars long")
    out = {(r["source"], r["lang"]): r for r in
           kanon_group_stats(docs, ["source", "lang"], k=5).collect()}
    assert out[("big", "en")]["n_docs"] == 20
    assert ("tiny", "de") not in out and ("tiny2", "fr") not in out
    sup = out[("__suppressed__", "__suppressed__")]
    assert sup["n_docs"] == 5 and sup["n_merged_groups"] == 2
    # totals reconcile: nothing dropped, only coalesced
    assert sum(r["n_docs"] for r in out.values()) == 25
    assert sum(r["sum_chars"] for r in out.values()) == 20 * 100 + 3 * 50 + 2 * 10


def test_join_key_skew_profile_detects_hot_key(spark):
    import json

    from wurzel_spark.queries.relational import join_key_skew_profile

    rows = [(i % 50, "x") for i in range(500)]       # uniform: 10 rows/key
    rows += [(999, "hot")] * 500                      # one hot key
    df = spark.createDataFrame(rows, "k long, v string")
    r = join_key_skew_profile(df, "k", top_n=3).collect()[0]
    assert r["n_keys"] == 51 and r["n_rows"] == 1000
    assert r["max_key_rows"] == 500
    assert r["skew_ratio"] > 20  # 500 / (1000/51) ≈ 25.5
    top = json.loads(r["top_keys_json"])
    assert top[0] == {"key": "999", "c": 500}
    assert [t["c"] for t in top] == sorted((t["c"] for t in top), reverse=True)
