"""Round-8 late additions: blocklist filter battery, l-diversity
release gate, CCNet-style LM perplexity, rendezvous (HRW) sharding."""

from pyspark.sql import functions as F

from wurzel_spark.operators.layout import (
    RDV_N_SHARDS,
    rendezvous_owner,
    rendezvous_shard_stats,
)
from wurzel_spark.operators.textstats import (
    blocklist_filter_stats,
    ccnet_lm_perplexity,
    ldiversity_release,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )


# ------------------------------------------------------------- blocklist


def test_blocklist_exact_counts(spark):
    # doc 1: 1 hit in 4 tokens (250 permille > 50) → flagged + gated
    # doc 2: 1 hit in 40 tokens (25 permille) → flagged, NOT gated
    # doc 3: clean → neither; doc 4: empty text → tokenless, neither
    docs = _docs(
        spark,
        [
            (1, "slow xxx yyy zzz", "s", "en", 16),
            (2, "big " + " ".join(f"w{i}" for i in range(39)), "s", "en", 160),
            (3, "clean words only here", "s", "en", 21),
            (4, "   ", "s", "en", 3),
        ],
    )
    r = blocklist_filter_stats(docs).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_docs"] == 4
    assert row["flagged_docs"] == 2
    assert row["gated_docs"] == 1
    assert row["total_hits"] == 2
    assert row["total_tokens"] == 48
    assert row["hit_permille"] == 2 * 1000 // 48


def test_blocklist_multiplicity_counted(spark):
    # repeated terms count once per occurrence, not once per doc
    docs = _docs(spark, [(1, "slow slow big slow", "s", "en", 18)])
    row = blocklist_filter_stats(docs).collect()[0]
    assert row["total_hits"] == 4 and row["flagged_docs"] == 1


# ----------------------------------------------------------- l-diversity


def test_ldiversity_suppresses_homogeneous_groups(spark):
    # srcA: 3 langs → released; srcB: 1 lang (homogeneous) → suppressed;
    # srcC: 2 langs → suppressed. Totals must reconcile.
    rows = [
        (1, "x", "srcA", "en", 10),
        (2, "x", "srcA", "de", 20),
        (3, "x", "srcA", "fr", 30),
        (4, "x", "srcB", "en", 40),
        (5, "x", "srcB", "en", 50),
        (6, "x", "srcC", "en", 60),
        (7, "x", "srcC", "de", 70),
    ]
    out = {r["source"]: r for r in ldiversity_release(_docs(spark, rows)).collect()}
    assert set(out) == {"srcA", "__suppressed__"}
    assert out["srcA"]["n_docs"] == 3 and out["srcA"]["min_sensitive_values"] == 3
    sup = out["__suppressed__"]
    assert sup["n_docs"] == 4 and sup["n_merged_groups"] == 2
    assert sup["min_sensitive_values"] == 1  # the worst group's diversity
    assert sum(r["n_docs"] for r in out.values()) == len(rows)
    assert sum(r["sum_chars"] for r in out.values()) == sum(r[4] for r in rows)


# -------------------------------------------------------- CCNet LM score


def test_ccnet_oov_scores_worse_than_fluent(spark):
    # Train slice = doc_id % 4 != 0. Docs 1-3 (train) repeat the same
    # fluent bigram pattern; doc 4 (held out) is pure OOV gibberish and
    # doc 8 (held out) repeats the fluent pattern. The OOV doc must have
    # zero seen bigrams and a strictly higher per-bigram NLL.
    fluent = "the cat sat on the mat"
    rows = [
        (1, fluent, "s", "en", 1),
        (2, fluent, "s", "en", 1),
        (3, fluent, "s", "en", 1),
        (4, "zzq qqz zqq qzz", "s", "en", 1),
        (8, fluent, "s", "en", 1),
    ]
    out = {r["doc_id"]: r for r in ccnet_lm_perplexity(_docs(spark, rows)).collect()}
    assert set(out) == {1, 2, 3, 4, 8}
    assert out[4]["oov_bigrams"] == out[4]["n_bigrams"] == 3
    assert out[8]["oov_bigrams"] == 0
    assert out[8]["n_bigrams"] == 5
    assert out[4]["avg_nll_q20"] > out[8]["avg_nll_q20"]
    # train docs score identically to the held-out fluent doc (same text,
    # same LM) — the score depends on content only, not split membership
    assert out[1]["nll_q20"] == out[8]["nll_q20"]


def test_ccnet_language_models_are_separate(spark):
    # The same bigram in two languages trains two distinct models: the
    # 'de' doc's bigram is unseen by the 'en' model and vice versa, so a
    # held-out doc is OOV in a language whose train slice never saw it.
    rows = [
        (1, "alpha beta", "s", "en", 1),
        (2, "alpha beta", "s", "en", 1),
        (3, "alpha beta", "s", "de", 1),
        (4, "alpha beta", "s", "fr", 1),  # held out? 4%4==0 → scored only
    ]
    out = {r["doc_id"]: r for r in ccnet_lm_perplexity(_docs(spark, rows)).collect()}
    # fr has NO train docs at all → everything OOV with V=1 fallback
    assert out[4]["oov_bigrams"] == 1
    # en/de docs are train members of their own models → seen
    assert out[1]["oov_bigrams"] == 0 and out[3]["oov_bigrams"] == 0


def test_ccnet_partitioning_independent(spark):
    docs = _docs(
        spark,
        [(i, f"w{i % 3} w{(i + 1) % 3} w{(i + 2) % 3} tail", "s", "en", 1) for i in range(1, 21)],
    )
    a = sorted(map(tuple, ccnet_lm_perplexity(docs).collect()))
    b = sorted(map(tuple, ccnet_lm_perplexity(docs.repartition(7)).collect()))
    assert a == b


# ------------------------------------------------------------ rendezvous


def test_rendezvous_minimal_movement_invariant(spark):
    docs = _docs(spark, [(i, "x", "s", "en", i) for i in range(1, 401)])
    rows = {r["shard"]: r for r in rendezvous_shard_stats(docs).collect()}
    assert sum(r["n_docs"] for r in rows.values()) == 400
    for shard, r in rows.items():
        if shard == 0:
            # every row owned by the dropped shard moves...
            assert r["moved_out_on_drop0"] == r["n_docs"]
        else:
            # ...and no row owned by a surviving shard moves (HRW law)
            assert r["moved_out_on_drop0"] == 0


def test_rendezvous_drop_any_shard_moves_only_its_rows(spark):
    # the invariant is not special to shard 0: drop shard 5 directly
    docs = _docs(spark, [(i, "x", "s", "en", i) for i in range(1, 201)])
    d = F.col("doc_id")
    survivors = [s for s in range(RDV_N_SHARDS) if s != 5]
    moved = (
        docs.select(
            rendezvous_owner(d).alias("o"),
            rendezvous_owner(d, survivors).alias("o2"),
        )
        .filter(F.col("o") != F.col("o2"))
        .select("o")
        .distinct()
        .collect()
    )
    assert {r["o"] for r in moved} == {5}


# ------------------------------------------------- streaming blocklist


def test_streaming_blocklist_matches_batch(spark, tmp_path):
    """Additive per-source partials staged over micro-batches == the
    batch filter-rate table bit-exactly (integer sums are admission-order
    independent)."""
    from wurzel_spark.operators.textstats import blocklist_filter_stats
    from wurzel_spark.streaming._fs import list_batch_ids
    from wurzel_spark.streaming.blocklist import blocklist_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, "/root/testdata/sf0.001", "documents").localCheckpoint()
    d = str(tmp_path / "bl_in")
    docs.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    state = str(tmp_path / "bl_state")
    got = sorted(
        map(
            tuple,
            blocklist_stream(
                stream, state, str(tmp_path / "bl_ckpt"), compact_every=2
            ).collect(),
        )
    )
    exp = sorted(map(tuple, blocklist_filter_stats(docs).collect()))
    assert got == exp and len(got) > 0
    assert len(list_batch_ids(spark, state)) <= 2


def test_streaming_blocklist_replay_is_idempotent(spark, tmp_path):
    """A replayed delivery (foreachBatch retry after the state write,
    before the checkpoint commit) must overwrite its batch partition,
    never double-sum it."""
    from wurzel_spark.operators.textstats import blocklist_source_partials
    from wurzel_spark.streaming._state import write_batch_state
    from wurzel_spark.streaming.blocklist import drain_blocklist_state
    from wurzel_spark.tables import table as _table

    docs = _table(spark, "/root/testdata/sf0.001", "documents")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    state = str(tmp_path / "bl_replay_state")

    def _stage(df, bid):
        mine = blocklist_source_partials(df).withColumn("src_batch", F.lit(bid))
        write_batch_state(spark, mine, state, bid, ["src_batch", "source"], None)

    _stage(b0, 0)
    _stage(b1, 1)
    once = sorted(map(tuple, drain_blocklist_state(spark, state).collect()))
    _stage(b0, 0)  # replayed delivery of batch 0
    assert sorted(map(tuple, drain_blocklist_state(spark, state).collect())) == once


# ------------------------------------------------- streaming CCNet LM


def test_streaming_ccnet_matches_batch(spark, tmp_path):
    """Doc-grain bigram partials staged over micro-batches, LM trained at
    drain over the FULL admitted corpus == the batch scorer bit-exactly
    (train docs split across batches must still all reach the LM)."""
    from wurzel_spark.operators.textstats import ccnet_lm_perplexity
    from wurzel_spark.streaming._fs import list_batch_ids
    from wurzel_spark.streaming.ccnet import ccnet_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, "/root/testdata/sf0.001", "documents").localCheckpoint()
    d = str(tmp_path / "cc_in")
    docs.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    state = str(tmp_path / "cc_state")
    got = sorted(
        map(
            tuple,
            ccnet_stream(
                stream, state, str(tmp_path / "cc_ckpt"), compact_every=2
            ).collect(),
        )
    )
    exp = sorted(map(tuple, ccnet_lm_perplexity(docs).collect()))
    assert got == exp and len(got) > 0
    assert len(list_batch_ids(spark, state)) <= 2


def test_streaming_ccnet_replay_is_idempotent(spark, tmp_path):
    from wurzel_spark.operators.textstats import ccnet_doc_bigrams
    from wurzel_spark.streaming._state import write_batch_state
    from wurzel_spark.streaming.ccnet import drain_ccnet_state
    from wurzel_spark.tables import table as _table

    docs = _table(spark, "/root/testdata/sf0.001", "documents")
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    state = str(tmp_path / "cc_replay_state")

    def _stage(df, bid):
        mine = ccnet_doc_bigrams(df).withColumn("src_batch", F.lit(bid))
        write_batch_state(
            spark, mine, state, bid, ["src_batch", "doc_id", "h1", "h2"], None
        )

    _stage(b0, 0)
    _stage(b1, 1)
    once = sorted(map(tuple, drain_ccnet_state(spark, state).collect()))
    _stage(b0, 0)  # replayed delivery of batch 0
    assert sorted(map(tuple, drain_ccnet_state(spark, state).collect())) == once


# ------------------------------------------------ filter agreement


def test_filter_agreement_exact_cells(spark):
    """Hand-checkable verdicts: doc A passes quality only (50 short
    words trip mean-word-len; no blocklist hits; stop density 50%);
    doc B is blocklist-gated AND fails gopher AND fails quality."""
    from wurzel_spark.operators.textstats import filter_agreement_stats

    doc_a = " ".join(["the", "xx"] * 25)            # 50 words, q1000=500
    doc_b = "slow slow slow zzz"                    # gated, 0 stopwords
    docs = _docs(spark, [(1, doc_a, "s", "en", 1), (2, doc_b, "s", "en", 1)])
    r = filter_agreement_stats(docs).collect()[0]
    assert r["n_docs"] == 2
    assert r["keep_gopher"] == 0          # A fails mean-word-len, B fails all
    assert r["keep_blocklist"] == 1       # only A
    assert r["keep_quality"] == 1         # only A
    assert r["agree_bq"] == 2             # b and q agree on both docs
    assert r["agree_gb"] == 1 and r["agree_gq"] == 1   # agree on B only
    assert r["unanimous_keep"] == 0 and r["unanimous_drop"] == 1
    assert r["agree_bq_permille"] == 1000


def test_filter_agreement_shares_gate_definitions(spark):
    """The g column must equal gopher_quality_flags' verdict and the b
    column the blocklist gate — computed through the SAME helpers, so
    assert end-to-end equality on real data (drift would break this)."""
    from wurzel_spark.operators.textstats import (
        blocklist_filter_stats,
        filter_agreement_stats,
        gopher_quality_flags,
    )
    from wurzel_spark.tables import table as _table

    docs = _table(spark, "/root/testdata/sf0.001", "documents")
    agg = {r["source"]: r for r in filter_agreement_stats(docs).collect()}
    gop = (
        gopher_quality_flags(docs)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.sum(F.col("gopher_keep").cast("long")).alias("k"))
    )
    for r in gop.collect():
        assert agg[r["source"]]["keep_gopher"] == r["k"]
    blk = {r["source"]: r for r in blocklist_filter_stats(docs).collect()}
    for s, r in agg.items():
        assert r["keep_blocklist"] == r["n_docs"] - blk[s]["gated_docs"]


# -------------------------------------------- embedding norm outliers


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_norm_outliers_flags_planted_bad_vectors(spark):
    """40 unit-ish vectors + one zero vector + one 100x-scale vector:
    both plants land beyond 3*MAD of the permille-norm histogram."""
    from wurzel_spark.operators.linalg import embedding_norm_outliers

    good = [(i, [1.0, 0.0, 0.0, 0.0], 0) for i in range(40)]
    rows = good + [(100, [0.0, 0.0, 0.0, 0.0], 0), (101, [100.0, 0.0, 0.0, 0.0], 0)]
    r = embedding_norm_outliers(_vecs(spark, rows)).collect()
    assert len(r) == 1
    row = r[0]
    assert row["n_vectors"] == 42
    # median sits on the good mass; the zero vector (b=0) and the good
    # vectors (b=0 relative to the 100x max... ) — with the 100x plant the
    # good vectors compress near b=0, so the gate flags the MAX vector.
    assert row["n_outliers"] >= 1
    assert row["max_abs_dev"] > 3 * row["mad_b"]


def test_norm_outliers_clean_label_flags_nothing(spark):
    from wurzel_spark.operators.linalg import embedding_norm_outliers

    rows = [(i, [1.0, 2.0, 3.0], 1) for i in range(30)]
    r = embedding_norm_outliers(_vecs(spark, rows)).collect()[0]
    assert r["n_outliers"] == 0 and r["mad_b"] == 0 and r["max_abs_dev"] == 0


def test_norm_outliers_partitioning_independent(spark):
    from wurzel_spark.operators.linalg import embedding_norm_outliers

    rows = [(i, [float(i % 7) / 7.0, 0.5, float(i % 3)], i % 2) for i in range(1, 101)]
    vecs = _vecs(spark, rows)
    a = sorted(map(tuple, embedding_norm_outliers(vecs).collect()))
    b = sorted(map(tuple, embedding_norm_outliers(vecs.repartition(9)).collect()))
    assert a == b


# --------------------------------------- ngram diversity fast twin


def test_hll_fast_twin_totals_match_audit_twin(spark):
    """The xxhash64 production twin must agree with the md5 audit twin on
    every hash-independent column (n_grams), drop the audit columns, and
    keep a sane register state. (Estimate ACCURACY is asserted in the
    valid-range test below — the RAW estimator is out of range at
    sf0.001 cardinalities for BOTH twins, by design.)"""
    from wurzel_spark.operators.sketches import ngram_diversity_hll
    from wurzel_spark.tables import table as _table

    docs = _table(spark, "/root/testdata/sf0.001", "documents")
    audit = {(r["source"], r["n"]): r for r in ngram_diversity_hll(docs).collect()}
    fast = {
        (r["source"], r["n"]): r
        for r in ngram_diversity_hll(docs, hasher="xxhash64", audit=False).collect()
    }
    assert set(audit) == set(fast) and len(fast) > 0
    for k, a in audit.items():
        f = fast[k]
        assert f["n_grams"] == a["n_grams"], k
        assert 0 < f["n_buckets_hit"] <= 1024
        assert f["hll_estimate"] > 0
    assert "n_distinct_exact" not in fast[next(iter(fast))].asDict()


def test_hll_fast_twin_valid_range_accuracy(spark):
    """Same 20k-distinct envelope test the audit twin passes, on the
    production hasher: the xxhash64 estimate lands within ~10% of truth."""
    from wurzel_spark.operators.sketches import ngram_diversity_hll

    rows = [
        (i, " ".join(f"tok{i}_{k}" for k in range(400)), "big", "en", 1)
        for i in range(50)
    ]
    docs = _docs(spark, rows)
    out = {
        r["n"]: r
        for r in ngram_diversity_hll(docs, hasher="xxhash64", audit=False).collect()
    }
    exact_unigrams = 50 * 400
    est = out[1]["hll_estimate"]
    assert abs(est - exact_unigrams) <= 0.10 * exact_unigrams, est


# --------------------------------------------- checksum + charclass


def test_corpus_checksum_order_and_partition_independent(spark):
    """Equal row multisets ⇒ equal checksums under any row order or
    partitioning; a single flipped character changes the checksum."""
    from wurzel_spark.operators.textstats import corpus_checksum

    rows = [(i, f"text body {i}", "s", "en", 10 + i) for i in range(1, 51)]
    docs = _docs(spark, rows)
    a = {r["source"]: r["checksum"] for r in corpus_checksum(docs).collect()}
    b = {
        r["source"]: r["checksum"]
        for r in corpus_checksum(docs.orderBy(F.desc("doc_id")).repartition(7)).collect()
    }
    assert a == b
    mutated = _docs(spark, [(i, t + ("!" if i == 17 else ""), s, l, n) for i, t, s, l, n in rows])
    c = {r["source"]: r["checksum"] for r in corpus_checksum(mutated).collect()}
    assert c != a


def test_corpus_checksum_xxhash_config_same_laws(spark):
    from wurzel_spark.operators.textstats import corpus_checksum

    rows = [(i, f"t{i}", "s", "en", 2) for i in range(1, 31)]
    docs = _docs(spark, rows)
    a = {r["source"]: r["checksum"] for r in corpus_checksum(docs, hasher="xxhash64").collect()}
    b = {
        r["source"]: r["checksum"]
        for r in corpus_checksum(docs.repartition(5), hasher="xxhash64").collect()
    }
    assert a == b


def test_charclass_partition_is_total(spark):
    """letters + digits + whitespace + other == total char mass, and the
    upper share reads from letters only."""
    from wurzel_spark.operators.textstats import charclass_stats

    docs = _docs(spark, [(1, "ABC def 123 !?\n", "s", "en", 15)])
    r = charclass_stats(docs).collect()[0]
    assert r["n_chars"] == 15
    # 6 letters, 3 digits, 4 whitespace (3 spaces + newline), 2 other
    assert r["n_other"] == 2
    assert r["letter_permille"] == 1000 * 6 // 15
    assert r["digit_permille"] == 1000 * 3 // 15
    assert r["space_permille"] == 1000 * 4 // 15
    assert r["upper_permille"] == 1000 * 3 // 6


def test_streaming_checksum_matches_batch(spark, tmp_path):
    """Per-batch checksum partials re-reduced mod 2^61 at drain == the
    batch checksum bit-exactly (modular addition is admission-order
    independent)."""
    from wurzel_spark.operators.textstats import corpus_checksum
    from wurzel_spark.streaming.checksum import checksum_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, "/root/testdata/sf0.001", "documents").localCheckpoint()
    d = str(tmp_path / "ck_in")
    docs.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    got = sorted(
        map(
            tuple,
            checksum_stream(
                stream, str(tmp_path / "ck_state"), str(tmp_path / "ck_ckpt"),
                compact_every=2,
            ).collect(),
        )
    )
    exp = sorted(map(tuple, corpus_checksum(docs).collect()))
    assert got == exp and len(got) > 0


def test_streaming_checksum_replay_is_idempotent(spark, tmp_path):
    from wurzel_spark.operators.textstats import corpus_checksum
    from wurzel_spark.streaming._state import write_batch_state
    from wurzel_spark.streaming.checksum import drain_checksum_state
    from wurzel_spark.tables import table as _table

    docs = _table(spark, "/root/testdata/sf0.001", "documents")
    state = str(tmp_path / "ck_replay")

    def _stage(df, bid):
        mine = corpus_checksum(df).withColumn("src_batch", F.lit(bid))
        write_batch_state(spark, mine, state, bid, ["src_batch", "source"], None)

    _stage(docs.filter(F.col("doc_id") % 2 == 0), 0)
    _stage(docs.filter(F.col("doc_id") % 2 == 1), 1)
    once = sorted(map(tuple, drain_checksum_state(spark, state).collect()))
    _stage(docs.filter(F.col("doc_id") % 2 == 0), 0)  # replay
    assert sorted(map(tuple, drain_checksum_state(spark, state).collect())) == once


# ----------------------------- self-review regressions (r8 session 2)


def test_rendezvous_negative_ids_stay_in_range(spark):
    """Signed ids: both engines' % keeps the dividend's sign, so without
    the double-mod a negative doc_id produced shards outside 0..NS-1."""
    docs = _docs(spark, [(i, "x", "s", "en", 1) for i in range(-100, 0)])
    rows = {r["shard"]: r for r in rendezvous_shard_stats(docs).collect()}
    assert all(0 <= s < RDV_N_SHARDS for s in rows)
    assert sum(r["n_docs"] for r in rows.values()) == 100
    for s, r in rows.items():
        assert r["moved_out_on_drop0"] == (r["n_docs"] if s == 0 else 0)


def test_checksum_distinguishes_null_positions(spark):
    """concat_ws silently skips NULLs — the sentinel coalesce must keep
    (lang=NULL, text='a') and (lang='a', text=NULL) apart, and both must
    differ from the no-null row."""
    from wurzel_spark.operators.textstats import corpus_checksum

    def chk(rows):
        df = spark.createDataFrame(
            rows, "doc_id long, text string, source string, lang string, n_chars long"
        )
        return corpus_checksum(df).collect()[0]["checksum"]

    a = chk([(1, "a", "s", None, 1)])
    b = chk([(1, None, "s", "a", 1)])
    c = chk([(1, "a", "s", "a", 1)])
    assert len({a, b, c}) == 3


def test_checksum_null_row_matches_oracle(spark):
    """A NULL-lang row must land in BOTH engines' checksums (the '||'
    oracle would have dropped it silently without the COALESCE)."""
    import duckdb

    import __spark_entry__ as e
    from wurzel_spark.operators.textstats import corpus_checksum

    rows = [(1, "alpha beta", "s", None, 10), (2, "gamma", "s", "en", 5)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    got = {r["source"]: r["checksum"] for r in corpus_checksum(df).collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, source VARCHAR,"
        " lang VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?,?,?,?,?)", rows)
    exp = {r[0]: r[3] for r in con.execute(e.oracle_sql()["corpus_checksum"]).fetchall()}
    assert got == exp


def test_charclass_vertical_tab_counts_as_space_both_engines(spark):
    """\\S differs between Java and RE2 on U+000B; the explicit class
    must agree across engines on exactly that character."""
    import duckdb

    import __spark_entry__ as e
    from wurzel_spark.operators.textstats import charclass_stats

    rows = [(1, "A\x0bB", "s", "en", 3)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string, n_chars long"
    )
    got = charclass_stats(df).collect()[0]
    assert got["n_chars"] == 3 and got["n_other"] == 0  # VT is whitespace
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, source VARCHAR,"
        " lang VARCHAR, n_chars BIGINT)"
    )
    con.executemany("INSERT INTO documents VALUES (?,?,?,?,?)", rows)
    exp = con.execute(e.oracle_sql()["charclass_stats"]).fetchdf().iloc[0]
    assert int(exp["n_other"]) == 0 and int(exp["space_permille"]) == got["space_permille"]


def test_norm_outliers_wrong_scale_batch_does_not_overflow(spark):
    """The int64-wrap case from review: high-dim vectors with ~110-scale
    components (q≈1.15e8, Σq² ≈ 1e19 > 2^63). The decimal accumulator
    must keep n2 positive and flag the bad batch instead of wrapping."""
    from wurzel_spark.operators.linalg import embedding_norm_outliers

    good = [(i, [1.0] * 768, 0) for i in range(30)]
    bad = [(99, [110.0] * 768, 0)]
    r = embedding_norm_outliers(_vecs(spark, good + bad)).collect()[0]
    assert r["max_norm2q"] > 0  # a wrapped sum would be negative
    assert r["n_outliers"] >= 1  # the wrong-scale batch is flagged
    # the good mass compresses to b=0 against the huge max; median sane
    assert r["median_b"] == 0


def test_luhn_detects_19_digit_separated_card(spark):
    """Review finding: the old {10,17} char cap truncated a 19-digit PAN
    written with separators to a 16-digit prefix that could never
    validate. Build a valid 19-digit Luhn number and format it with
    spaces."""
    from wurzel_spark.operators.textstats import pii_luhn_validated

    base = "621234567890123456"  # 18 digits; compute the check digit
    def luhn_check_digit(digits):
        total = 0
        for i, ch in enumerate(reversed(digits)):
            d = int(ch)
            if i % 2 == 0:  # positions 1,3,... from the right of the FULL pan
                d *= 2
                if d > 9:
                    d -= 9
            total += d
        return str((10 - total % 10) % 10)

    pan = base + luhn_check_digit(base)
    assert len(pan) == 19
    spaced = " ".join(pan[i : i + 4] for i in range(0, 19, 4))
    docs = _docs(spark, [(1, f"card {spaced} end", "s", "en", 30)])
    r = pii_luhn_validated(docs).collect()[0]
    assert r["n_candidates"] == 1
    assert r["n_luhn_valid"] == 1 and r["card_flag"]


# ------------------------------------------------ join size estimate


def test_join_size_estimate_exact_math_and_hot_key(spark):
    """exact_pairs = Σ c_k²; a planted hot key dominates; the estimate
    is the deterministic 1/8 sample scaled ×8 (recomputed independently
    here via the same md5-prefix rule)."""
    from wurzel_spark.operators.dedup import md5_prefix_hash
    from wurzel_spark.queries.events import join_size_estimate

    import datetime
    ts = datetime.datetime(2026, 1, 1)
    # type A: user 1 ×10 (hot), users 2..5 ×1 → exact = 100 + 4 = 104
    rows = [(i, ts, 1, "A", 0.0, "{}") for i in range(10)]
    rows += [(10 + u, ts, u, "A", 0.0, "{}") for u in (2, 3, 4, 5)]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    r = {x["event_type"]: x for x in join_size_estimate(ev).collect()}["A"]
    assert r["n_rows"] == 14 and r["n_keys"] == 5
    assert r["exact_pairs"] == 104.0
    sampled = {
        u["user_id"]
        for u in ev.select("user_id")
        .distinct()
        .filter(F.pmod(md5_prefix_hash(F.col("user_id").cast("string")), F.lit(8)) == 0)
        .collect()
    }
    contrib = {1: 100, 2: 1, 3: 1, 4: 1, 5: 1}
    expected_est = 8 * sum(contrib[u] for u in sampled)
    assert r["est_pairs"] == float(expected_est)
    assert r["err_permille"] == abs(expected_est - 104) * 1000 // 104


def test_nan_stats_flags_planted_defects(spark):
    """Planted NULL / NaN / Inf / zero / ragged-dim vectors all surface
    in the right counter (the clean rows in none)."""
    from wurzel_spark.operators.linalg import embedding_nan_stats

    rows = [
        (1, [1.0, 2.0, 3.0], 0),
        (2, [float("nan"), 1.0, 1.0], 0),
        (3, [float("inf"), 1.0, 1.0], 0),
        (4, [0.0, 0.0, 0.0], 0),
        (5, None, 0),
        (6, [1.0, 2.0], 0),  # ragged
    ]
    r = embedding_nan_stats(_vecs(spark, rows)).collect()[0]
    assert r["n_vectors"] == 6
    assert r["n_null"] == 1 and r["n_nan"] == 1 and r["n_inf"] == 1
    assert r["n_zero"] == 1
    assert r["min_dim"] == -1 and r["max_dim"] == 3  # -1 = the NULL row


# ------------------------------------------------- priority sampling


def test_priority_sample_fixed_size_and_unbiased_shape(spark):
    """Exactly k rows; every HT term >= the row's own weight; estimator
    lands within a loose envelope of the true total; small corpora
    (< k+1 rows) degrade to the exact census (est == 1000*w)."""
    from wurzel_spark.operators.selection import PRIORITY_K, priority_sample

    rows = [(i, "x", f"src{i % 4}", "en", 10 + (i * 37) % 500) for i in range(1, 401)]
    docs = _docs(spark, rows)
    out = priority_sample(docs).collect()
    assert len(out) == PRIORITY_K
    total = sum(r[4] for r in rows)
    est = sum(r["est_weight_q3"] for r in out) / 1000.0
    for r in out:
        assert r["est_weight_q3"] >= r["weight"] * 1000
    # priority sampling is unbiased; for this smooth weight profile the
    # single-draw deviation stays well inside a factor-2 envelope
    assert 0.5 * total <= est <= 2.0 * total, (est, total)
    # census case: fewer than k+1 rows → tau = 0 → HT term == weight
    small = priority_sample(_docs(spark, rows[:10]))
    srows = small.collect()
    assert len(srows) == 10
    assert all(r["est_weight_q3"] == r["weight"] * 1000 for r in srows)


def test_priority_sample_partitioning_independent(spark):
    from wurzel_spark.operators.selection import priority_sample

    rows = [(i, "x", "s", "en", 1 + (i * 13) % 97) for i in range(1, 301)]
    docs = _docs(spark, rows)
    a = [tuple(r) for r in priority_sample(docs).collect()]
    b = [tuple(r) for r in priority_sample(docs.repartition(11)).collect()]
    assert a == b


def test_streaming_priority_sample_matches_batch(spark, tmp_path):
    """Per-batch top-(k+1) candidate staging == the batch sample
    bit-exactly (top-k sets are a mergeable semilattice)."""
    from wurzel_spark.operators.selection import priority_sample
    from wurzel_spark.streaming.priority import priority_sample_stream
    from wurzel_spark.tables import table as _table

    docs = _table(spark, "/root/testdata/sf0.001", "documents").localCheckpoint()
    d = str(tmp_path / "pr_in")
    docs.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema).option("maxFilesPerTrigger", 1).parquet(d)
    )
    got = [
        tuple(r)
        for r in priority_sample_stream(
            stream, str(tmp_path / "pr_state"), str(tmp_path / "pr_ckpt"),
            compact_every=2,
        ).collect()
    ]
    exp = [tuple(r) for r in priority_sample(docs).collect()]
    assert got == exp and len(got) > 0


def test_streaming_priority_replay_is_idempotent(spark, tmp_path):
    from pyspark.sql import functions as F
    from wurzel_spark.operators.selection import priority_scores
    from wurzel_spark.streaming._state import write_batch_state
    from wurzel_spark.streaming.priority import drain_priority_state
    from wurzel_spark.tables import table as _table

    docs = _table(spark, "/root/testdata/sf0.001", "documents")
    state = str(tmp_path / "pr_replay")

    def _stage(df, bid):
        mine = (
            priority_scores(df)
            .orderBy(F.col("q").desc(), "doc_id")
            .limit(65)
            .withColumn("src_batch", F.lit(bid))
        )
        write_batch_state(spark, mine, state, bid, ["src_batch", "doc_id"], None)

    _stage(docs.filter(F.col("doc_id") % 2 == 0), 0)
    _stage(docs.filter(F.col("doc_id") % 2 == 1), 1)
    once = [tuple(r) for r in drain_priority_state(spark, state).collect()]
    _stage(docs.filter(F.col("doc_id") % 2 == 0), 0)  # replay
    assert [tuple(r) for r in drain_priority_state(spark, state).collect()] == once


def test_norm_outliers_excludes_null_element_vectors(spark):
    """least/greatest skip NULLs in both engines, so a NULL component
    would have clamped to +2^31 and made the corrupt vector the label
    max — such vectors are excluded from the norm battery (they belong
    to embedding_nan_stats)."""
    from wurzel_spark.operators.linalg import embedding_norm_outliers

    rows = [(i, [1.0, 2.0], 0) for i in range(20)] + [(99, [None, 2.0], 0)]
    r = embedding_norm_outliers(_vecs(spark, rows)).collect()[0]
    assert r["n_vectors"] == 20  # the NULL-element vector is out
    assert r["n_outliers"] == 0 and r["mad_b"] == 0


def test_nan_stats_null_element_is_not_zero_vector(spark):
    """[0.0, NULL] must NOT count as a zero vector (three-valued-logic
    parity with the oracle's list_filter form)."""
    import duckdb

    import __spark_entry__ as e
    from wurzel_spark.operators.linalg import embedding_nan_stats

    rows = [(1, [0.0, None], 0), (2, [0.0, 0.0], 0)]
    r = embedding_nan_stats(_vecs(spark, rows)).collect()[0]
    assert r["n_zero"] == 1  # only the all-zero vector
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[], label INT)")
    con.executemany("INSERT INTO embeddings VALUES (?,?,?)", rows)
    exp = con.execute(e.oracle_sql()["embedding_nan_stats"]).fetchdf().iloc[0]
    assert int(exp["n_zero"]) == 1
