"""Regression tests for the four round-7 advisor findings (ADVICE.md r7):

1. streaming/substrings.py — drain missed the replay guard every other
   drain has: a batch present BOTH in a folded partition and in its
   rewritten batch=N partition falsely flagged all its windows duplicated.
2. streaming/fof.py — the aggregating fold re-keyed the IN-FLIGHT batch's
   partials under src_batch=-1, so a replay double-summed its counts.
3. operators/dedup.py lsh_param_sweep — bucket key hashed band CONTENT
   only; equal signature content in different bands of one config merged
   buckets and overcounted candidate_pair_slots.
4. operators/textstats.py c4_clean_docs — predicates were duplicated
   expressions, not shared helpers; stats and mutation could drift.
"""

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string, lang string"
    )


# --------------------------------------------------------- finding 1


def test_substring_drain_dedups_replayed_batch(spark, tmp_path):
    """Crash window: batch 0's window rows exist BOTH in the folded
    partition and in a rewritten batch=0 partition. The drain must
    key-dedup — a doc with NO internal duplication must not come back
    with every window flagged duplicated."""
    from wurzel_spark.operators.substrings import (
        exact_substring_removal,
        window_hashes,
    )
    from wurzel_spark.streaming.substrings import drain_substring_state

    docs = _docs(
        spark,
        [
            (1, " ".join(f"u{i}" for i in range(80)), "a", "en"),
            (2, " ".join(f"v{i}" for i in range(80)), "a", "en"),
        ],
    )
    expected = {
        r["doc_id"]: (r["n_dup_windows"], r["n_removed_tokens"])
        for r in exact_substring_removal(docs).collect()
    }
    assert expected == {1: (0, 0), 2: (0, 0)}  # fixture sanity

    state = str(tmp_path / "sub_state")
    wins, toks = window_hashes(docs)
    staged = wins.unionByName(
        toks.select(
            "doc_id",
            F.lit(0).cast("int").alias("s"),
            F.col("n_tokens").cast("long").alias("h"),
        )
    )
    # folded partition AND the replayed batch's own partition, same rows
    staged.write.mode("overwrite").parquet(f"{state}/batch=-1")
    staged.write.mode("overwrite").parquet(f"{state}/batch=0")
    got = {
        r["doc_id"]: (r["n_dup_windows"], r["n_removed_tokens"])
        for r in drain_substring_state(spark, state).collect()
    }
    assert got == expected
    # and exactly one output row per doc (duplicated s=0 sentinels used
    # to emit duplicate per-doc rows)
    assert len(got) == 2


# --------------------------------------------------------- finding 2


def test_fof_fold_then_replay_does_not_double_sum(spark, tmp_path):
    """The fold at batch 1 (compact_every=2) may only absorb COMMITTED
    batch 0; batch 1 keeps its own overwrite-idempotent partition, so a
    replayed batch 1 changes nothing."""
    from wurzel_spark.operators.textstats import term_freq_of_freq
    from wurzel_spark.streaming.fof import drain_fof_state, stage_type_counts

    b0 = _docs(spark, [(1, "x y z", "a", "en"), (2, "x y", "a", "en")])
    b1 = _docs(spark, [(3, "x q", "a", "en"), (4, "q q r", "a", "en")])
    expected = {
        r["source"]: (r["n_tokens"], r["n_types"], r["f1"], r["f2"], r["f3"])
        for r in term_freq_of_freq(b0.unionByName(b1)).collect()
    }

    state = str(tmp_path / "fof_state")
    stage_type_counts(b0, 0, state, compact_every=2)
    stage_type_counts(b1, 1, state, compact_every=2)  # triggers the fold
    once = {
        r["source"]: (r["n_tokens"], r["n_types"], r["f1"], r["f2"], r["f3"])
        for r in drain_fof_state(spark, state).collect()
    }
    assert once == expected
    # at-least-once replay of batch 1 AFTER its fold-window completed
    stage_type_counts(b1, 1, state, compact_every=2)
    again = {
        r["source"]: (r["n_tokens"], r["n_types"], r["f1"], r["f2"], r["f3"])
        for r in drain_fof_state(spark, state).collect()
    }
    assert again == expected


def test_fof_stream_still_matches_batch(spark, tmp_path):
    """End-to-end parity survives the fold_current=False restructuring."""
    from wurzel_spark.operators.textstats import term_freq_of_freq
    from wurzel_spark.streaming.fof import fof_stream

    docs = _docs(
        spark,
        [(i, f"w{i % 7} w{i % 3} common", f"s{i % 2}", "en") for i in range(40)],
    )
    expected = sorted(map(tuple, term_freq_of_freq(docs).collect()))
    d = str(tmp_path / "fof_in")
    docs.repartition(4).write.mode("overwrite").parquet(d)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = sorted(
        map(
            tuple,
            fof_stream(
                stream,
                str(tmp_path / "fof_state2"),
                str(tmp_path / "fof_ckpt"),
                compact_every=2,
            ).collect(),
        )
    )
    assert got == expected


# --------------------------------------------------------- finding 3


def test_lsh_sweep_band_index_distinguishes_buckets(spark, monkeypatch):
    """Two docs whose signatures agree in EVERY slot pair-collide once per
    band — candidate_pair_slots must equal b (one pair slot per band), not
    C(2b, 2)-ish counts from cross-band bucket merging. With content-only
    keys, all 24 identical r=1 band values of the pair landed in ONE
    bucket of size 48 → C(48,2)=1128 slots; with the band index keyed,
    24 buckets of size 2 → 24 slots."""
    import wurzel_spark.operators.dedup as dd

    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta", "a", "en"),
            (2, "alpha beta gamma delta epsilon zeta", "a", "en"),
        ],
    )
    r = {(row["b"], row["r"]): row for row in dd.lsh_param_sweep(docs).collect()}
    for (b, rr), row in r.items():
        assert row["candidate_pair_slots"] == b, (
            f"config ({b},{rr}): expected one pair slot per band, got "
            f"{row['candidate_pair_slots']} (cross-band bucket merge?)"
        )
        assert row["max_bucket"] == 2


# --------------------------------------------------------- finding 4


def test_c4_stats_and_mutation_share_predicates(spark):
    """c4_clean_docs keeps exactly the docs c4_line_filter_stats flags
    c4_keep, with cleaned_text = the kept lines — and the source now
    builds both from the same _c4_* helpers (asserted structurally)."""
    import inspect

    from wurzel_spark.operators import textstats as ts

    docs = _docs(
        spark,
        [
            # survives: 3 sentences across kept lines
            (1, "This line has more than five words in it.\n"
                "Another line with six good words here!\n"
                "A third full sentence with many words?", "a", "en"),
            # dropped: curly brace page
            (2, "This line has more than five words total. {json}", "a", "en"),
            # dropped: javascript line leaves <3 sentences
            (3, "Please enable javascript to view this page now.", "a", "en"),
            # dropped: lorem ipsum
            (4, "Lorem ipsum dolor sit amet consectetur adipiscing elit.\n"
                "A second real sentence with enough words here.\n"
                "A third real sentence with enough words too.", "a", "en"),
        ],
    )
    stats = {r["doc_id"]: r for r in ts.c4_line_filter_stats(docs).collect()}
    cleaned = {r["doc_id"]: r["cleaned_text"] for r in ts.c4_clean_docs(docs).collect()}
    assert set(cleaned) == {d for d, r in stats.items() if r["c4_keep"]} == {1}
    assert cleaned[1].count("\n") == stats[1]["n_kept_lines"] - 1
    # structural guard: both functions call the shared helpers, and the
    # predicate literals appear exactly once (inside the helpers)
    src_stats = inspect.getsource(ts.c4_line_filter_stats)
    src_clean = inspect.getsource(ts.c4_clean_docs)
    for helper in ("_c4_kept_lines", "_c4_page_drop", "_c4_n_sentences"):
        assert helper in src_stats and helper in src_clean
    # the Spark-side line-survival predicate exists exactly once (in the
    # helper); the oracle SQL twin lives once in the shared _C4_KEPT_CTE
    module_src = inspect.getsource(ts)
    assert module_src.count("rlike('[.!?\"]$')") == 1
    assert module_src.count("regexp_matches(trim(x), '[.!?\"]$')") == 1
