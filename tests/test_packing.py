"""Sequence-packing invariants + a hand-checked tiny corpus (oracle
parity runs via tools/verify_local.py / the driver gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from wurzel_spark.operators.packing import sequence_pack, sequence_pack_stats


def _docs(spark, toks):  # toks: dict doc_id -> n tokens
    return spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in toks.items()],
        "doc_id bigint, text string",
    )


def test_pack_hand_checked(spark):
    # L=5; docs: 0→3 toks, 1→4, 2→6, 3→2  (stream of 15 tokens → 3 seqs)
    df = _docs(spark, {0: 3, 1: 4, 2: 6, 3: 2})
    rows = sequence_pack(df, max_len=5).collect()
    got = [
        (r["seq_id"], r["doc_id"], r["seq_tok_start"], r["doc_tok_start"], r["n_tok"])
        for r in rows
    ]
    assert got == [
        (0, 0, 0, 0, 3),  # doc0 tokens 0-2 → seq0[0:3]
        (0, 1, 3, 0, 2),  # doc1 tokens 0-1 → seq0[3:5]
        (1, 1, 0, 2, 2),  # doc1 tokens 2-3 → seq1[0:2]
        (1, 2, 2, 0, 3),  # doc2 tokens 0-2 → seq1[2:5]
        (2, 2, 0, 3, 3),  # doc2 tokens 3-5 → seq2[0:3]
        (2, 3, 3, 0, 2),  # doc3 → seq2[3:5]
    ]


def test_pack_invariants(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    L = 128
    m = sequence_pack(docs, max_len=L)
    stats = sequence_pack_stats(docs, max_len=L).collect()
    total_m = m.agg(F.sum("n_tok")).collect()[0][0]
    # token conservation: every non-empty doc's tokens appear exactly once
    from wurzel_spark.functions import text as TXT

    total_docs = (
        docs.select(F.size(TXT.words(F.col("text"))).alias("n"))
        .filter(F.col("n") > 0)
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert total_m == total_docs
    # every sequence except the last is exactly full; ids are contiguous
    seq_ids = [r["seq_id"] for r in stats]
    assert seq_ids == list(range(len(stats)))
    assert all(r["n_tokens"] == L for r in stats[:-1])
    assert 0 < stats[-1]["n_tokens"] <= L
    # within a sequence, doc spans tile [0, n_tokens) without gaps/overlap
    by_seq = {}
    for r in m.collect():
        by_seq.setdefault(r["seq_id"], []).append(r)
    for sid, rows in by_seq.items():
        rows.sort(key=lambda r: r["seq_tok_start"])
        pos = 0
        for r in rows:
            assert r["seq_tok_start"] == pos
            assert r["n_tok"] > 0
            pos += r["n_tok"]


def test_two_level_prefix_sum_matches_reference(spark, monkeypatch):
    """r12: bucket offsets ride the plan via a two-level scan. Shrink the
    bucket/superbucket widths so a small frame exercises MANY buckets AND
    many superbuckets (incl. sparse ids straddling both boundaries), and
    check against the straight Python exclusive prefix sum."""
    from wurzel_spark.operators import packing

    monkeypatch.setattr(packing, "_PREFIX_BUCKET", 4)
    monkeypatch.setattr(packing, "_PREFIX_SUPER", 3)
    ids = [0, 1, 3, 4, 7, 11, 12, 13, 25, 26, 40, 41, 97]
    vals = [5, 1, 7, 2, 9, 4, 8, 3, 6, 2, 11, 1, 13]
    df = spark.createDataFrame(list(zip(ids, vals)), "doc_id long, n long")
    got = {
        r["doc_id"]: r["off"]
        for r in packing._exclusive_prefix_sum(df, "doc_id", "n", "off").collect()
    }
    run, want = 0, {}
    for i, v in zip(ids, vals):
        want[i] = run
        run += v
    assert got == want


def test_pack_skips_empty_docs(spark):
    df = _docs(spark, {0: 2, 2: 3}).union(
        spark.createDataFrame([(1, "   ")], "doc_id bigint, text string")
    )
    rows = sequence_pack(df, max_len=10).collect()
    assert [r["doc_id"] for r in rows] == [0, 2]
    # doc 2 starts right after doc 0 — the empty doc contributes nothing
    assert [(r["seq_tok_start"], r["n_tok"]) for r in rows] == [(0, 2), (2, 3)]
