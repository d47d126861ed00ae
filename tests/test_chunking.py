"""Content-defined chunking: boundary locality, determinism, dedup
accounting (operators/chunking.py)."""

import numpy as np

from wurzel_spark.operators.chunking import (
    _chunk_spans,
    chunk_dedup_stats,
    content_defined_chunks,
)


def _rand_text(n, seed):
    rng = np.random.default_rng(seed)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    return " ".join(words[i] for i in rng.integers(0, len(words), n))


def test_spans_cover_and_respect_bounds():
    data = _rand_text(2000, 1).encode()
    spans = _chunk_spans(data, 64, 256, 1024)
    assert spans[0][0] == 0 and spans[-1][1] == len(data)
    for (a, b), (c, _) in zip(spans, spans[1:]):
        assert b == c  # contiguous
    for a, b in spans[:-1]:  # the tail chunk may be short
        assert 64 <= b - a <= 1024
    # avg chunk size in the right ballpark (expected 256 + min offset)
    sizes = [b - a for a, b in spans]
    assert 100 < sum(sizes) / len(sizes) < 1000


def test_edit_changes_only_local_chunks():
    """The CDC selling point: a middle edit leaves distant chunk hashes
    identical (fixed-size chunking would shift everything after)."""
    import hashlib

    base = _rand_text(3000, 2)
    edited = base[:7000] + "INSERTED-BYTES" + base[7000:]
    h1 = [
        hashlib.sha256(base.encode()[a:b]).hexdigest()
        for a, b in _chunk_spans(base.encode(), 64, 256, 1024)
    ]
    h2 = [
        hashlib.sha256(edited.encode()[a:b]).hexdigest()
        for a, b in _chunk_spans(edited.encode(), 64, 256, 1024)
    ]
    shared = len(set(h1) & set(h2))
    assert shared / len(h1) > 0.7  # most chunks realign around the edit


def test_chunk_dedup_stats_accounting(spark):
    docs = spark.createDataFrame(
        [(1, _rand_text(500, 3)), (2, _rand_text(500, 3)), (3, _rand_text(500, 4))],
        "doc_id long, text string",
    )
    chunks = content_defined_chunks(docs)
    rows = chunks.collect()
    assert {r["doc_id"] for r in rows} == {1, 2, 3}
    # doc 1 and 2 identical -> their chunk hash sets match
    h1 = {r["chunk_hash"] for r in rows if r["doc_id"] == 1}
    h2 = {r["chunk_hash"] for r in rows if r["doc_id"] == 2}
    assert h1 == h2
    stats = chunk_dedup_stats(chunks).collect()[0]
    assert stats["n_chunks"] > stats["n_distinct_chunks"]
    assert stats["total_bytes"] > stats["distinct_bytes"]
    assert 0.2 < stats["dedup_ratio"] < 0.8  # one of three docs redundant
    # exact accounting: distinct bytes equal sum over distinct hashes
    per = {}
    for r in rows:
        per[r["chunk_hash"]] = r["chunk_len"]
    assert stats["distinct_bytes"] == sum(per.values())
    assert stats["total_bytes"] == sum(r["chunk_len"] for r in rows)


def test_chunking_deterministic_across_partitionings(spark):
    docs = spark.createDataFrame(
        [(i, _rand_text(300, i)) for i in range(10)], "doc_id long, text string"
    )
    a = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_hash"])
        for r in content_defined_chunks(docs.repartition(1)).collect()
    )
    b = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_hash"])
        for r in content_defined_chunks(docs.repartition(7)).collect()
    )
    assert a == b
