"""Real TLSH (functions/tlsh.py): algorithm properties that hold for any
Pearson permutation — determinism, locality ordering, distance metric
behavior, unhashable contracts — plus the Spark column wrappers."""

import pytest

from wurzel_spark.functions.tlsh import (
    tlsh_col,
    tlsh_digest,
    tlsh_distance,
    tlsh_distance_col,
)

BASE = ("The quick brown fox jumps over the lazy dog. " * 20).encode()
NEAR = ("The quick brown fox jumps over the lazy cat. " * 20).encode()
FAR = (
    "Completely different content about spark engines and parquet files, "
    "nothing shared with the other text at all here. " * 10
).encode()


def test_digest_format_and_determinism():
    d = tlsh_digest(BASE)
    assert d is not None and len(d) == 72 and d.startswith("T1")
    assert int(d[2:], 16) is not None  # valid hex payload
    assert tlsh_digest(BASE) == d  # deterministic


def test_unhashable_inputs_return_none():
    assert tlsh_digest(b"") is None
    assert tlsh_digest(b"too short") is None  # < 50 bytes
    assert tlsh_digest(b"a" * 500) is None  # zero variance (q3 == 0)


def test_distance_is_zero_iff_same_and_orders_by_similarity():
    d0, d1, d2 = tlsh_digest(BASE), tlsh_digest(NEAR), tlsh_digest(FAR)
    assert tlsh_distance(d0, d0) == 0
    near_d, far_d = tlsh_distance(d0, d1), tlsh_distance(d0, d2)
    assert 0 < near_d < far_d  # locality: one-word edit ≪ unrelated text
    assert near_d < 100 < far_d  # the conventional TLSH match band
    assert tlsh_distance(d0, None) is None


def test_distance_is_symmetric_and_respects_length_header():
    d0 = tlsh_digest(BASE)
    d_long = tlsh_digest(BASE * 8)  # same content repeated — length differs
    assert tlsh_distance(d0, d_long) == tlsh_distance(d_long, d0)
    assert tlsh_distance(d0, d_long) > 0  # the L byte penalizes length gaps


def test_small_edit_distance_grows_with_edit_size():
    edits1 = BASE.replace(b"dog", b"cat")
    edits2 = BASE.replace(b"dog", b"cat").replace(b"quick", b"slow").replace(
        b"fox", b"elk"
    )
    d0 = tlsh_digest(BASE)
    assert tlsh_distance(d0, tlsh_digest(edits1)) <= tlsh_distance(
        d0, tlsh_digest(edits2)
    )


def test_spark_columns(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, BASE.decode()),
            (2, NEAR.decode()),
            (3, FAR.decode()),
            (4, "tiny"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["tlsh"] for r in df.select(
        "doc_id", tlsh_col(F.col("text")).alias("tlsh")
    ).collect()}
    assert out[1] == tlsh_digest(BASE)  # Spark path == scalar path
    assert out[4] is None
    pairs = spark.createDataFrame(
        [(out[1], out[2]), (out[1], out[3]), (out[1], None)], "a string, b string"
    )
    dists = [
        r["d"] for r in pairs.select(tlsh_distance_col("a", "b").alias("d")).collect()
    ]
    assert dists[0] == tlsh_distance(out[1], out[2])
    assert dists[1] == tlsh_distance(out[1], out[3])
    assert dists[2] is None


def test_library_parity_when_available():
    """When the real tlsh package is importable, our wrapper must defer to
    it (wire-format parity); otherwise this documents the twin's scope."""
    try:
        import tlsh as lib
    except ImportError:
        pytest.skip("tlsh C library not installed — pure-numpy twin in use")
    assert tlsh_digest(BASE) == lib.hash(BASE)  # pragma: no cover
