"""Exact-integer embedding Gram + quantized PCA power iteration —
numpy-parity and guarantee tests (the registered queries' DuckDB
oracles pin cross-engine equality; these pin mathematical validity)."""

import numpy as np
from pyspark.sql import functions as F

from wurzel_spark.operators.linalg import (
    QSCALE,
    _tdiv,
    embedding_gram_matrix,
    embedding_pca_power,
)


def _vecs(spark, n=40, d=8, seed=7):
    rng = np.random.RandomState(seed)
    data = rng.randn(n, d).astype(np.float32) * 0.3
    rows = [(int(i), [float(x) for x in data[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        data,
    )


def _qint(data):
    return np.floor(data.astype(np.float64) * QSCALE).astype(np.int64)


def test_gram_matches_numpy_exactly(spark):
    df, data = _vecs(spark)
    q = _qint(data)
    expect = q.T @ q  # int64 exact at this size
    got = {(r["i"], r["j"]): r["s"] for r in embedding_gram_matrix(df).collect()}
    d = data.shape[1]
    assert len(got) == d * (d + 1) // 2
    for i in range(d):
        for j in range(i, d):
            assert got[(i + 1, j + 1)] == int(expect[i, j])


def test_gram_diagonal_nonnegative(spark):
    df, _ = _vecs(spark)
    for r in embedding_gram_matrix(df).collect():
        if r["i"] == r["j"]:
            assert r["s"] >= 0


def test_tdiv_truncates_toward_zero():
    assert _tdiv(-7, 2) == -3 and _tdiv(7, -2) == -3
    assert _tdiv(7, 2) == 3 and _tdiv(-7, -2) == 3


def test_power_iteration_finds_dominant_direction(spark):
    # plant a dominant rank-1 component so the eigengap is wide enough
    # for 8 iterations to converge ((lam2/lam1)^8 << 1); isotropic noise
    # alone has a near-degenerate top pair and needs many more
    rng = np.random.RandomState(3)
    u = rng.randn(8)
    u /= np.linalg.norm(u)
    data = (rng.randn(120, 8) * 0.05 + np.outer(rng.choice([-1.0, 1.0], 120), u) * 0.4).astype(np.float32)
    rows = [(int(i), [float(x) for x in data[i]]) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedding_pca_power(df).orderBy("i").collect()
    v = np.array([r["v"] for r in out], dtype=np.float64)
    q = _qint(data).astype(np.float64)
    w, vecs = np.linalg.eigh(q.T @ q)
    top = vecs[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.99, cos
    # growth approximates the dominant eigenvalue of G' = G // 2^20
    assert out[0]["growth"] > 0


def test_power_iteration_zero_matrix(spark):
    rows = [(i, [0.0] * 4) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedding_pca_power(df).collect()
    assert [r["v"] for r in out] == [QSCALE] * 4  # start vector untouched


def test_gram_partitioning_independent(spark):
    df, _ = _vecs(spark, n=60, d=6)
    a = sorted(map(tuple, embedding_gram_matrix(df.repartition(1)).collect()))
    b = sorted(map(tuple, embedding_gram_matrix(df.repartition(9)).collect()))
    assert a == b


def test_projection_stats_match_numpy(spark):
    df, data = _vecs(spark, n=50, d=8)
    from wurzel_spark.operators.linalg import embedding_projection_stats, embedding_pca_power

    v = np.array(
        [r["v"] for r in embedding_pca_power(df).orderBy("i").collect()],
        dtype=np.int64,
    )
    q = _qint(data)
    out = {r["vec_id"]: r.asDict() for r in embedding_projection_stats(df).collect()}
    assert len(out) == 50
    for i in range(50):
        assert out[i]["norm2"] == int((q[i] * q[i]).sum())
        assert out[i]["proj"] == int(q[i] @ v)
