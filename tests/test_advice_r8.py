"""Regression tests for the two round-8 advisor findings (ADVICE.md r8):

1. operators/selection.py priority_scores — Spark `div` on DECIMAL
   operands returns LONG and silently WRAPS once the quotient q =
   w*2^60/u passes 2^63 (u < w/8), dropping what should be a
   top-priority row and diverging from the oracle's HUGEINT `//`.
   Fixed with two-stage long division (div + exact decimal division of
   the remainder term) that is exact over the full int64 weight domain.
2. operators/linalg.py NORM_OUTLIERS — DuckDB list_sum([]) is NULL
   while F.aggregate's 0-seed fold returns 0, so an EMPTY embedding
   landed in bucket b=NULL oracle-side vs b=0 Spark-side and shifted
   every cumulative rank for its label. Both engines now exclude
   zero-length vectors from the norm battery (they stay visible in
   embedding_nan_stats' dim accounting).
"""

import hashlib

import duckdb

import __spark_entry__ as e


_PRI_U_RANGE = 1 << 60


def _py_u(doc_id) -> int:
    """Python twin of md5_prefix_hash(doc_id)+1 (dedup.md5_prefix_hash)."""
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16) + 1


# --------------------------------------------------------- finding 1


def test_priority_scores_no_wrap_past_int64(spark):
    """Weights near 2^63 force q = w*2^60/u >= 2^63 for every u < 2^60:
    the old `div` form wrapped these negative. q must equal Python's
    exact big-int floordiv (== the oracle's HUGEINT `//`) and stay
    positive."""
    from wurzel_spark.operators.selection import priority_scores

    rows = [
        (1, "s", (1 << 63) - 1),
        (2, "s", (1 << 62) + 12345),
        (3, "s", 9 << 50),
        (4, "s", 1000),
        (5, "s", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {r["doc_id"]: int(r["q"]) for r in priority_scores(df).collect()}
    for doc_id, _, w in rows:
        exp = w * _PRI_U_RANGE // _py_u(doc_id)
        assert got[doc_id] == exp, (doc_id, got[doc_id], exp)
        assert got[doc_id] >= 0
    # at least one case genuinely exercises the >2^63 range
    assert max(got.values()) > (1 << 63)


def test_priority_sample_huge_weight_is_top_priority(spark):
    """End-to-end: with k regular docs plus one astronomically-weighted
    doc, the heavy doc MUST rank first. Under the wrap it ranked last."""
    from wurzel_spark.operators.selection import priority_sample

    rows = [(i, "s", 100 + i) for i in range(10)]
    rows.append((999, "s", (1 << 62)))
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    out = priority_sample(df, k=5).collect()
    assert out[0]["doc_id"] == 999
    assert len(out) == 5
    assert all(r["priority_q"] >= 0 for r in out)


# --------------------------------------------------------- finding 2


def test_norm_outliers_empty_vector_matches_oracle(spark):
    """An empty embedding must not shift the label's histogram in either
    engine: cross-engine equality on the full output with an empty
    vector planted next to normal ones."""
    from wurzel_spark.operators.linalg import embedding_norm_outliers

    rows = [(i, [1.0, 2.0, float(i % 3)], 0) for i in range(8)]
    rows.append((100, [], 0))  # empty vector — excluded from the battery
    rows.append((101, [5.0, 5.0, 5.0], 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = [tuple(r) for r in embedding_norm_outliers(df).collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[], label INT)")
    con.executemany("INSERT INTO embeddings VALUES (?,?,?)", rows)
    exp = [tuple(r) for r in con.execute(e.oracle_sql()["embedding_norm_outliers"]).fetchall()]
    assert got == exp
    # the battery saw only the 9 non-empty vectors
    assert got[0][1] == 9
