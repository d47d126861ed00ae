"""Regression tests for the four round-9 advisor findings (ADVICE.md r9):

1. queries/events.py SESSION_DURATION_SQL — the `numbered` CTE ran the
   session-seq running sum ordered by `us` alone (and dropped event_id),
   so with duplicate (user_id, ts) events the oracle's session
   assignment was tie-order-dependent and could diverge from the Spark
   twin (which orders by (us, event_id)). Fixed: event_id projected
   through `flagged`, running sum ordered by (us, event_id).
2. queries/events.py value_hist / VALUE_PERCENTILES_SQL — +/-Inf values
   crashed the DuckDB oracle (ConversionException on CAST(floor(inf *
   1000) AS BIGINT)) while Spark's non-ANSI cast saturated to Long.MAX
   and kept the row. Fixed: infinities excluded like NaN in BOTH
   engines (and therefore in the streaming twin, which stages the same
   value_hist).
3. operators/multimodal.py _pnm_pixels — a header truncated before
   width/height/maxval, or a non-numeric header token, raised a bare
   ValueError via int(b'') instead of the documented
   NotImplementedError refusal convention.
4. operators/linalg.py FISHER_QSCALE/QSCALE quantizer clamp — the
   positive bound was 2147483648 (2^31, one past int32 max) giving
   asymmetric saturation; now 2147483647 in all Spark and SQL variants
   (engines stayed agreeing throughout — this pins the symmetric-range
   contract with saturating fixtures).
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

import __spark_entry__ as e


def _write_events(spark, rows, tmp_path):
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _events_view(con, sf):
    con.execute(
        "CREATE VIEW events AS SELECT * FROM"
        f" parquet_scan('{sf}/events.parquet/*.parquet')"
    )


# --------------------------------------------------------- finding 1


def test_session_duration_duplicate_ts_tie_break(spark, tmp_path):
    """Two events share one timestamp right AT a session boundary; the
    tied non-boundary event must join the boundary event's (new)
    session, never the previous one, in BOTH engines. Under the old
    oracle ordering DuckDB could seat event_id=2 before event_id=1 and
    pull it into the earlier session (durations 2400/0 instead of 0/0)."""
    from wurzel_spark.queries.events import (
        SESSION_DURATION_SQL,
        session_duration_stats,
    )

    d = dt.datetime
    rows = [
        (9, d(2024, 1, 1, 10, 0), 1, "v", 1.0, None),   # session A (alone)
        (1, d(2024, 1, 1, 10, 40), 1, "v", 1.0, None),  # gap 2400s > 1800s
        (2, d(2024, 1, 1, 10, 40), 1, "v", 1.0, None),  # tied ts, same session B
    ]
    sf = _write_events(spark, rows, tmp_path)
    got = [tuple(r) for r in session_duration_stats(spark, sf).collect()]
    con = duckdb.connect()
    _events_view(con, sf)
    want = [tuple(r) for r in con.execute(SESSION_DURATION_SQL).fetchall()]
    assert got == want
    # hand-computed truth: sessions {9} (bounce, 0 s) and {1,2} (0 s)
    (n_sessions, n_events, n_bounces, bounce_pm, eps_centi, p500, p900) = got[0]
    assert (n_sessions, n_events, n_bounces) == (2, 3, 1)
    assert (bounce_pm, eps_centi) == (500, 150)
    assert (p500, p900) == (0, 0)


def test_session_duration_many_duplicate_ts_cross_engine(spark, tmp_path):
    """A denser fixture: every timestamp duplicated across event_ids,
    boundaries landing on ties — engines must stay bit-equal."""
    from wurzel_spark.queries.events import (
        SESSION_DURATION_SQL,
        session_duration_stats,
    )

    d = dt.datetime
    rows = []
    eid = 0
    for u in (1, 2, 3):
        for burst in range(3):
            base = d(2024, 1, 1, 0, 0) + dt.timedelta(minutes=40 * burst * u)
            for k in range(3):  # three events, two share the burst instant
                eid += 1
                ts = base if k < 2 else base + dt.timedelta(seconds=90)
                rows.append((eid, ts, u, "v", 1.0, None))
    sf = _write_events(spark, rows, tmp_path)
    got = [tuple(r) for r in session_duration_stats(spark, sf).collect()]
    con = duckdb.connect()
    _events_view(con, sf)
    want = [tuple(r) for r in con.execute(SESSION_DURATION_SQL).fetchall()]
    assert got == want


# --------------------------------------------------------- finding 2


def test_value_percentiles_infinite_values_excluded(spark, tmp_path):
    """+Inf / -Inf must be dropped like NaN/NULL in both engines: the
    oracle must not raise, and n_values must count only finite rows."""
    from wurzel_spark.queries.events import (
        VALUE_PERCENTILES_SQL,
        value_percentiles_by_type,
    )

    d = dt.datetime
    rows = [
        (1, d(2024, 1, 1), 1, "a", 1.5, None),
        (2, d(2024, 1, 1), 1, "a", float("inf"), None),
        (3, d(2024, 1, 1), 1, "a", float("-inf"), None),
        (4, d(2024, 1, 1), 1, "a", float("nan"), None),
        (5, d(2024, 1, 1), 1, "a", None, None),
        (6, d(2024, 1, 1), 1, "a", 2.25, None),
        (7, d(2024, 1, 1), 1, "b", float("inf"), None),  # type with NO finite value
    ]
    sf = _write_events(spark, rows, tmp_path)
    got = [tuple(r) for r in value_percentiles_by_type(spark, sf).collect()]
    con = duckdb.connect()
    _events_view(con, sf)
    want = [tuple(r) for r in con.execute(VALUE_PERCENTILES_SQL).fetchall()]
    assert got == want
    by_type = {r[0]: r for r in got}
    assert by_type["a"][1] == 2  # only the two finite values
    assert by_type["a"][2] == 1500 + 2250  # sum_milli untouched by inf
    assert "b" not in by_type  # all-infinite type vanishes, not crashes


def test_streaming_percentiles_share_the_infinity_filter():
    """The streaming twin stages the SAME value_hist — the fix must not
    fork the batch and streaming filters."""
    import inspect

    from wurzel_spark import streaming  # noqa: F401  (package import path)
    import wurzel_spark.streaming.percentiles as sp

    src = inspect.getsource(sp)
    assert "value_hist" in src  # twin still stages the shared histogram


# --------------------------------------------------------- finding 3


@pytest.mark.parametrize(
    "payload",
    [
        b"P5",                      # nothing after magic
        b"P5 ",                     # whitespace then EOF
        b"P5 12",                   # truncated before height
        b"P5 12 8",                 # truncated before maxval
        b"P5 ab 8 255 ",            # non-numeric width
        b"P5 12 -8 255 ",           # '-8' is non-digit → refusal, not int()
        b"P2 2 1 9\nx y",           # ascii raster with non-numeric samples
        b"P5 # only a comment",     # comment swallows the header
    ],
)
def test_pnm_malformed_header_refuses(payload):
    from wurzel_spark.operators.multimodal import _pnm_pixels

    with pytest.raises(NotImplementedError):
        _pnm_pixels(payload)


def test_pnm_valid_still_decodes():
    from wurzel_spark.operators.multimodal import _pnm_pixels

    px = _pnm_pixels(b"P5 2 2 255 " + bytes([0, 64, 128, 255]))
    assert px.shape == (2, 2, 3)
    assert px[1, 1, 0] == 255 and px[0, 1, 2] == 64


# --------------------------------------------------------- finding 4


def _duck_embeddings(rows):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[], label INT)"
    )
    con.executemany("INSERT INTO embeddings VALUES (?,?,?)", rows)
    return con


def test_quantizer_clamp_is_int32_symmetric(spark):
    """Components past ±2^31/QSCALE must saturate to the int32 range
    [−2^31, 2^31−1] — cross-engine equality on norm_outliers with
    saturating values planted (QSCALE = 2^20 ⇒ |x| ≥ 2048 saturates)."""
    from wurzel_spark.operators.linalg import embedding_norm_outliers

    rows = [(i, [1.0, 2.0, float(i % 3)], 0) for i in range(8)]
    rows.append((100, [5000.0, -5000.0, 1.0], 0))   # both rails
    rows.append((101, [2047.9, -2048.0, 0.5], 0))   # straddles the edge
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = [tuple(r) for r in embedding_norm_outliers(df).collect()]
    con = _duck_embeddings(rows)
    want = [
        tuple(r)
        for r in con.execute(e.oracle_sql()["embedding_norm_outliers"]).fetchall()
    ]
    assert got == want


def test_fisher_and_anisotropy_clamp_cross_engine(spark):
    """FISHER_QSCALE = 2^10 ⇒ |x| ≥ 2^21 saturates: plant ±3e6
    components and assert fisher + anisotropy stay bit-equal."""
    from wurzel_spark.operators.linalg import (
        CENTROID_DIM,
        embedding_anisotropy,
        fisher_separability_stats,
    )

    def vec(seed, hot):
        v = [((seed * (d + 3)) % 7 - 3) * 0.25 for d in range(CENTROID_DIM)]
        v[seed % CENTROID_DIM] = hot
        return v

    # only two saturating components in the whole fixture — enough to
    # cross the ±2^31 rail (2.2e6·2^10 > 2^31) without pushing the
    # operators' downstream int64 scatter sums out of their documented
    # arithmetic domain (module docstring bound)
    rows = [
        (1, vec(1, 2.2e6), 0),
        (2, vec(2, -2.5e6), 1),
        (3, vec(3, 1.5), 1),
        (4, vec(4, 1.0), 1),
        (5, vec(5, -2.0), 0),
        (6, vec(6, 0.5), 0),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    sql = e.oracle_sql()

    got_f = [tuple(r) for r in fisher_separability_stats(df).collect()]
    want_f = [
        tuple(r)
        for r in _duck_embeddings(rows)
        .execute(sql["fisher_separability_stats"])
        .fetchall()
    ]
    assert got_f == want_f

    got_a = [tuple(r) for r in embedding_anisotropy(df).collect()]
    want_a = [
        tuple(r)
        for r in _duck_embeddings(rows).execute(sql["embedding_anisotropy"]).fetchall()
    ]
    assert got_a == want_a


def test_clamp_literal_is_int32_max():
    """Pin the contract: no quantizer clamp site uses 2^31 as the
    positive bound anymore (source-level guard against regression)."""
    import inspect

    import wurzel_spark.operators.linalg as linalg

    src = inspect.getsource(linalg)
    assert "2147483648), -2147483648)" not in src
    assert "2147483647), -2147483648)" in src
