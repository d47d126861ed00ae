"""Round-9 third-wave operator tests (continuation session)."""

from __future__ import annotations

import datetime as dt


def _events(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def _write_events(spark, rows, tmp_path):
    _events(spark, rows).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    return str(tmp_path)


def _dispersion_ref(counts_by_hour: dict[int, int]):
    """Python mirror of the exact-integer Fano formula."""
    h_lo, h_hi = min(counts_by_hour), max(counts_by_hour)
    h = h_hi - h_lo + 1
    t = sum(counts_by_hour.values())
    s2 = sum(c * c for c in counts_by_hour.values())
    if h <= 1:
        return h, t, None
    return h, t, (1000 * (h * s2 - t * t)) // ((h - 1) * t)


# --------------------------------------------- burstiness (Fano factor)


def test_burstiness_extremes_and_reference(spark, tmp_path):
    """Planted burst / metered / near-Poisson / single-hour series match
    the literal integer formula and land in the right bands."""
    from wurzel_spark.queries.events import event_burstiness_stats

    series = {
        # 99 events hour 0, 1 event hour 9 — the canonical burst
        "burst": {0: 99, 9: 1},
        # perfectly metered: variance 0
        "metered": {h: 5 for h in range(8)},
        # mean 5, variance ≈ 5.8: inside the Poisson band
        "wobble": {0: 1, 1: 8, 2: 3, 3: 7, 4: 2, 5: 9, 6: 5, 7: 5},
        # one active hour: no variance defined
        "single": {3: 7},
    }
    rows, eid = [], 0
    for et, by_hour in series.items():
        for h, c in by_hour.items():
            for _ in range(c):
                eid += 1
                rows.append((eid, dt.datetime(2024, 1, 1, h), 1, et, 1.0, None))
    sf = _write_events(spark, rows, tmp_path)
    out = {r["event_type"]: r for r in event_burstiness_stats(spark, sf).collect()}

    for et, by_hour in series.items():
        h, t, d = _dispersion_ref(by_hour)
        r = out[et]
        assert r["span_hours"] == h, et
        assert r["n_active_hours"] == len(by_hour), et
        assert r["n_events"] == t, et
        assert r["dispersion_permille"] == d, (et, r["dispersion_permille"], d)

    assert out["burst"]["label"] == "bursty"
    assert out["burst"]["dispersion_permille"] > 2000
    assert out["metered"]["label"] == "regular"
    assert out["metered"]["dispersion_permille"] == 0
    assert out["wobble"]["label"] == "poisson-like"
    assert out["single"]["label"] == "single-hour"
    assert out["single"]["dispersion_permille"] is None


def test_burstiness_silent_hours_are_zeros(spark, tmp_path):
    """A silent hour inside the span is a real zero: [3, 0, 3] disperses
    more than [3, 3] would — the dense-span denominator is the point."""
    from wurzel_spark.queries.events import event_burstiness_stats

    rows = []
    for i in range(3):
        rows.append((i, dt.datetime(2024, 1, 1, 0), 1, "gapped", 1.0, None))
    for i in range(3, 6):
        rows.append((i, dt.datetime(2024, 1, 1, 2), 1, "gapped", 1.0, None))
    sf = _write_events(spark, rows, tmp_path)
    r = event_burstiness_stats(spark, sf).collect()[0]
    h, t, d = _dispersion_ref({0: 3, 2: 3})
    assert (r["span_hours"], r["n_active_hours"], r["n_events"]) == (3, 2, 6)
    assert r["dispersion_permille"] == d == 1500


def test_burstiness_matches_oracle_on_fixture(spark, tmp_path):
    """Cross-engine: the registered SQL twin agrees row-for-row on a
    hand-planted fixture including the single-hour NULL."""
    import duckdb
    from wurzel_spark.queries.events import EVENT_BURSTINESS_SQL, event_burstiness_stats

    rows, eid = [], 0
    for et, by_hour in {"a": {0: 9, 5: 1}, "b": {2: 4}}.items():
        for h, c in by_hour.items():
            for _ in range(c):
                eid += 1
                rows.append((eid, dt.datetime(2024, 3, 1, h), 1, et, 1.0, None))
    sf = _write_events(spark, rows, tmp_path)
    got = [tuple(r) for r in event_burstiness_stats(spark, sf).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM parquet_scan('{sf}/events.parquet/*.parquet')"
    )
    want = [tuple(r) for r in con.execute(EVENT_BURSTINESS_SQL).fetchall()]
    assert got == want


# --------------------------------------------- Theil-Sen robust slope


def _sen_ref(counts_by_hour: dict[int, int]):
    """Python mirror: all pairwise quantized slopes, rank quantiles at
    integer-ceiling ranks."""
    hs = sorted(counts_by_hour)
    slopes = []
    for i, h1 in enumerate(hs):
        for h2 in hs[i + 1:]:
            dc = counts_by_hour[h2] - counts_by_hour[h1]
            dx = h2 - h1
            q = (1000 * dc) // dx if dc >= 0 else -((1000 * -dc) // dx)
            slopes.append(q)
    slopes.sort()
    n = len(slopes)

    def at(p):
        return slopes[(p * n + 999) // 1000 - 1]

    return n, at(500), at(100), at(900)


def test_theil_sen_linear_series_is_exact(spark, tmp_path):
    """A perfectly linear series has EVERY pairwise slope equal to the
    true slope — median, p10 and p90 all pin to 1000·k."""
    from wurzel_spark.queries.events import event_theil_sen_trend

    rows, eid = [], 0
    for h in range(8):
        for _ in range(3 + 2 * h):  # slope +2/hour
            eid += 1
            rows.append((eid, dt.datetime(2024, 1, 1, h), 1, "lin", 1.0, None))
    sf = _write_events(spark, rows, tmp_path)
    r = event_theil_sen_trend(spark, sf).collect()[0]
    assert r["n_pairs"] == 28
    assert r["sen_slope_q"] == r["slope_p10_q"] == r["slope_p90_q"] == 2000


def test_theil_sen_outlier_immune_and_matches_reference(spark, tmp_path):
    """One wild hour barely moves the Sen slope (the point of the
    estimator) and every emitted number equals the literal pairwise
    Python mirror."""
    from wurzel_spark.queries.events import event_theil_sen_trend

    series = {
        # slope +1/hour with one 100-event outlier at hour 3
        "outlier": {0: 5, 1: 6, 2: 7, 3: 100, 4: 9, 5: 10, 6: 11, 7: 12},
        # falling series with a gap (true epoch distance matters: the
        # 14->8 pair spans 3 hours -> slope -2000)
        "falling": {0: 14, 3: 8, 4: 6, 6: 2},
    }
    rows, eid = [], 0
    for et, by_hour in series.items():
        for h, c in by_hour.items():
            for _ in range(c):
                eid += 1
                rows.append((eid, dt.datetime(2024, 1, 1, h), 1, et, 1.0, None))
    sf = _write_events(spark, rows, tmp_path)
    out = {r["event_type"]: r for r in event_theil_sen_trend(spark, sf).collect()}
    for et, by_hour in series.items():
        n, med, p10, p90 = _sen_ref(by_hour)
        r = out[et]
        assert r["n_pairs"] == n, et
        assert (r["sen_slope_q"], r["slope_p10_q"], r["slope_p90_q"]) == (
            med,
            p10,
            p90,
        ), et
    # outlier immunity: median slope stays at ~+1/hour despite hour 3
    assert 900 <= out["outlier"]["sen_slope_q"] <= 1300
    assert out["falling"]["sen_slope_q"] == -2000
