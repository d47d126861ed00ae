"""event_hour_anomalies — planted-spike fixture tests (the registered
query's oracle pins cross-engine equality; these pin discrimination)."""

import datetime as dt

from wurzel_spark.queries.events import event_hour_anomalies


def _write_events(spark, tmp_path, counts, event_type="click"):
    """counts[i] events in hour i of 2026-01-01, single type."""
    rows = []
    eid = 0
    for h, c in enumerate(counts):
        base = dt.datetime(2026, 1, 1, h, 0, 0)
        for k in range(c):
            rows.append((eid, base + dt.timedelta(seconds=k), eid % 7, event_type, 1.0, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_spike_flagged_steady_hours_not(spark, tmp_path):
    # 11 steady hours of 10 events, one spike of 100:
    # median = 10, deviations = [0]*11 + [90], MAD = 0 at rank 6 → any
    # nonzero deviation trips the 3*MAD gate; only the spike deviates
    sf = _write_events(spark, tmp_path, [10] * 11 + [100])
    out = event_hour_anomalies(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_events"] == 100
    assert r["median_events"] == 10
    assert r["mad_events"] == 0
    assert r["hour"].hour == 11


def test_noisy_but_bounded_series_quiet(spark, tmp_path):
    # cycle 9/10/11/12: median (rank-ceil of 12) = 10, deviations
    # 1,0,1,2 per cycle → MAD = 1 (rank 6 of sorted devs); max deviation
    # 2 ≤ 3·MAD, so a bounded-noise series raises nothing
    sf = _write_events(spark, tmp_path, [9, 10, 11, 12] * 3)
    out = event_hour_anomalies(spark, sf).collect()
    assert out == []
