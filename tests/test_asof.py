"""As-of join: inclusive bound, tie-break, unmatched-row semantics."""

import datetime as dt

from pyspark.sql import functions as F

from wurzel_spark.operators.asof import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_asof_semantics(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-10T00:00:00"), "probe_a"),   # after both refs
            (1, _ts("2024-01-05T00:00:00"), "probe_b"),   # exactly at ref2 -> inclusive
            (1, _ts("2024-01-01T00:00:00"), "probe_c"),   # before all refs -> unmatched
            (2, _ts("2024-01-10T00:00:00"), "probe_d"),   # key with no refs -> unmatched
        ],
        ["k", "t", "tag"],
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-03T00:00:00"), 100, "early"),
            (1, _ts("2024-01-05T00:00:00"), 200, "tie_low"),
            (1, _ts("2024-01-05T00:00:00"), 300, "tie_high"),  # tiebreak: greatest id wins
        ],
        ["k", "rt", "rid", "rname"],
    )
    out = {
        r["tag"]: (r["asof_rid"], r["asof_rname"])
        for r in asof_join(
            left, right, "k", "t", "rt", value_cols=["rid", "rname"], tiebreak="rid"
        ).collect()
    }
    assert out["probe_a"] == (300, "tie_high")   # latest ref overall
    assert out["probe_b"] == (300, "tie_high")   # inclusive <= and max-tiebreak
    assert out["probe_c"] == (None, None)        # left join keeps unmatched
    assert out["probe_d"] == (None, None)

    inner = asof_join(
        left, right, "k", "t", "rt", value_cols=["rid", "rname"], tiebreak="rid", how="inner"
    )
    assert {r["tag"] for r in inner.collect()} == {"probe_a", "probe_b"}


def test_asof_single_shuffle_no_blowup(spark):
    """The plan must contain no join operator at all — the as-of is a
    union + window, so its cost is one shuffle regardless of how many
    reference rows precede each probe."""
    from wurzel_spark.plans.inspect import plan_text

    left = spark.range(100).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_millis(F.col("id") * 1000).alias("t"),
    )
    right = spark.range(1000).select(
        (F.col("id") % 5).alias("k"),
        F.timestamp_millis(F.col("id") * 100).alias("rt"),
        F.col("id").alias("rid"),
    )
    out = asof_join(left, right, "k", "t", "rt", value_cols=["rid"], tiebreak="rid")
    plan = plan_text(out)
    assert "Join" not in plan
    assert out.count() == 100
