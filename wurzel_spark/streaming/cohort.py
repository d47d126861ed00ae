"""Stateful streaming cohort retention via applyInPandasWithState.

Batch twin: wurzel_spark.queries.events.cohort_retention (per-user first
event week → (cohort_week, week_offset) distinct-user grid). Per-user
state carries (cohort_week, the set of week offsets seen) across
micro-batches; each batch emits the user's updated row, so the latest row
per user reproduces the batch grid at any point in the stream — the same
emit-latest contract as streaming/funnel.py.

Weeks are epoch DAYS of the Monday truncation (integer arithmetic, exactly
Spark's ``date_trunc('week', ts)``), so parity with the batch form is
bit-exact. State per user is ~(1 long + n_active_weeks longs) — bounded by
the calendar, not the event volume.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COHORT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("cohort_week_day", T.LongType(), False),
        T.StructField("week_offsets", T.ArrayType(T.LongType()), False),
    ]
)

COHORT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cohort_week_day", T.LongType(), True),
        T.StructField("week_days", T.ArrayType(T.LongType()), True),
    ]
)


def _monday_days(ts: pd.Series) -> pd.Series:
    """Timestamp → epoch days of the Monday of its ISO week (Spark's
    date_trunc('week'))."""
    days = ts.values.astype("datetime64[D]")
    dow = (days.view("int64") + 3) % 7  # 1970-01-01 was a Thursday (dow 3)
    return pd.Series((days - dow.astype("timedelta64[D]")).view("int64"))


def _cohort_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    cohort, weeks = state.get if state.exists else (None, [])
    seen = set(weeks or [])

    for pdf in pdfs:
        wd = _monday_days(pdf["ts"])
        if len(wd):
            mn = int(wd.min())
            cohort = mn if cohort is None else min(cohort, mn)
            seen.update(int(x) for x in wd)

    state.update((cohort, sorted(seen)))
    offsets = sorted((w - cohort) // 7 for w in seen)
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "cohort_week_day": [cohort],
            "week_offsets": [offsets],
        }
    )


def cohort_stream(stream: DataFrame) -> DataFrame:
    """Per-user incremental cohort state over a stream. The latest row per
    user carries (cohort week, every week-offset the user was active);
    exploding those rows and counting distinct users per cell reproduces
    the batch cohort_retention grid exactly.
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _cohort_group,
        outputStructType=COHORT_OUTPUT_SCHEMA,
        stateStructType=COHORT_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
