"""Stateful streaming funnel via applyInPandasWithState.

Batch twin: wurzel_spark.queries.events.events_funnel (conditional-min +
ordered-conversion form). Per-user state carries (first_view_us,
first_purchase_us) across micro-batches; each batch folds its events into
the conditional minima and emits the user's updated funnel row, so a
downstream aggregation over the latest row per user reproduces the batch
funnel counts at any point in the stream.

State size is O(users seen); idle users can be reaped with a timeout when
the funnel has a business TTL (left NoTimeout here — a funnel is
all-time by definition).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FUNNEL_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("first_view_us", T.LongType(), True),
        T.StructField("first_purchase_us", T.LongType(), True),
        T.StructField("converted", T.BooleanType(), False),
    ]
)

FUNNEL_STATE_SCHEMA = T.StructType(
    [
        T.StructField("first_view_us", T.LongType(), True),
        T.StructField("first_purchase_us", T.LongType(), True),
    ]
)


def _min_or_none(prev, ts_us: pd.Series):
    if ts_us.empty:
        return prev
    m = int(ts_us.min())
    return m if prev is None else min(prev, m)


def _funnel_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    fv, fp = state.get if state.exists else (None, None)

    for pdf in pdfs:
        ts_us = pdf["ts"].astype("int64") // 1000
        fv = _min_or_none(fv, ts_us[pdf["event_type"] == "view"])
        fp = _min_or_none(fp, ts_us[pdf["event_type"] == "purchase"])

    state.update((fv, fp))
    converted = fv is not None and fp is not None and fv < fp
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "first_view_us": [fv],
            "first_purchase_us": [fp],
            "converted": [converted],
        }
    )


def funnel_stream(stream: DataFrame) -> DataFrame:
    """Per-user incremental funnel state over a stream (or a batch DF run
    through availableNow). The latest row per user matches the batch
    per-user conditional minima exactly (integer epoch-micros arithmetic).
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _funnel_group,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=FUNNEL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
