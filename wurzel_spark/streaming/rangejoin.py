"""Stream-stream time-interval join: the streaming twin of the bucketed
batch range join (operators/rangejoin.py).

Structured Streaming executes this natively — no foreachBatch bridge:
both sides carry watermarks and the join condition bounds event-time
distance, so the state store can expire rows once the watermark passes
their interval (state is O(watermark-width × rate), not unbounded). This
is the one streaming operator in the repo where Spark's own engine does
the cross-batch matching: a click arriving in batch 7 still joins a
purchase from batch 3 if their timestamps are within the interval —
foreachBatch twins (which see one batch at a time) cannot express that.

At scale the joined pairs feed a downstream windowed aggregation or
sink; the parity test aggregates the sink in batch (a purchase-id count
without an event-time window would be unbounded state in append mode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_stream(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    lower_s: int,
    upper_s: int,
    watermark: str = "2 hours",
) -> DataFrame:
    """Pairs (left, right) with ``right_time ∈ [left_time+lower_s,
    left_time+upper_s)`` — same semantics as the batch
    ``range_join_time``. Both inputs are streams with DISJOINT column
    names except ``key``; watermarks bound join state retention."""
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark)
    cond = (
        (lw[key] == rw[key])
        & (
            rw[right_time]
            >= lw[left_time] + F.expr(f"INTERVAL {lower_s} SECONDS")
        )
        & (rw[right_time] < lw[left_time] + F.expr(f"INTERVAL {upper_s} SECONDS"))
    )
    return lw.join(rw, cond, "inner").drop(rw[key])
