"""Shared gated-shortcut plumbing used across operator modules.

Several operators pin a SMALL reused intermediate with
``localCheckpoint`` only when the input is provably tiny (DSIR's
token-grain stream, rfm's customer-grain frame). The gate is a
metadata-only Catalyst size estimate compared against a fixed byte
budget; both the helper and the budget live here so the consumers
(operators/textstats.py, queries/relational.py) share one definition
instead of importing each other's private names.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Byte budget for gated checkpoint shortcuts. Below this input size the
# pin is cheap and saves a second scan; above it (or when the size is
# unknown) the two-scan plan runs instead — same gated-shortcut
# convention as dedup._DRIVER_UNION_FIND_MAX_EDGES and the kmeans
# driver gate (similarity.py).
CHECKPOINT_MAX_INPUT_BYTES = 1 << 28  # 256 MiB


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's sizeInBytes estimate for the frame's optimized plan —
    metadata-only (parquet footer / relation stats), no job runs. None
    when the estimate is unavailable; callers must treat None as TOO BIG
    (the conservative path)."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None
