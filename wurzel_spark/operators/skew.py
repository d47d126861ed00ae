"""Skew-mitigation utilities for the 100 TB path.

AQE's skew-join splitting (enabled in the session factory) handles most
cases at runtime; these helpers cover the two situations AQE can't:

  - a HOT-KEY aggregation (one key owns a large fraction of all rows — a
    boilerplate document duplicated millions of times): two-phase salted
    aggregation spreads the hot key over N partial groups.
  - a skewed join against a NON-broadcastable right side: explicit salting
    replicates the right side N ways so the hot key's rows fan out.

Both are deterministic (salt = pmod(xxhash64(row-identity), n) — no
runtime randomness, so re-runs partition identically).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_column(identity: Column, n_salts: int) -> Column:
    """Deterministic salt in [0, n_salts) from any identity column."""
    return F.pmod(F.xxhash64(identity), F.lit(n_salts)).cast("int")


def salted_count(
    df: DataFrame, keys: Sequence[str], identity: str, n_salts: int = 16
) -> DataFrame:
    """Two-phase COUNT for hot-key groups: groupBy(key, salt) partials, then
    groupBy(key) of the partials. The first shuffle spreads each hot key over
    ``n_salts`` reducers; the second moves only n_salts rows per key.

    (For algebraic aggregates Spark's own partial aggregation already does
    this per-partition; salting matters when the REDUCE side is the
    bottleneck — e.g. count-distinct-style states too big for one reducer.)
    """
    salted = df.withColumn("__salt", salt_column(F.col(identity), n_salts))
    partial = salted.groupBy(*keys, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(*keys).agg(F.sum("__c").alias("n_rows"))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed-left equi-join without broadcast: left rows get a deterministic
    salt from a high-cardinality surrogate (monotonically_increasing_id over
    the partition layout — stable within a run); the right side is replicated
    ``n_salts`` ways via an exploded literal range. The join key becomes
    (key, salt), so a hot key's rows land on ``n_salts`` reducers instead
    of one.

    Cost: right side shuffled n_salts×. Use when right ≪ left but still
    above the broadcast threshold — the classic mid-size-dimension case.
    """
    salted_left = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int"),
    )
    replicated_right = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>"))
    )
    out = salted_left.join(replicated_right, [key, "__salt"], how)
    return out.drop("__salt")
