"""Physical-plan inspection helpers — the ".explain and iterate" discipline
as code.

Every operator in this engine is expected to produce the plan you'd *want*
at 100 TB, not just a correct one: filters pushed into the parquet scan,
scans pruned to the referenced columns, small dimensions broadcast. These
helpers turn those expectations into assertions so tests lock them in
(tests/test_plans.py) and regressions show up as failures, not as silent
2× slowdowns.

The reference has no optimizer (SURVEY §4) — this module is the Spark-first
replacement for "trust me, it's fast": plan properties are part of the
operator's contract.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def plan_report(df: DataFrame) -> dict:
    """Summary of scale-relevant plan properties."""
    s = plan_text(df)
    return {
        "pushed_filters": re.findall(r"PushedFilters: \[([^\]]*)\]", s),
        "read_schemas": re.findall(r"ReadSchema: struct<([^>]*)>", s),
        "broadcast_hash_joins": s.count("BroadcastHashJoin"),
        "sort_merge_joins": s.count("SortMergeJoin"),
        "exchanges": s.count("(\n") and s.count("Exchange"),
        "python_evals": s.count("ArrowEvalPython") + s.count("BatchEvalPython"),
    }


def assert_pushed_filter(df: DataFrame, column: str) -> None:
    """Assert some predicate on ``column`` reached a parquet scan."""
    pushed = " ".join(plan_report(df)["pushed_filters"])
    assert column in pushed, f"no pushed filter on {column}; got: {pushed!r}"


def assert_read_schema_only(df: DataFrame, table_cols: set[str], allowed: set[str]) -> None:
    """Assert the scan of a table reads no column outside ``allowed``
    (column-pruning check). ``table_cols`` identifies which ReadSchema
    belongs to the table (its full column set)."""
    for schema in plan_report(df)["read_schemas"]:
        cols = {c.split(":")[0] for c in schema.split(",") if c}
        if cols <= table_cols and cols & table_cols:
            extra = cols - allowed
            assert not extra, f"scan reads unneeded columns: {extra}"


def broadcast_join_count(df: DataFrame) -> int:
    return plan_report(df)["broadcast_hash_joins"]


def assert_no_sort_merge_join(df: DataFrame) -> None:
    """At test scale every dimension fits the broadcast threshold; a
    SortMergeJoin appearing means a broadcast hint or stats went missing."""
    n = plan_report(df)["sort_merge_joins"]
    assert n == 0, f"plan contains {n} SortMergeJoin(s) at broadcastable scale"


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters pushed to a partitioned scan — the partition-pruning
    proof (a date-partitioned 100 TB table must read only matching
    directories, not list-then-filter)."""
    return re.findall(r"PartitionFilters: \[([^\]]*)\]", plan_text(df))
