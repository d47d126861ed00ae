"""Round-10 plan guard: the bounded-grain unpartitioned-window invariant.

VERDICT r9 ("What's wrong" #3): ~20 registered queries run a global
(unpartitioned) Window — all on histogram/rollup-grain inputs by the
builder's convention, so they are safe, but nothing ASSERTED the bound.
One refactor moving a global window from histogram grain to event grain
would be a silent scale-killer (all rows to one partition).

This guard walks the PHYSICAL plan of EVERY registered query and fails
unless each unpartitioned Window/WindowGroupLimit sits above a node
that provably bounds its input cardinality:

  - an aggregate (HashAggregate / SortAggregate / ObjectHashAggregate):
    the window runs on group-grain, which every such query keeps at
    histogram/rollup size (distinct durations, score bins, hour
    buckets, …), or
  - a WindowGroupLimit / Limit: rows already pruned to a constant, or
  - a leaf scan of a BOUNDED dimension table (region: 5, nation: 25).

Queries with none of those below a global window are exactly the
event/doc-grain regressions the invariant exists to catch.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

SF_DIR = "/root/testdata/sf0.001"

# physical nodes that bound the cardinality flowing up to a window
_BOUNDING = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "WindowGroupLimit",
    "GlobalLimit",
    "LocalLimit",
    "TakeOrderedAndProject",
)
# leaf tables that are bounded by the data model itself
_BOUNDED_TABLES = ("region", "nation")


def _children(jnode):
    out = []
    name = jnode.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        out.append(jnode.initialPlan())
        return out
    ch = jnode.children()
    for i in range(ch.size()):
        out.append(ch.apply(i))
    # scalar/IN subqueries carry their own plans — a global window can
    # hide there just as well as in the main tree
    try:
        sq = jnode.subqueries()
        for i in range(sq.size()):
            out.append(sq.apply(i))
    except Exception:
        pass
    return out


def _iter_nodes(jnode):
    stack = [jnode]
    while stack:
        n = stack.pop()
        yield n
        stack.extend(_children(n))


def _subtree_is_bounded(jnode) -> bool:
    for n in _iter_nodes(jnode):
        name = n.getClass().getSimpleName()
        if any(b in name for b in _BOUNDING):
            return True
        if "Scan" in name or "FileSourceScan" in name:
            s = n.simpleString(200)
            if any(t in s for t in _BOUNDED_TABLES):
                continue  # bounded leaf — keep scanning siblings
    return False


def _unbounded_global_windows(df):
    """(node simpleString) for every unpartitioned window whose subtree
    has no bounding node."""
    jplan = df._jdf.queryExecution().executedPlan()
    bad = []
    for n in _iter_nodes(jplan):
        name = n.getClass().getSimpleName()
        if name in ("WindowExec", "WindowInPandasExec", "WindowGroupLimitExec"):
            try:
                unpart = n.partitionSpec().isEmpty()
            except Exception:
                continue
            if not unpart:
                continue
            kids = _children(n)
            if not kids:
                bad.append(n.simpleString(300))
                continue
            if not any(_subtree_is_bounded(k) for k in kids):
                # a global window directly over an unbounded grain:
                # unless EVERY leaf below is a bounded dim table
                leaves = [
                    x
                    for x in _iter_nodes(kids[0])
                    if not _children(x)
                ]
                if all(
                    any(t in x.simpleString(300) for t in _BOUNDED_TABLES)
                    for x in leaves
                    if "Scan" in x.getClass().getSimpleName()
                ) and any(
                    "Scan" in x.getClass().getSimpleName() for x in leaves
                ):
                    continue
                bad.append(n.simpleString(300))
    return bad


@pytest.fixture(scope="module")
def registry():
    return entry.queries()


def test_every_registered_query_bounds_global_windows(spark, registered_dfs):
    """All 286 registered queries: every unpartitioned Window sits above
    an aggregate / group-limit / bounded-dim subtree. (Plans come from
    the shared session-scoped build — see conftest.registered_dfs.)"""
    failures = {}
    for name, df in registered_dfs.items():
        if isinstance(df, Exception):  # plan construction itself must not fail
            failures[name] = f"plan build failed: {df}"
            continue
        bad = _unbounded_global_windows(df)
        if bad:
            failures[name] = bad
    assert not failures, (
        f"{len(failures)} queries run a global window over unbounded "
        f"grain: {failures}"
    )


# ------------------- round-11: RUNTIME row bound behind the plan guard
#
# The guard above proves a bounding NODE exists below each global
# window; this asserts the bounded input is actually small at sf0.1 —
# defense against a rollup whose grain silently explodes (e.g. a
# value-domain histogram over a continuous column), which would satisfy
# the structural guard while still funneling fact-grain rows into one
# partition (VERDICT r10 Next #7).

SF_DIR_BIG = "/root/testdata/sf0.1"

# Every registered query whose physical plan contains an unpartitioned
# Window (discovered by the test below — a new global-window query must
# be added here consciously). rfm_segments left the list in r11: its
# customer-grain ranks (the largest input, 14 999 rows at sf0.1, and a
# grain that SCALES with the data) went two-phase bucketed. Largest
# remaining legit grain: session_duration_stats' 1 720 duration
# histogram rows.
GLOBAL_WINDOW_WHITELIST = {
    # r12: the two-phase-rank family's bucket OFFSETS moved in-plan — a
    # running sum over the fixed ≤1024-row (≤ bands·1024 for curriculum)
    # bucket-count table replaces the per-query offsets-collect driver
    # job. Grain is bounded by construction (fixed bucket count), which
    # is exactly what the runtime row bound below certifies.
    "corpus_shuffle",
    "curriculum_order",
    # r12: sequence_pack's bucket OFFSETS moved in-plan the same way,
    # via a two-LEVEL scan — the global window runs over SUPERBUCKET
    # totals (one row per 2^26 docs, aggregate-bounded; ~1 row at
    # sf0.1), replacing the bucket-totals driver collect that scaled as
    # n/8192.
    "sequence_pack",
    "sequence_pack_stats",
    # (shuffle_run_stats consumes corpus_shuffle but its run-length
    # projection lets Catalyst prune the rank off the offsets branch —
    # the walker finds no global window there)
    "training_shard_stats",
    "slo_burn_stats",
    "column_encoding_stats",
    "bot_score_stats",
    "score_lift_table",
    "user_activity_fof",
    "session_duration_stats",
    "waterfill_sample_stats",
    "tcloseness_release",
    "benford_value_audit",
    "ks_length_drift",
    "event_path_trigrams",
    "event_hour_independence",
    "file_pruning_stats",
    "purchase_attribution",
    "priority_sample",
    "token_budget_waterfill",
    "doremi_mixture_weights",
}
# Fact grains at sf0.1 start at ~60k (lineitem) — any histogram/rollup
# grain that reaches this bound is an explosion, not a rollup.
WINDOW_INPUT_ROW_BOUND = 65_536


def _exec_children(jnode):
    """Children through AQE/query-stage wrappers of an EXECUTED plan."""
    name = jnode.getClass().getSimpleName()
    if name == "AdaptiveSparkPlanExec":
        return [jnode.executedPlan()]
    if "QueryStage" in name:
        try:
            return [jnode.plan()]
        except Exception:
            pass
    out = []
    ch = jnode.children()
    for i in range(ch.size()):
        out.append(ch.apply(i))
    try:
        sq = jnode.subqueries()
        for i in range(sq.size()):
            out.append(sq.apply(i))
    except Exception:
        pass
    return out


def _iter_exec_nodes(jnode):
    stack = [jnode]
    while stack:
        n = stack.pop()
        yield n
        stack.extend(_exec_children(n))


def _window_input_rows(wnode) -> int:
    """Rows that entered a global window: the first metric-bearing node
    below it (the SinglePartition exchange's shuffleRecordsWritten, or an
    aggregate's numOutputRows). -1 when no metric node exists below
    (window directly over a checkpointed local scan — already bounded by
    what produced it)."""
    stack = _exec_children(wnode)
    while stack:
        c = stack.pop(0)
        try:
            it = c.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() in ("numOutputRows", "shuffleRecordsWritten"):
                    return int(kv._2().value())
        except Exception:
            pass
        stack = _exec_children(c) + stack
    return -1


def test_global_window_whitelist_is_exact(spark, registered_dfs):
    """The whitelist is the DISCOVERED set: a query growing (or losing)
    a global window must update it consciously. (Shared plan build —
    conftest.registered_dfs; build failures are the bounds test's job.)"""
    found = set()
    for name, df in registered_dfs.items():
        if isinstance(df, Exception):
            continue
        jplan = df._jdf.queryExecution().executedPlan()
        for n in _iter_nodes(jplan):
            if n.getClass().getSimpleName() in (
                "WindowExec",
                "WindowInPandasExec",
            ):
                try:
                    if n.partitionSpec().isEmpty():
                        found.add(name)
                except Exception:
                    pass
    assert found == GLOBAL_WINDOW_WHITELIST, (
        f"added: {sorted(found - GLOBAL_WINDOW_WHITELIST)}, "
        f"removed: {sorted(GLOBAL_WINDOW_WHITELIST - found)}"
    )


def test_global_window_inputs_bounded_at_sf01(spark, registry):
    """Execute every whitelisted query at sf0.1 and assert the ACTUAL
    row count entering each unpartitioned window stays at histogram
    grain (≤ WINDOW_INPUT_ROW_BOUND)."""
    offenders = {}
    for name in sorted(GLOBAL_WINDOW_WHITELIST):
        df = registry[name](spark, SF_DIR_BIG)
        df.collect()
        jplan = df._jdf.queryExecution().executedPlan()
        rows = []
        for n in _iter_exec_nodes(jplan):
            if n.getClass().getSimpleName() in (
                "WindowExec",
                "WindowInPandasExec",
            ):
                try:
                    if not n.partitionSpec().isEmpty():
                        continue
                except Exception:
                    continue
                rows.append(_window_input_rows(n))
        too_big = [r for r in rows if r > WINDOW_INPUT_ROW_BOUND]
        if too_big:
            offenders[name] = rows
    assert not offenders, (
        f"global windows fed more than {WINDOW_INPUT_ROW_BOUND} rows at "
        f"sf0.1: {offenders}"
    )
