"""Physical-plan inspection helpers.

The reference asserts its "plans" as golden TAQL strings
(daskms/tests/test_ordering.py:32-117); the Spark-first analogue is
asserting shapes of the Catalyst physical plan: did the predicate reach
the scan (PushedFilters), did the scan prune columns (ReadSchema), did
the dimension side broadcast, did a bucketed join avoid its Exchange.
These helpers centralise the string-scraping so tests and notebooks
assert plan properties instead of trusting them — the habit that keeps
a 100 TB plan honest.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = ["plan_str", "pushed_filters", "read_schema", "exchange_count",
           "has_broadcast_hash_join", "has_sort_merge_join",
           "assert_pushdown", "assert_max_exchanges",
           "unpartitioned_windows_in", "unpartitioned_window_count",
           "assert_no_unpartitioned_window"]


def plan_str(df: DataFrame) -> str:
    """The executed (physical) plan as text, pre-AQE final re-plan."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every non-empty PushedFilters entry across the plan's scans."""
    out: list[str] = []
    # toString() truncates long scan lines ("...") — don't require the
    # closing bracket
    for m in re.finditer(r"PushedFilters: \[(.*?)(?:\]|\.\.\.|\n)",
                         plan_str(df)):
        body = m.group(1).strip()
        if body:
            # split on filter boundaries, not the commas inside
            # LessThan(col, val)
            out.extend(s.strip() for s in
                       re.split(r"(?<=\)),\s*", body) if s.strip())
    return out


def read_schema(df: DataFrame) -> list[str]:
    """Column names each scan actually reads (ReadSchema entries)."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)(?:>|\.\.\.|\n)",
                         plan_str(df)):
        cols.extend(p.split(":")[0].strip()
                    for p in m.group(1).split(",") if p.strip())
    return cols


def exchange_count(df: DataFrame, include_broadcast: bool = False) -> int:
    """Number of shuffle Exchange operators in the plan.  Broadcast
    exchanges move only the small side and are excluded by default —
    the expensive thing to count is full-data shuffles."""
    plan = plan_str(df)
    shuffles = len(re.findall(r"\bExchange (hash|range|RoundRobin|Single)",
                              plan))
    if include_broadcast:
        shuffles += plan.count("BroadcastExchange")
    return shuffles


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_str(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in plan_str(df)


def assert_pushdown(df: DataFrame, *columns: str) -> None:
    """Assert every named column appears in some pushed filter."""
    pushed = " ".join(pushed_filters(df))
    missing = [c for c in columns if c not in pushed]
    if missing:
        raise AssertionError(
            f"filters on {missing} not pushed to the scan; "
            f"pushed: {pushed or '(none)'}")


def unpartitioned_windows_in(plan: str) -> int:
    """Count Window operators fed by ``Exchange SinglePartition`` in
    a plan STRING — the every-row-through-one-task signature (the KMV
    r7 seam: a ``row_number().over(Window.orderBy(...))`` with no
    partitionBy plans a single-task global sort).  A partitioned
    window sits above a hashpartitioning exchange; the correct global
    top-k spelling (``orderBy(...).limit(k)``) plans
    TakeOrderedAndProject and has no Window node at all.

    The scan walks DOWN from each Window to the first Exchange line,
    skipping transparent operators (Sort/Project/Filter and the AQE
    shuffle-stage wrappers) so an interposed line cannot hide the
    single-partition feed; it stops at subtree boundaries (joins,
    another Window, aggregates) where the next Exchange belongs to a
    different branch — a window whose input partitioning was REUSED
    (no exchange at all) must not count a deeper unrelated one.
    Shared by ``unpartitioned_window_count`` (DataFrame form, tests)
    and tools/plan_audit.py (registry-wide audit) so the two guards
    can never drift."""
    lines = plan.splitlines()
    n = 0
    for i, line in enumerate(lines):
        if "Window" not in line:
            continue
        for look in lines[i + 1:i + 12]:
            if "Exchange SinglePartition" in look:
                n += 1
                break
            if "Exchange" in look:          # hash/range/broadcast
                break
            if any(b in look for b in ("Join", "Aggregate", "Window",
                                       "Scan", "Union")):
                break                        # different subtree
    return n


def unpartitioned_window_count(df: DataFrame) -> int:
    """DataFrame form of :func:`unpartitioned_windows_in`.  Legit
    only when the window input is provably bounded (a
    #partitions-sized offset table, a k-sized sketch state, a
    per-class groups table)."""
    return unpartitioned_windows_in(plan_str(df))


def assert_no_unpartitioned_window(df: DataFrame,
                                   allowed: int = 0) -> None:
    """Assert at most ``allowed`` unpartitioned-Window occurrences
    (``allowed`` > 0 documents windows over provably bounded inputs)."""
    got = unpartitioned_window_count(df)
    if got > allowed:
        raise AssertionError(
            f"plan has {got} unpartitioned Window(s) (allowed "
            f"{allowed}) — every input row funnels through one task:\n"
            + plan_str(df))


def assert_max_exchanges(df: DataFrame, n: int) -> None:
    """Assert the plan shuffles at most ``n`` times (broadcasts
    excluded)."""
    got = exchange_count(df)
    if got > n:
        raise AssertionError(
            f"plan has {got} shuffle exchanges, expected <= {n}:\n"
            + plan_str(df))
