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


def _balanced_span(text: str, start: int, open_ch: str,
                   close_ch: str) -> str:
    """The body from ``start`` (just past the opener) up to the
    MATCHING closer, honouring nesting — never past the line end
    (toString() truncates long scan lines with '...', leaving the
    bracket unclosed)."""
    depth, i = 1, start
    while i < len(text) and depth:
        c = text[i]
        if c == "\n":
            return text[start:i]
        if c == open_ch:
            depth += 1
        elif c == close_ch:
            depth -= 1
        i += 1
    return text[start:i - 1] if depth == 0 else text[start:i]


def _split_top_level(body: str) -> list[str]:
    """Split on commas OUTSIDE any ()/[]/<> nesting — a naive split
    breaks on In(a, [1,2,3]), decimal(12,2) and array<int> (review
    r9: both helpers silently truncated at the first nested closer,
    making pruning/pushdown assertions pass or fail falsely)."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch in "([<":
            depth += 1
        elif ch in ")]>":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def pushed_filters(df: DataFrame) -> list[str]:
    """Every non-empty PushedFilters entry across the plan's scans."""
    out: list[str] = []
    plan = plan_str(df)
    for m in re.finditer(r"PushedFilters: \[", plan):
        body = _balanced_span(plan, m.end(), "[", "]").strip()
        if body:
            out.extend(_split_top_level(body))
    return out


def read_schema(df: DataFrame) -> list[str]:
    """Column names each scan actually reads (ReadSchema entries)."""
    cols: list[str] = []
    plan = plan_str(df)
    for m in re.finditer(r"ReadSchema: struct<", plan):
        body = _balanced_span(plan, m.end(), "<", ">")
        cols.extend(p.split(":")[0].strip()
                    for p in _split_top_level(body) if p.strip())
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
