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
           "assert_pushdown", "assert_max_exchanges"]


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


def assert_max_exchanges(df: DataFrame, n: int) -> None:
    """Assert the plan shuffles at most ``n`` times (broadcasts
    excluded)."""
    got = exchange_count(df)
    if got > n:
        raise AssertionError(
            f"plan has {got} shuffle exchanges, expected <= {n}:\n"
            + plan_str(df))
