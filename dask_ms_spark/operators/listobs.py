"""Observation summary — the ``listobs`` staple every MS user runs
first (CASA's listobs task; the reference feeds it the same grouped
reads, daskms/dask_ms.py:128-294).

Two declarative aggregations over the main table:

* :func:`scan_summary` — one row per (scan, field): time range,
  integration count, distinct-baseline count, visibility volume.
* :func:`ms_summary` — the one-row header: total rows, time span,
  scans, fields, antennas, baselines.

Scale shape: plain keyed aggregates with map-side combine; distinct
baselines per scan ride ``approx/exact count_distinct`` over
(antenna1, antenna2) pairs packed into one long — an 8-byte shuffle
key, never a struct.  No windows, no joins, no driver round trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["scan_summary", "ms_summary"]


def _baseline_key(ant1, ant2):
    # pack the (unordered) baseline into one long: 8-byte shuffle key
    lo, hi = F.least(ant1, ant2), F.greatest(ant1, ant2)
    return (hi.cast("long") * F.lit(65536) + lo.cast("long"))


def scan_summary(df: DataFrame, scan_col: str = "SCAN_NUMBER",
                 field_col: str = "FIELD_ID",
                 time_col: str = "TIME",
                 ant1_col: str = "ANTENNA1",
                 ant2_col: str = "ANTENNA2",
                 data_col: str | None = None) -> DataFrame:
    """Per-(scan, field) summary rows: ``time_min``, ``time_max``,
    ``n_rows``, ``n_baselines`` (distinct unordered pairs), and —
    when ``data_col`` is given — ``n_vis`` (total cells)."""
    aggs = [F.min(F.col(time_col)).alias("time_min"),
            F.max(F.col(time_col)).alias("time_max"),
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(_baseline_key(
                F.col(ant1_col), F.col(ant2_col))).alias("n_baselines")]
    if data_col is not None:
        aggs.append(F.sum(F.size(data_col).cast("long"))
                    .alias("n_vis"))
    return (df.groupBy(F.col(scan_col).alias("scan"),
                       F.col(field_col).alias("field"))
            .agg(*aggs))


def ms_summary(df: DataFrame, scan_col: str = "SCAN_NUMBER",
               field_col: str = "FIELD_ID",
               time_col: str = "TIME",
               ant1_col: str = "ANTENNA1",
               ant2_col: str = "ANTENNA2") -> DataFrame:
    """The one-row listobs header: total rows, time span (seconds),
    distinct scans / fields / antennas / baselines."""
    ants = (df.select(F.col(ant1_col).alias("a"))
            .unionByName(df.select(F.col(ant2_col).alias("a"))))
    n_ants = ants.agg(F.count_distinct("a").alias("n_antennas"))
    head = df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.max(F.col(time_col)) - F.min(F.col(time_col)))
        .alias("time_span"),
        F.count_distinct(F.col(scan_col)).alias("n_scans"),
        F.count_distinct(F.col(field_col)).alias("n_fields"),
        F.count_distinct(_baseline_key(
            F.col(ant1_col), F.col(ant2_col))).alias("n_baselines"))
    return head.crossJoin(F.broadcast(n_ants))
