"""Subtable joins as first-class operators (reference §2.5).

The reference has NO join operator: star-schema lookups
(main -> DATA_DESCRIPTION -> SPECTRAL_WINDOW / POLARIZATION, FIELD,
ANTENNA) are manual attribute indexing over per-partition datasets
(examples/ms_subtable_join.py:36-69; katdal facade numpy indexing,
daskms/experimental/katdal/msv2_facade.py:140-175).

Spark-first: broadcast hash joins.  Dimension subtables are tiny
(14-64 rows in the reference fixtures, daskms/conftest.py:189-235), so
every lookup is a map-side join with zero shuffle of the fact table —
this is where the Spark design strictly exceeds the reference.
"""

from __future__ import annotations

from typing import Iterable, Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["broadcast_lookup", "star_join", "semi_filter", "anti_filter"]


def broadcast_lookup(fact: DataFrame, dim: DataFrame, on: str | Sequence[str],
                     how: str = "inner", prefix: str | None = None) -> DataFrame:
    """``fact ⋈ broadcast(dim)`` — the reference's
    ``ddid_ds[ms_ds.attrs["DATA_DESC_ID"]]`` lookup idiom
    (examples/ms_subtable_join.py:59) as a map-side hash join.

    ``prefix`` renames dim payload columns to avoid collisions, the
    analogue of the reference assigning subtable arrays onto the main
    dataset under new names (examples/ms_subtable_join.py:63-69).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if prefix:
        for c in dim.columns:
            if c not in keys:
                dim = dim.withColumnRenamed(c, f"{prefix}{c}")
    return fact.join(F.broadcast(dim), on=keys, how=how)


def star_join(fact: DataFrame,
              dims: Mapping[str, tuple[DataFrame, str | Sequence[str]]],
              how: str = "inner") -> DataFrame:
    """Chained broadcast joins over a star schema: the reference's
    ddid -> spw/pol chained lookups (examples/ms_subtable_join.py:60-61).

    ``dims`` maps a prefix to ``(dim_df, join_keys)``.  All joins are
    broadcast; the fact table never shuffles.
    """
    out = fact
    for prefix, (dim, on) in dims.items():
        out = broadcast_lookup(out, dim, on, how=how, prefix=f"{prefix}_")
    return out


def semi_filter(fact: DataFrame, dim: DataFrame,
                on: str | Sequence[str]) -> DataFrame:
    """Keep fact rows with a dimension match (left_semi) — absent in the
    reference, native in Spark (SURVEY §2.5)."""
    keys = [on] if isinstance(on, str) else list(on)
    return fact.join(F.broadcast(dim), on=keys, how="left_semi")


def anti_filter(fact: DataFrame, dim: DataFrame,
                on: str | Sequence[str]) -> DataFrame:
    """Drop fact rows with a dimension match (left_anti)."""
    keys = [on] if isinstance(on, str) else list(on)
    return fact.join(F.broadcast(dim), on=keys, how="left_anti")
