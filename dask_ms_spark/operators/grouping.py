"""Grouping / partitioning operators (reference §2.3 G1-G4) and the
TAQL grouping aggregates (§2.6).

The reference's "GROUP BY" is a TAQL metadata query —
``SELECT g..., GAGGR(idx), GROWID(), GCOUNT(), GROWID()[0] FROM $1
GROUPBY g...`` (daskms/ordering.py:165-192, builders
daskms/query.py:18-30) — whose result drives per-group chunked reads.

Spark-first: the same metadata is ONE aggregation over only the group +
index columns (column-pruned scan, map-side partial aggregation), and
the per-group data never materialises eagerly (see
``dataset.partition_datasets``).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..types import ROWID

__all__ = ["group_metadata", "update_write", "column_update"]


def group_metadata(df: DataFrame, group_cols: Iterable[str],
                   index_cols: Iterable[str] = (),
                   rowid: str | None = None) -> DataFrame:
    """The TAQL grouping query as a DataFrame (G1).

    Aggregate mapping (daskms/ordering.py:169-175):
    * ``GCOUNT()``    -> ``count(*)            AS group_count``
    * ``GROWID()[0]`` -> ``min(ROWID)          AS exemplar_rowid``
    * ``GAGGR(col)``  -> ``sort_array(collect_list(col)) AS col_values``
      (sorted for determinism; the reference's per-group arrays come
      back in ROWID order).
    """
    group_cols = list(group_cols)
    aggs = [F.count(F.lit(1)).alias("group_count")]
    if rowid and rowid in df.columns:
        aggs.append(F.min(rowid).alias("exemplar_rowid"))
    for c in index_cols:
        aggs.append(F.sort_array(F.collect_list(c)).alias(f"{c}_values"))
    return df.groupBy(*group_cols).agg(*aggs)


def update_write(spark_read, base: DataFrame, updates: DataFrame,
                 columns: Iterable[str], key: str = ROWID) -> DataFrame:
    """Column-granular update (reference S7 ``xds_to_table`` update
    semantics, daskms/writes.py:493-566): produce the post-update table
    as ``base`` with ``columns`` replaced by ``updates`` values where
    keys match.

    The reference mutates CASA tables in place under a write lock; on
    an immutable columnar store this is read-merge-write: a left join
    on the carried key + ``coalesce`` — identical plan shape to
    fragments overlay (operators/overlay.py), which is the lazy
    (non-materialised) form of the same operation.
    """
    from .overlay import overlay

    cols = [key] + [c for c in columns if c != key]
    return overlay(base, updates.select(*cols), key=key)


def column_update(base: DataFrame, key_col: str, target: str,
                  mapping: DataFrame, map_key: str, map_value: str) -> DataFrame:
    """Replace ``target`` values via a (small) mapping table — the
    broadcast-join form of per-column ``putcol`` updates
    (daskms/writes.py:33-134)."""
    m = (mapping.select(F.col(map_key).alias(key_col),
                        F.col(map_value).alias("__new_value")))
    return (base.join(F.broadcast(m), on=key_col, how="left")
                .withColumn(target, F.coalesce("__new_value", target))
                .drop("__new_value"))
