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

__all__ = ["group_metadata", "update_write", "column_update",
           "tensor_row_average"]


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


def update_write(base: DataFrame, updates: DataFrame,
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
    (daskms/writes.py:33-134).

    A duplicate ``map_key`` would duplicate the matching base rows
    through the join — an update that silently GROWS the table
    (review r9) — so the mapping is aggregated per key and a
    duplicate raises at execution instead of corrupting the output.
    """
    m = (mapping.groupBy(F.col(map_key).alias(key_col))
                .agg(F.first(map_value).alias("__new_value"),
                     F.count(F.lit(1)).alias("__k")))
    dup_safe = F.when(
        F.col("__k").isNull() | (F.col("__k") == 1),
        F.coalesce("__new_value", target)).otherwise(
        F.raise_error(F.lit(
            "column_update: duplicate keys in the mapping table — "
            "an update must map each key to ONE value; dedupe the "
            "mapping first")))
    return (base.join(F.broadcast(m), on=key_col, how="left")
                .withColumn(target, dup_safe)
                .drop("__new_value", "__k"))


def tensor_row_average(df: DataFrame, group_cols: Iterable[str],
                       vec_col: str, mask_col: str | None = None,
                       out_col: str | None = None,
                       quantize_scale: int | None = None,
                       weight_col: str | None = None,
                       weight_is_spectrum: bool = False) -> DataFrame:
    """Element-wise masked mean of a tensor column ACROSS rows per
    group — the MS time/baseline-averaging reduction (average DATA
    over a time bin per baseline, honouring FLAG): cell [i] of the
    output is mean over the group's rows of vec[i] where mask[i] is
    true; a cell unflagged in no row yields NULL.

    Scale shape: ``posexplode`` the tensor, aggregate per
    (group, position) with map-side partial sums, then reassemble the
    array with ``array_agg`` sorted by position — ONE shuffle keyed
    on (group, position), which also spreads a hot group's cells
    across reducers (a built-in skew hedge a whole-array
    ``collect_list`` reduction wouldn't have).  Rows whose arrays
    differ in length within a group raise (tensor columns are
    rectangular per group — the zarr/ragged rule).

    ``quantize_scale`` (e.g. ``1 << 20``) applies the repo's
    fixed-point discipline (kmeans/pagerank): cell sums accumulate
    ``round(v * scale)`` as int64, so the mean is bit-identical under
    any shuffle order and any engine mirroring the arithmetic — set
    it whenever results feed a cross-engine comparison.  Default None
    keeps plain double sums (float addition is order-sensitive at the
    last ulp).

    ``weight_col`` names a per-row scalar weight: cells become the
    WEIGHT-weighted mean ``sum(w * v) / sum(w)`` over unflagged
    samples (the MS semantic when rows carry WEIGHT) — same plan,
    the weighted sums ride the identical (group, position) shuffle;
    a cell whose unflagged weights sum to zero yields NULL.
    ``weight_is_spectrum=True`` reads ``weight_col`` as a PER-CELL
    weight array instead (the MS WEIGHT_SPECTRUM column — must match
    the tensor length): cell [i] weighs sample i of each row by that
    row's w[i].
    """
    group_cols = list(group_cols)
    out_col = out_col or f"{vec_col}_mean"
    m = (F.col(mask_col) if mask_col
         else F.transform(F.col(vec_col), lambda _: F.lit(True)))
    kept = F.zip_with(F.col(vec_col), m,
                      lambda v, k: F.when(k, v).otherwise(F.lit(None)))
    if weight_col and weight_is_spectrum:
        # arrays_zip silently pads/truncates on length mismatch, so
        # the docstring's "must match the tensor length" is enforced
        # here (review r9): a ragged WEIGHT_SPECTRUM raises instead of
        # emitting phantom NULL cells / silently null-weighted tails
        pair = F.when(
            F.size(vec_col) == F.size(weight_col),
            F.arrays_zip(kept.alias("v"),
                         F.col(weight_col).alias("w"))).otherwise(
            F.raise_error(F.lit(
                "tensor_row_average: weight_is_spectrum requires "
                f"size({weight_col}) == size({vec_col}) on every "
                "row")))
        ex = df.select(*group_cols,
                       F.posexplode(pair).alias("__pos", "__z"),
                       F.size(vec_col).alias("__w")) \
               .select(*group_cols, "__pos",
                       F.col("__z.v").alias("__v"),
                       F.col("__z.w").cast("double").alias("__rw"),
                       "__w")
    else:
        wcols = ([F.col(weight_col).cast("double").alias("__rw")]
                 if weight_col else [])
        ex = df.select(*group_cols, *wcols,
                       F.posexplode(kept).alias("__pos", "__v"),
                       F.size(vec_col).alias("__w"))
    v = (F.col("__v") * F.col("__rw")) if weight_col else F.col("__v")
    if quantize_scale:
        qs = F.lit(float(quantize_scale))

        def qsum(c):
            return F.sum(F.round(c * qs).cast("long")).cast("double") / qs
        sum_expr = qsum(v)
        den_expr = (qsum(F.when(F.col("__v").isNotNull(),
                                F.col("__rw"))) if weight_col
                    else F.count("__v").cast("double"))
    else:
        sum_expr = F.sum(v)
        den_expr = (F.sum(F.when(F.col("__v").isNotNull(),
                                 F.col("__rw"))) if weight_col
                    else F.count("__v").cast("double"))
    per_cell = (ex.groupBy(*group_cols, "__pos")
                .agg(sum_expr.alias("__s"),
                     den_expr.alias("__d"),
                     F.count("__v").alias("__n"),     # non-null only
                     F.count(F.lit(1)).alias("__rows"),
                     F.min("__w").alias("__wlo"),
                     F.max("__w").alias("__whi")))
    # length check folds into the same aggregation: any ragged group
    # poisons its cell rows; surface via a guarded expression
    cell = F.when(F.col("__wlo") == F.col("__whi"),
                  F.when((F.col("__n") > 0) & (F.col("__d") != 0),
                         F.col("__s") / F.col("__d")))\
        .otherwise(F.raise_error(F.lit(
            "tensor_row_average: ragged tensor lengths within a group "
            "— partition by the shape-defining column first")))
    return (per_cell
            .withColumn("__cell", cell)
            .groupBy(*group_cols)
            .agg(F.transform(
                F.array_sort(F.collect_list(
                    F.struct("__pos", "__cell"))),
                lambda s: s["__cell"]).alias(out_col),
                 F.max("__rows").cast("long").alias("n_rows")))
