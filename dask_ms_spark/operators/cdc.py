"""Change-data-capture application: MERGE INTO as DataFrame algebra.

Plain Spark has no MERGE statement (that's a table-format feature —
Delta/Iceberg); the underlying computation is engine-neutral and this
operator spells it declaratively: given a snapshot and a change feed
of (key, op, seq, payload) rows — ``I``/``U`` upserts, ``D`` deletes —
produce the next snapshot where, per key, the HIGHEST-SEQ change wins
and unchanged rows pass through.

Scale shape: one window (partition by key, order by seq desc) over
the CHANGE FEED only — the feed is the small side by construction;
the snapshot is touched by exactly one anti-join on the changed-key
set (broadcastable) plus a union.  The snapshot never shuffles when
the changed-key set broadcasts, which is precisely the property that
makes per-batch CDC apply viable over a 100 TB table.

Works with the maintenance stores (streaming/maintenance.py) for the
streaming form: apply per micro-batch, publish with the rename-commit
discipline.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..cache import pin_multi_consumer

__all__ = ["apply_cdc", "scd2_apply"]


def apply_cdc(snapshot: DataFrame, changes: DataFrame,
              key_cols: str | Sequence[str], op_col: str = "op",
              seq_col: str = "seq",
              broadcast_changes: bool = True) -> DataFrame:
    """Next snapshot after applying ``changes``.

    ``changes`` columns: the key(s), ``op_col`` in {'I','U','D'},
    ``seq_col`` (monotone per key — commit LSN / batch id), plus
    exactly the snapshot's payload columns for upserts.  Per key the
    highest (seq, op) wins — the op tiebreak makes a same-seq
    delete+upsert deterministic (upsert wins, 'U'/'I' > 'D').  Two
    changes that collide on (key, seq, op) but differ in payload are
    a feed defect; rather than let the engine pick an arbitrary
    winner, the window falls back to a total order over the payload
    columns (descending), so the result is a pure function of the
    feed's row SET — the repo-wide determinism discipline.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    payload = [c for c in changes.columns
               if c not in set(keys) | {op_col, seq_col}]
    w = Window.partitionBy(*keys).orderBy(
        F.col(seq_col).desc(), F.col(op_col).desc(),
        *[F.col(c).desc_nulls_last() for c in payload])
    # r12 optimization: ``latest`` feeds BOTH the upsert leg and the
    # changed-key anti-join; Catalyst plans trees, so without a
    # materialisation the dedup window (exchange + sort) runs twice
    # (plan-verified).  lazy localCheckpoint: one window pass, and
    # the change feed is the small side by construction.
    latest = pin_multi_consumer(
        changes.withColumn("__rn", F.row_number().over(w))
               .where(F.col("__rn") == 1).drop("__rn"))
    upserts = latest.where(F.col(op_col) != "D") \
        .drop(op_col, seq_col) \
        .select(*snapshot.columns)
    changed_keys = latest.select(*keys)
    if broadcast_changes:
        changed_keys = F.broadcast(changed_keys)
    untouched = snapshot.join(changed_keys, keys, "left_anti")
    return untouched.unionByName(upserts)


def scd2_apply(dim: DataFrame, changes: DataFrame,
               key_cols: str | Sequence[str],
               effective_col: str = "effective_seq",
               track_cols: Sequence[str] | None = None,
               validate: bool = False) -> DataFrame:
    """Slowly-changing-dimension Type 2 maintenance: fold a batch of
    new attribute versions into a history table that keeps EVERY
    version with its validity range.

    ``dim`` rows carry ``valid_from`` / ``valid_to`` (long sequence
    numbers; open rows have ``valid_to = NULL``) and ``is_current``.
    ``changes`` carries the key(s), ``effective_col`` (the sequence at
    which the new version takes effect) and the tracked attribute
    columns.  Per key, the incoming batch is sequence-ordered; each
    new version closes the previous open row at its effective
    sequence.  Unchanged keys pass through one broadcast anti-join —
    like :func:`apply_cdc`, the big history table never shuffles.

    A change identical to the key's current attribute values still
    opens a new version (version collapsing is the caller's filter —
    compare against the current row before calling when no-op churn
    is common).

    PRECONDITION (enforced when ``validate=True``): every incoming
    ``effective_col`` must be strictly greater than the key's current
    open ``valid_from`` — SCD2 folds are forward-only.  A
    late-arriving version would close the open row at a sequence at
    or before it opened, producing inverted (``valid_to <
    valid_from``) or overlapping ranges; history *rewrites* are a
    rebuild from the full change log, not a fold.  With
    ``validate=True`` the plan carries a distributed ``assert_true``
    on the joined (open-row, first-incoming) pairs, failing the job
    on any violation instead of committing corrupt history.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    track_cols = list(track_cols) if track_cols is not None else \
        [c for c in changes.columns
         if c not in set(keys) | {effective_col}]
    base_cols = keys + track_cols + ["valid_from", "valid_to"]

    # order incoming versions per key; chain validity ranges.  Ties
    # on (key, effective_seq) break on the tracked payload columns —
    # the apply_cdc total-order discipline — so which duplicate stays
    # current (and which gets the zero-width version) is a pure
    # function of the data, not of shuffle order (review r8).  Only
    # orderable payload types join the tie-break: a MapType track
    # column — at ANY nesting depth (array<map>, struct with a map
    # field), mirroring Spark's RowOrdering.isOrderable — would fail
    # the window's orderBy analysis (review r9 ×2).
    from pyspark.sql.types import ArrayType, MapType, StructType

    def _orderable(dt) -> bool:
        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    tie_cols = [c for c in track_cols
                if _orderable(changes.schema[c].dataType)]
    incoming = (
        changes
        .select(*keys, F.col(effective_col).cast("long")
                .alias("valid_from"), *track_cols)
        .withColumn("valid_to",
                    F.lead("valid_from").over(
                        Window.partitionBy(*keys)
                        .orderBy("valid_from", *tie_cols))))

    hist = dim.select(*base_cols)
    # r12: the anti-join probes the SAME one-row-per-key close-at
    # aggregate as the close leg instead of a second
    # select(keys).distinct() — a distinct over the feed and
    # groupBy(min) have identical key sets by construction, so one
    # whole aggregate+broadcast derivation of the change-feed
    # subtree is removed outright (guide §2.4; interleaved A/B at
    # sf0.1: 0.86x).  Persisting the feed itself was A/B-measured
    # 1.6x SLOWER at this scale (the narrow subtree is cheaper to
    # rebuild than to materialise — the gain_solve rule), so the
    # remaining two derivations stay lazy.
    first_new = F.broadcast(
        incoming.groupBy(*keys)
        .agg(F.min("valid_from").alias("__close_at")))
    untouched = hist.join(first_new, keys, "left_anti")
    touched = hist.join(first_new, keys)
    if validate:
        # forward-only guard: the first incoming version of a key
        # must postdate that key's open row.  Folded INTO the
        # valid_to expression (a side assert column would be pruned
        # by Catalyst); evaluated row-by-row in the executors, fails
        # the job on breach — no driver action.
        close_expr = (
            F.when(F.col("valid_to").isNotNull(), F.col("valid_to"))
            .when(F.col("__close_at") > F.col("valid_from"),
                  F.col("__close_at"))
            .otherwise(F.raise_error(F.lit(
                "scd2_apply: late-arriving version (effective "
                "sequence <= open row's valid_from)")).cast("long")))
    else:
        close_expr = F.when(F.col("valid_to").isNull(),
                            F.col("__close_at")) \
            .otherwise(F.col("valid_to"))
    touched = (touched
               .withColumn("valid_to", close_expr)
               .drop("__close_at"))
    out = (untouched.unionByName(touched.select(*base_cols))
           .unionByName(incoming.select(*base_cols)))
    return out.withColumn("is_current", F.col("valid_to").isNull())
