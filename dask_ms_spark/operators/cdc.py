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

__all__ = ["apply_cdc"]


def apply_cdc(snapshot: DataFrame, changes: DataFrame,
              key_cols: str | Sequence[str], op_col: str = "op",
              seq_col: str = "seq",
              broadcast_changes: bool = True) -> DataFrame:
    """Next snapshot after applying ``changes``.

    ``changes`` columns: the key(s), ``op_col`` in {'I','U','D'},
    ``seq_col`` (monotone per key — commit LSN / batch id), plus
    exactly the snapshot's payload columns for upserts.  Per key the
    highest (seq, op) wins — the op tiebreak makes a same-seq
    delete+upsert deterministic (upsert wins, 'U'/'I' > 'D').
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    w = Window.partitionBy(*keys).orderBy(F.col(seq_col).desc(),
                                          F.col(op_col).desc())
    latest = (changes.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") == 1).drop("__rn"))
    upserts = latest.where(F.col(op_col) != "D") \
        .drop(op_col, seq_col) \
        .select(*snapshot.columns)
    changed_keys = latest.select(*keys)
    if broadcast_changes:
        changed_keys = F.broadcast(changed_keys)
    untouched = snapshot.join(changed_keys, keys, "left_anti")
    return untouched.unionByName(upserts)
