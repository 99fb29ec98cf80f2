"""Streaming continuous-aggregate maintenance.

``foreachBatch`` + :func:`~dask_ms_spark.operators.timeseries.merge_rollups`:
each micro-batch is bucket-aggregated and merged into a persisted
rollup store WITHOUT re-reading history — the streaming form of the
``rollup_merge`` invariant (merge(agg(history), agg(delta)) ==
agg(all), exact because counts/sums are associative).

Store layout (local filesystem; an object store would swap the
symlink for a manifest pointer):

    store/
      v<batch_id>/   one immutable parquet snapshot per micro-batch
      current -> vN  atomically renamed symlink = committed state

Exactly-once: the committed batch id IS the symlink target.  A
replayed micro-batch (failure between write and publish, or after
publish) is either skipped (``batch_id <= committed``) or rewrites
its own ``v<batch_id>`` from the same input and republishes —
idempotent either way.  This is the checkpoint-v2 pattern Structured
Streaming's own sinks use (write-ahead snapshot + atomic pointer).

Batch ids are only meaningful WITHIN one checkpoint lineage, so the
store records its checkpoint identity on first commit and
:func:`maintain_rollup` refuses to attach a different (or missing)
checkpoint to a non-empty store — a fresh checkpoint restarts batch
numbering at 0 and the guard would otherwise silently drop new data.
Resume with the original checkpoint, or start an empty store.

Scale: each micro-batch shuffles only the delta's (key, bucket)
groups; the merge reads the previous snapshot once.  For rollups too
large to rewrite per batch, :func:`maintain_rollup_log` is the
LSM-style variant: each batch appends its own immutable delta rollup
(O(delta) work, committed by an atomic directory rename), readers
merge base + committed deltas, and a compaction folds the log into a
new base snapshot every ``compact_every`` batches — per-batch cost is
independent of history size, and every step is idempotent under
replay (a re-run batch overwrites its own delta dir and re-renames).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..operators.timeseries import (DEFAULT_ORIGIN, bucket_aggregate,
                                    merge_rollups)
from .events import normalize_ts

__all__ = ["maintain_rollup", "committed_batch", "read_rollup",
           "maintain_rollup_log", "read_rollup_log"]


def committed_batch(store: str) -> int | None:
    """Batch id of the committed snapshot, or None before the first."""
    cur = os.path.join(store, "current")
    if not os.path.lexists(cur):
        return None
    return int(os.readlink(cur).lstrip("v"))


def read_rollup(spark, store: str) -> DataFrame | None:
    """The committed rollup snapshot (None before the first commit).

    Reads the CONCRETE version dir the symlink points at, not the
    symlink path: a read through ``current`` would race with the next
    publish (file listing resolved under one version, files fetched
    after the pointer moved).  Snapshots are immutable, so the
    resolved path is stable for the lifetime of the DataFrame; the
    pruner's ``keep=2`` keeps the previous snapshot alive for
    in-flight readers."""
    batch = committed_batch(store)
    if batch is None:
        return None
    return spark.read.parquet(os.path.join(store, f"v{batch}"))


def _publish(store: str, batch_id: int, keep: int = 2) -> None:
    """Atomically point ``current`` at ``v<batch_id>``; prune old
    snapshots beyond ``keep`` (never the published one)."""
    tmp = os.path.join(store, ".current.tmp")
    if os.path.lexists(tmp):
        os.remove(tmp)
    os.symlink(f"v{batch_id}", tmp)
    os.replace(tmp, os.path.join(store, "current"))
    import shutil

    versions = sorted((int(d.lstrip("v")) for d in os.listdir(store)
                       if d.startswith("v")), reverse=True)
    for v in versions[keep:]:
        if v != batch_id:
            shutil.rmtree(os.path.join(store, f"v{v}"),
                          ignore_errors=True)


def maintain_rollup(stream_df: DataFrame, store: str,
                    ts_col: str = "ts", key_col: str = "user_id",
                    value_col: str = "value", step_seconds: int = 3600,
                    origin: str = DEFAULT_ORIGIN,
                    value_cast: str | None = None,
                    checkpoint: str | None = None):
    """Start the maintenance query; returns the StreamingQuery.

    ``value_cast`` (e.g. ``"decimal(18,2)"``) makes the running sums
    order-independent and hence bit-identical to a batch re-aggregate
    — pass it whenever exact parity matters.
    """
    from pyspark.sql import functions as F

    os.makedirs(store, exist_ok=True)
    ident_file = os.path.join(store, ".stream_identity")
    ident = os.path.abspath(checkpoint) if checkpoint else None
    if committed_batch(store) is not None:
        recorded = (open(ident_file).read()
                    if os.path.exists(ident_file) else None)
        if ident is None or recorded != ident:
            raise ValueError(
                "store already holds state committed under checkpoint "
                f"{recorded!r}; batch ids are per-checkpoint, so "
                "attaching a different or ephemeral checkpoint would "
                "silently drop or double-merge data — resume with the "
                "original checkpoint or start an empty store")
    elif ident is not None:
        with open(ident_file, "w") as fh:
            fh.write(ident)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        committed = committed_batch(store)
        if committed is not None and batch_id <= committed:
            return  # replayed after publish: already merged
        batch_df = normalize_ts(batch_df, ts_col)
        if value_cast:
            batch_df = batch_df.withColumn(
                value_col, F.col(value_col).cast(value_cast))
        delta = bucket_aggregate(batch_df, ts_col, key_col, value_col,
                                 step_seconds, origin)
        prev = read_rollup(batch_df.sparkSession, store)
        merged = delta if prev is None else merge_rollups(prev, delta)
        merged.write.mode("overwrite").parquet(
            os.path.join(store, f"v{batch_id}"))
        _publish(store, batch_id)

    writer = stream_df.writeStream.foreachBatch(apply) \
        .trigger(processingTime="0 seconds")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()


# ---------------------------------------------------------------------------
# LSM-style delta-log maintenance: O(delta) per batch, not O(history)

def _base_state(store: str) -> tuple[str | None, int]:
    """(base version dir name or None, highest batch folded into it)."""
    marker = os.path.join(store, "BASE")
    if not os.path.exists(marker):
        return None, -1
    name, upto = open(marker).read().split()
    return name, int(upto)


def _committed_deltas(store: str, above: int) -> list[tuple[int, str]]:
    ddir = os.path.join(store, "delta")
    if not os.path.isdir(ddir):
        return []
    out = []
    for d in os.listdir(ddir):
        if d.startswith("v") and not d.startswith(".") and d[1:].isdigit():
            b = int(d[1:])
            if b > above:
                out.append((b, os.path.join(ddir, d)))
    return sorted(out)


def read_rollup_log(spark, store: str) -> DataFrame | None:
    """Committed state of a delta-log store: base snapshot merged with
    every committed delta above the base's fold point."""
    base_name, upto = _base_state(store)
    deltas = _committed_deltas(store, upto)
    frames = []
    if base_name is not None:
        frames.append(spark.read.parquet(os.path.join(store, base_name)))
    frames.extend(spark.read.parquet(p) for _, p in deltas)
    if not frames:
        return None
    return merge_rollups(*frames)


def maintain_rollup_log(stream_df: DataFrame, store: str,
                        ts_col: str = "ts", key_col: str = "user_id",
                        value_col: str = "value",
                        step_seconds: int = 3600,
                        origin: str = DEFAULT_ORIGIN,
                        value_cast: str | None = None,
                        compact_every: int = 10,
                        checkpoint: str | None = None):
    """LSM variant of :func:`maintain_rollup`.

    Per batch: aggregate the delta (O(delta)), write it to a private
    staging dir, and commit with one atomic directory rename — history
    is never read or rewritten on the hot path.  Every
    ``compact_every`` committed deltas, the batch additionally folds
    base+deltas into a new base snapshot and atomically advances the
    ``BASE`` marker (readers that raced still see only immutable
    dirs).  Replayed batches are idempotent: the delta dir for a batch
    id is recomputed from the same input and the rename simply
    replaces nothing new; batches at or below the base fold point are
    skipped outright.
    """
    from pyspark.sql import functions as F

    os.makedirs(os.path.join(store, "delta"), exist_ok=True)
    ident_file = os.path.join(store, ".stream_identity")
    ident = os.path.abspath(checkpoint) if checkpoint else None
    has_state = (_base_state(store)[0] is not None
                 or bool(_committed_deltas(store, -1)))
    if has_state:
        recorded = (open(ident_file).read()
                    if os.path.exists(ident_file) else None)
        if ident is None or recorded != ident:
            raise ValueError(
                "store already holds state committed under checkpoint "
                f"{recorded!r}; batch ids are per-checkpoint — resume "
                "with the original checkpoint or start an empty store")
    elif ident is not None:
        with open(ident_file, "w") as fh:
            fh.write(ident)

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        _, upto = _base_state(store)
        if batch_id <= upto:
            return  # already folded into the base snapshot
        batch_df = normalize_ts(batch_df, ts_col)
        if value_cast:
            batch_df = batch_df.withColumn(
                value_col, F.col(value_col).cast(value_cast))
        delta = bucket_aggregate(batch_df, ts_col, key_col, value_col,
                                 step_seconds, origin)
        staging = os.path.join(store, "delta", f".tmp-{batch_id}")
        final = os.path.join(store, "delta", f"v{batch_id}")
        delta.write.mode("overwrite").parquet(staging)
        if os.path.isdir(final):
            shutil.rmtree(final)     # replayed batch: replace its delta
        os.replace(staging, final)   # atomic commit

        committed = _committed_deltas(store, upto)
        if len(committed) >= compact_every:
            spark = batch_df.sparkSession
            old_base, old_upto = _base_state(store)
            frames = ([spark.read.parquet(os.path.join(store, old_base))]
                      if old_base else [])
            frames += [spark.read.parquet(p) for _, p in committed]
            folded_to = committed[-1][0]
            new_base = f"base-v{folded_to}"
            merge_rollups(*frames).write.mode("overwrite").parquet(
                os.path.join(store, new_base))
            tmp = os.path.join(store, ".BASE.tmp")
            with open(tmp, "w") as fh:
                fh.write(f"{new_base} {folded_to}")
            os.replace(tmp, os.path.join(store, "BASE"))
            # prune with ONE COMPACTION OF LAG: a reader that listed
            # dirs under the previous marker still has every dir it
            # needs alive; only state the PREVIOUS fold already
            # superseded is removed now
            for b, p in _committed_deltas(store, -1):
                if b <= old_upto:
                    shutil.rmtree(p, ignore_errors=True)
            for d in os.listdir(store):
                if (d.startswith("base-v")
                        and d not in (new_base, old_base)):
                    shutil.rmtree(os.path.join(store, d),
                                  ignore_errors=True)

    writer = stream_df.writeStream.foreachBatch(apply) \
        .trigger(processingTime="0 seconds")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer.start()
