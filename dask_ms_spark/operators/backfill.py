"""Restartable partitioned backfill orchestration.

Reprocessing 100 TB is never one job — it is thousands of
partition-sized jobs, and the operational question is always the same:
which partitions are done, which failed, and how do I resume without
recomputing or double-writing?  ``backfill`` answers it with the same
commit discipline as the streaming maintenance stores
(streaming/maintenance.py): each partition writes to its own immutable
output dir, completion is an atomically renamed marker, and a re-run
skips committed partitions — so the whole backfill is idempotent under
any number of restarts, partial failures, or concurrent observers.

Store layout:

    store/
      data/p=<partition>/   per-partition parquet output
      _done/<partition>     rename-committed completion markers

This is driver-side orchestration of EXECUTOR-side work: each
``run(spark, partition)`` plan is still fully distributed; the loop
only sequences commits.  For a cluster, partitions are sized so one
partition's job saturates the executors (e.g. a day of a 3-year
backfill), making the driver loop negligible.
"""

from __future__ import annotations

import os
import re
from typing import Callable, Sequence

from pyspark.sql import DataFrame

__all__ = ["backfill", "completed_partitions", "read_backfill"]


def _safe(p: str) -> str:
    return re.sub(r"[^A-Za-z0-9_.-]", "_", str(p))


def completed_partitions(store: str) -> set[str]:
    d = os.path.join(store, "_done")
    if not os.path.isdir(d):
        return set()
    return set(os.listdir(d))


def read_backfill(spark, store: str) -> DataFrame | None:
    """Union of all COMMITTED partition outputs (uncommitted dirs from
    a crashed run are invisible)."""
    done = completed_partitions(store)
    paths = [os.path.join(store, "data", f"p={p}") for p in sorted(done)]
    paths = [p for p in paths if os.path.isdir(p)]
    if not paths:
        return None
    return spark.read.parquet(*paths)


def backfill(spark, partitions: Sequence[str],
             run: Callable[[object, str], DataFrame], store: str,
             max_failures: int = 0) -> list[tuple[str, str]]:
    """Execute ``run(spark, partition)`` for every partition not yet
    committed in ``store``; returns ``[(partition, status)]`` with
    status in ``skipped`` / ``done`` / ``failed: <err>``.

    A partition is committed only after its parquet write finishes:
    crash between write and commit re-runs that partition, whose
    ``mode("overwrite")`` write makes the retry idempotent.  Stops
    after ``max_failures`` failures (0 = stop at first).
    """
    os.makedirs(os.path.join(store, "_done"), exist_ok=True)
    os.makedirs(os.path.join(store, "data"), exist_ok=True)
    done = completed_partitions(store)
    results: list[tuple[str, str]] = []
    failures = 0
    for part in partitions:
        key = _safe(part)
        if key in done:
            results.append((part, "skipped"))
            continue
        try:
            out = run(spark, part)
            out.write.mode("overwrite").parquet(
                os.path.join(store, "data", f"p={key}"))
            tmp = os.path.join(store, "_done", f".{key}.tmp")
            with open(tmp, "w") as fh:
                fh.write(str(part))
            os.replace(tmp, os.path.join(store, "_done", key))
            results.append((part, "done"))
        except Exception as exc:  # noqa: BLE001 - per-partition isolation
            results.append((part, f"failed: {exc}"))
            failures += 1
            if failures > max_failures:
                break
    return results
