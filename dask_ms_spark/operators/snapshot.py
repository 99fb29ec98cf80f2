"""Atomic multi-table snapshot publishing.

A training run must read a CONSISTENT corpus: documents, embeddings,
and metadata produced by the same pipeline run — not documents from
release 12 with embeddings from release 11.  Single-table formats
commit tables independently; this publisher commits a SET of tables
as one atomic version:

    store/
      v<N>/<table>/      immutable parquet per table
      CURRENT            rename-committed pointer file ("v<N>")

Readers resolve CURRENT once and read every table from that version
dir — no torn reads, because the pointer flips only after every table
of the new version is fully written, and old versions are immutable
until pruned (``keep`` versions retained for in-flight readers).

The same rename-commit discipline as the streaming maintenance stores
and the backfill markers (streaming/maintenance.py,
operators/backfill.py); a failed publish leaves a dangling v<N+1>
directory that the next publish simply overwrites.
"""

from __future__ import annotations

import os
import shutil
from typing import Mapping

from pyspark.sql import DataFrame

__all__ = ["publish_snapshot", "read_snapshot", "current_version"]


def current_version(store: str) -> int | None:
    p = os.path.join(store, "CURRENT")
    if not os.path.exists(p):
        return None
    return int(open(p).read().strip().lstrip("v"))


def publish_snapshot(tables: Mapping[str, DataFrame], store: str,
                     keep: int = 2) -> int:
    """Write every table, then commit them together; returns the new
    version number.  Re-running a failed publish overwrites its own
    version dir — idempotent.

    Single-publisher assumption: version allocation is CURRENT+1 with
    no lock, so concurrent publishers would claim the same version
    dir — serialise publishes externally (the streaming maintenance
    stores already do: one writer per store is the rename-commit
    contract).  An empty ``tables`` mapping raises rather than
    committing CURRENT to a version whose directory was never
    created (which would break every subsequent read)."""
    if not tables:
        raise ValueError("publish_snapshot: empty tables mapping — "
                         "refusing to commit a version with no data")
    os.makedirs(store, exist_ok=True)
    cur = current_version(store)
    version = 0 if cur is None else cur + 1
    vdir = os.path.join(store, f"v{version}")
    os.makedirs(vdir, exist_ok=True)
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(os.path.join(vdir, name))
    tmp = os.path.join(store, ".CURRENT.tmp")
    with open(tmp, "w") as fh:
        fh.write(f"v{version}")
    os.replace(tmp, os.path.join(store, "CURRENT"))
    # prune versions no in-flight reader can still need
    for name in os.listdir(store):
        if name.startswith("v"):
            try:
                n = int(name[1:])
            except ValueError:
                continue
            if n <= version - keep:
                shutil.rmtree(os.path.join(store, name),
                              ignore_errors=True)
    return version


def read_snapshot(spark, store: str,
                  version: int | None = None) -> dict[str, DataFrame]:
    """All tables of one committed version (default: CURRENT, resolved
    once so concurrent publishes cannot tear the read)."""
    if version is None:
        version = current_version(store)
    if version is None:
        return {}
    vdir = os.path.join(store, f"v{version}")
    out = {}
    for name in sorted(os.listdir(vdir)):
        out[name] = spark.read.parquet(os.path.join(vdir, name))
    return out
