"""File-statistics manifest: min/max data skipping BELOW the
partition level — the Delta/Iceberg-style pruning tier Spark's plain
parquet source lacks (Hive partition pruning skips directories;
this skips FILES inside them using parquet footer statistics).

Why it matters at 100 TB: a table laid out by ``zorder_layout`` or
``repartitionByRange`` has per-file value ranges that are narrow,
but a vanilla ``spark.read.parquet(dir).where(...)`` still opens
every file (row-group skipping happens only after scheduling).  A
manifest consulted at PLAN time turns a selective range query into
a scan of only the overlapping files — the same footer statistics,
hoisted into the driver's file-listing step.

Building the manifest is footer-only I/O (no data pages), run as a
distributed Spark job over the file list: each task reads parquet
METADATA with pyarrow and emits one row per (file, column).  The
manifest itself is a tiny parquet table (one row per file-column),
cheap to broadcast or re-read.

Reference context: dask-ms gets row-range pruning from CASA table
locality (daskms/reads.py:58-75 reads exact row slabs); parquet has
no row addressing, so file-level statistics are the idiomatic
equivalent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["build_manifest", "prune_files", "read_pruned"]

_SCHEMA = ("file string, column string, min_value string, "
           "max_value string, min_long long, max_long long, "
           "null_count long, num_rows long")

# String statistics can be writer-truncated with no pyarrow-visible
# exactness flag (parquet's is_{min,max}_value_exact isn't surfaced);
# 64 bytes is the common truncation boundary, so a stat that long is
# indistinguishable from a truncated one — treat it as missing (never
# prune on possibly-inexact evidence).
_TRUNCATION_BOUNDARY = 64


def _list_parquet_files(path: str) -> list:
    """Recursive local/posix listing of .parquet data files."""
    if os.path.isfile(path):
        return [path]
    out = []
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet") and not n.startswith((".", "_")):
                out.append(os.path.join(root, n))
    if not out:
        raise ValueError(f"build_manifest: no parquet files under "
                         f"{path!r}")
    return sorted(out)


def build_manifest(spark: SparkSession, path: str,
                   columns: list) -> DataFrame:
    """Footer-statistics manifest for ``columns`` over every parquet
    file under ``path``: one row per (file, column) with the
    file-level min/max (across row groups), null count, and row
    count.  Values are carried as strings (python float/str repr
    round-trips losslessly) PLUS typed ``min_long``/``max_long``
    columns for integer statistics — int64 above 2^53 would lose
    precision in a str→double round trip and could prune a file that
    actually contains matching rows; :func:`prune_files` compares
    integer bounds as longs.  String statistics at or beyond the
    64-byte truncation boundary are recorded as missing (writers may
    truncate them and pyarrow exposes no exactness flag).

    Distributed footer reads: the FILE LIST is parallelized and each
    task opens only metadata (O(KB) per file), so manifesting a
    100k-file table is a trivial Spark job, not a data scan.
    """
    if not columns:
        raise ValueError("build_manifest: empty column list")
    files = _list_parquet_files(path)
    cols = list(columns)

    def stats(batches):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for f in pdf["file"]:
                md = pq.ParquetFile(f).metadata
                names = {md.schema.column(i).name: i
                         for i in range(md.num_columns)}
                for c in cols:
                    if c not in names:
                        raise ValueError(
                            f"build_manifest: column {c!r} absent "
                            f"from {f!r}")
                    idx = names[c]
                    mn = mx = None
                    nulls = 0
                    for rg in range(md.num_row_groups):
                        st = md.row_group(rg).column(idx).statistics
                        if st is None or not st.has_min_max:
                            mn = mx = None
                            break
                        mn = st.min if mn is None else min(mn, st.min)
                        mx = st.max if mx is None else max(mx, st.max)
                        nulls += st.null_count or 0
                    if ((isinstance(mn, (str, bytes))
                         and len(mn) >= _TRUNCATION_BOUNDARY)
                            or (isinstance(mx, (str, bytes))
                                and len(mx) >= _TRUNCATION_BOUNDARY)):
                        mn = mx = None  # possibly truncated: no claim
                    is_int = (isinstance(mn, int)
                              and not isinstance(mn, bool))
                    out.append((f, c,
                                None if mn is None else str(mn),
                                None if mx is None else str(mx),
                                mn if is_int else None,
                                mx if is_int else None,
                                nulls, md.num_rows))
            yield pd.DataFrame(out, columns=[
                "file", "column", "min_value", "max_value",
                "min_long", "max_long",
                "null_count", "num_rows"])

    fdf = spark.createDataFrame([(f,) for f in files], "file string")
    return (fdf.repartition(min(len(files), 64))
            .mapInPandas(stats, schema=_SCHEMA))


def prune_files(manifest: DataFrame, column: str, lo, hi) -> list:
    """Files whose ``[min, max]`` interval for ``column`` overlaps
    ``[lo, hi]`` — plus files with missing statistics (never prune
    on absent evidence).  The manifest is file-count-sized; the
    filter runs as one tiny Spark job and returns the path list for
    the pruned read.  Manifests written before the typed
    ``min_long``/``max_long`` columns existed still prune via the
    lossless string-repr path (back-compat: the typed compare is an
    int64-exactness upgrade, not a schema requirement)."""
    m = manifest.where(F.col("column") == column)
    has_typed = "min_long" in manifest.columns
    if (has_typed and isinstance(lo, int) and isinstance(hi, int)
            and not isinstance(lo, bool) and not isinstance(hi, bool)):
        # exact int64 compare on the typed columns (str→double would
        # lose precision above 2^53 and could prune a matching file);
        # float-column stats have no min_long and fall back to the
        # lossless double repr path
        overlap_long = ((F.col("max_long") >= F.lit(lo))
                        & (F.col("min_long") <= F.lit(hi)))
        mn_d = F.col("min_value").cast("double")
        mx_d = F.col("max_value").cast("double")
        overlap = F.when(F.col("min_long").isNotNull(), overlap_long) \
                   .otherwise((mx_d >= F.lit(float(lo)))
                              & (mn_d <= F.lit(float(hi))))
    else:
        cast = "double" if isinstance(lo, (int, float)) else "string"
        mn = F.col("min_value").cast(cast)
        mx = F.col("max_value").cast(cast)
        overlap = (mx >= F.lit(lo)) & (mn <= F.lit(hi))
    keep = F.col("min_value").isNull() | overlap
    return [r.file for r in
            m.where(keep).select("file").distinct().collect()]


def read_pruned(spark: SparkSession, manifest: DataFrame,
                column: str, lo, hi) -> DataFrame:
    """Range scan through the manifest: read ONLY the overlapping
    files, then apply the exact residual predicate.  Semantically
    identical to ``read.parquet(dir).where(between)`` — the manifest
    only removes files that provably contain no matching rows."""
    files = prune_files(manifest, column, lo, hi)
    if not files:
        # no file can match: an empty frame with the right schema
        all_files = [r.file for r in
                     manifest.select("file").distinct().collect()]
        return (spark.read.parquet(all_files[0])
                .where(F.lit(False)))
    return (spark.read.parquet(*files)
            .where(F.col(column).between(F.lit(lo), F.lit(hi))))
