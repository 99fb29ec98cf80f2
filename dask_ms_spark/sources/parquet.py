"""Parquet source/sink (reference S4/S9).

The reference discovers ``*.parquet`` fragments, groups them by
Hive-style ``FIELD=val`` dirs and reassembles chunked arrays
(daskms/experimental/arrow/reads.py:209-346); its sink writes one file
per row-chunk under Hive partition dirs
(daskms/experimental/arrow/writes.py:100-178).

On Spark both directions are native: ``spark.read.parquet`` does
partition discovery + pruning, ``df.write.partitionBy(...).parquet``
produces the identical Hive layout.  What remains is the dataset-list
facade and the partition-key round trip (G3).
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession

from ..dataset import Dataset, concat, partition_datasets
from ..types import PARTITION_KEY

__all__ = ["xds_from_parquet", "xds_to_parquet", "read_table",
           "compact_parquet", "table_health"]


def read_table(spark: SparkSession, path: str,
               columns: Iterable[str] | None = None) -> DataFrame:
    """Plain lazy parquet scan; column pruning via select."""
    df = spark.read.parquet(path)
    if columns is not None:
        df = df.select(*columns)
    return df


def xds_from_parquet(spark: SparkSession, store: str,
                     columns: Iterable[str] | None = None,
                     group_cols: Iterable[str] = (),
                     index_cols: Iterable[str] = (),
                     where: str | None = None) -> list[Dataset]:
    """Read a parquet store into one Dataset per group (reference
    ``xds_from_parquet``, daskms/experimental/arrow/reads.py:209-346,
    plus the grouping semantics of ``xds_from_table``,
    daskms/dask_ms.py:128-294).

    ``where`` is pushed into the scan by Catalyst (PushedFilters);
    ``group_cols`` matching Hive partition dirs prune partitions.
    """
    df = spark.read.parquet(store)
    return partition_datasets(df, group_cols, index_cols, where, columns)


def xds_to_parquet(datasets: list[Dataset] | Dataset | DataFrame, store: str,
                   partition_cols: Iterable[str] | None = None,
                   mode: str = "overwrite",
                   table_keywords: dict | None = None,
                   column_keywords: dict | None = None) -> None:
    """Write datasets to a Hive-partitioned parquet store (reference
    ``xds_to_parquet``, daskms/experimental/arrow/writes.py:100-178).

    Partition columns default to the datasets' recorded partition key,
    giving the same ``FIELD=val`` directory layout the reference emits.
    ``table_keywords``/``column_keywords`` mirror ``xds_to_table``'s
    metadata args (daskms/writes.py:723-739) via a JSON sidecar.
    """
    if isinstance(datasets, Dataset):
        datasets = [datasets]
    if isinstance(datasets, list):
        if partition_cols is None:
            key = datasets[0].attrs.get(PARTITION_KEY, ())
            partition_cols = [c for c, _ in key]
        df = concat(datasets)
    else:
        df = datasets
        partition_cols = list(partition_cols or ())

    writer = df.write.mode(mode)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(store)

    if table_keywords or column_keywords:
        from .keywords import write_keywords

        write_keywords(store, table_keywords, column_keywords)


def compact_parquet(spark: SparkSession, store: str, out_store: str,
                    sort_cols: Iterable[str] = (),
                    target_files: int | None = None) -> int:
    """Rewrite a parquet store into fewer, larger, optionally sorted
    files — the small-files maintenance pass every incremental-append
    table needs at scale (each streaming micro-batch or per-chunk
    writer leaves one file; metadata and open() overhead then dominate
    the scan).

    With ``sort_cols`` the rewrite range-partitions on those keys, so
    each output file covers a disjoint key range and parquet min/max
    row-group stats prune scans with key predicates — the same
    locality the reference gets from its sorted row-run layout
    (daskms/ordering.py:18-57), achieved declaratively.  Returns the
    number of output files written.
    """
    df = spark.read.parquet(store)
    if target_files is None:
        target_files = max(1, df.rdd.getNumPartitions() // 8)
    sort_cols = list(sort_cols)
    if sort_cols:
        df = (df.repartitionByRange(target_files, *sort_cols)
                .sortWithinPartitions(*sort_cols))
    else:
        df = df.coalesce(target_files)
    df.write.mode("overwrite").parquet(out_store)
    out = [f for f in _list_files(spark, out_store)
           if f.endswith(".parquet")]
    return len(out)


def _list_files(spark: SparkSession, store: str) -> list[str]:
    import os

    if os.path.isdir(store):
        return [os.path.join(r, f) for r, _, fs in os.walk(store)
                for f in fs]
    # non-local stores: go through the JVM Hadoop FS
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(store)
    fs = p.getFileSystem(conf)
    it = fs.listFiles(p, True)
    names = []
    while it.hasNext():
        names.append(it.next().getPath().toString())
    return names


def table_health(spark: SparkSession, store: str,
                 target_file_bytes: int = 128 << 20) -> "DataFrame":
    """Parquet-store health report: one row per data file (rows,
    bytes, row groups, fraction of target size) plus the layout
    verdicts a maintenance scheduler acts on — the advisor that tells
    you when :func:`compact_parquet` is due.

    Footer reads are DISTRIBUTED: file paths parallelize into tasks
    and each executor opens only its own footers (pyarrow), so the
    report scales to million-file stores where a driver-side loop
    would take hours.  Listing stays driver-side (it is one namenode
    call, not one per file).
    """
    from pyspark.sql import functions as F

    import os as _os

    if _os.path.isfile(store):
        paths = [store]
    else:
        # normalise Hadoop file: URIs back to local paths for pyarrow
        paths = [p[len("file:"):] if p.startswith("file:") else p
                 for p in _list_files(spark, store)
                 if p.endswith(".parquet")]
    pdf = spark.createDataFrame([(p,) for p in paths], "path string") \
        .repartition(max(1, min(len(paths),
                                spark.sparkContext.defaultParallelism)))

    def footers(batches):
        import os

        import pandas as pd
        import pyarrow.parquet as pq

        for b in batches:
            out = []
            for p in b["path"]:
                md = pq.ParquetFile(p).metadata
                out.append((p, md.num_rows,
                            os.path.getsize(p), md.num_row_groups))
            yield pd.DataFrame(out, columns=["path", "n_rows",
                                             "n_bytes", "n_row_groups"])

    detail = pdf.mapInPandas(
        footers, "path string, n_rows long, n_bytes long, "
                 "n_row_groups long")
    return detail.withColumn(
        "fill_fraction",
        F.round(F.col("n_bytes") / F.lit(float(target_file_bytes)), 4)) \
        .withColumn("is_small", F.col("n_bytes")
                    < F.lit(target_file_bytes // 4))
