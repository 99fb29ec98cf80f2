"""Format conversion job (reference S11: ``dask-ms convert``).

The reference CLI reads any format and writes any format, including all
subtables, with column exclusion and per-row grouping for non-uniform
subtables (daskms/apps/convert.py:139-280, registry
daskms/apps/formats.py:27-80).

On Spark a conversion is a declarative read -> select -> write pipeline
per (sub)table; Catalyst handles pruning/pushdown and the cluster
handles parallelism, so conversion throughput scales with executors
rather than the reference's single dask process.
"""

from __future__ import annotations

import os
from typing import Iterable

from pyspark.sql import SparkSession

from .storage import infer_format, xds_from_storage_table, xds_to_storage_table

__all__ = ["convert_table", "convert_store"]


def convert_table(spark: SparkSession, input_url: str, output_url: str,
                  exclude_columns: Iterable[str] = (),
                  group_cols: Iterable[str] = (),
                  index_cols: Iterable[str] = (),
                  where: str | None = None,
                  output_format: str | None = None,
                  mode: str = "overwrite",
                  taql_where: str | None = None,
                  compressor: dict | None = None) -> None:
    """Convert one table between formats (daskms/apps/convert.py:224-280).

    ``exclude_columns`` mirrors the CLI's ``--exclude``
    (daskms/apps/convert.py:237-240); ``group_cols`` become Hive
    partition dirs on parquet output (G3 partition-key round trip).
    ``taql_where`` takes the reference CLI's TAQL predicate verbatim
    (daskms/apps/convert.py convert(..., taql_where, ...)) via the
    taql.py translation.
    """
    datasets = xds_from_storage_table(
        spark, input_url, group_cols=group_cols,
        index_cols=index_cols, where=where, taql_where=taql_where)
    exclude = set(exclude_columns)
    if exclude:
        datasets = [ds.select(*[c for c in ds.columns if c not in exclude])
                    for ds in datasets]
    xds_to_storage_table(datasets, output_url, fmt=output_format,
                         mode=mode, compressor=compressor)


def convert_store(spark: SparkSession, input_url: str, output_url: str,
                  subtables: Iterable[str] = (), **kw) -> None:
    """Convert a main table plus named subtables
    (daskms/apps/convert.py:188-222).  Subtables are written under
    ``output_url/SUBTABLE`` mirroring the ``::SUBTABLE`` convention."""
    convert_table(spark, input_url, output_url, **kw)
    for sub in subtables:
        sub_in = f"{input_url}::{sub}"
        sub_out = os.path.join(output_url, sub)
        # Subtables are small dimension tables: no grouping, no filter.
        datasets = xds_from_storage_table(spark, sub_in)
        xds_to_storage_table(datasets, sub_out,
                             fmt=kw.get("output_format"),
                             compressor=kw.get("compressor"))


def probe(path: str) -> str:
    """Expose format inference (daskms/apps/formats.py:105-118)."""
    return infer_format(path)
