"""Storage dispatch: route a URL to the right format reader/writer.

Reference S6/S10: ``xds_from_storage_table`` probes for ``table.dat``
(CASA), ``.zgroup`` (zarr) or ``*.parquet``
(daskms/dask_ms.py:341-439, daskms/fsspec_store.py:59-82) and supports
a ``::SUBTABLE`` url suffix (daskms/fsspec_store.py:17-189).

Spark natively speaks any Hadoop-compatible filesystem (file://, s3a://,
...), so the store abstraction reduces to path parsing + format probing.
Zarr v2 stores read/write natively (see zarr.py — executor-side chunk
I/O, no zarr package needed for uncompressed stores); CASA needs
python-casacore and stays import-gated — the reference itself blesses
conversion to cloud-native formats as the scale path (``dask-ms
convert``, daskms/apps/convert.py:139-280).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterable

from pyspark.sql import SparkSession

from ..dataset import Dataset
from . import casa, zarr
from .parquet import xds_from_parquet, xds_to_parquet

__all__ = ["TableStore", "infer_format", "xds_from_storage_table",
           "xds_to_storage_table"]


@dataclass
class TableStore:
    """Parsed table url: ``/path/to/store::SUBTABLE`` convention
    (daskms/fsspec_store.py:120-140)."""

    url: str
    subtable: str | None = None

    @classmethod
    def parse(cls, url: str) -> "TableStore":
        if "::" in url:
            base, subtable = url.rsplit("::", 1)
            return cls(base, subtable)
        return cls(url)

    @property
    def path(self) -> str:
        return os.path.join(self.url, self.subtable) if self.subtable else self.url


def infer_format(path: str) -> str:
    """Probe the on-disk layout (daskms/fsspec_store.py:59-82):
    ``table.dat`` -> casa, ``.zgroup``/``.zarray`` -> zarr, else parquet.
    """
    if os.path.exists(os.path.join(path, "table.dat")):
        return "casa"
    if (os.path.exists(os.path.join(path, ".zgroup"))
            or os.path.exists(os.path.join(path, ".zarray"))
            or os.path.exists(os.path.join(path, "zarr.json"))):
        return "zarr"
    return "parquet"


def xds_from_storage_table(spark: SparkSession, url: str,
                           columns: Iterable[str] | None = None,
                           group_cols: Iterable[str] = (),
                           index_cols: Iterable[str] = (),
                           where: str | None = None) -> list[Dataset]:
    """Format-dispatched read (reference daskms/dask_ms.py:341-380)."""
    store = TableStore.parse(url)
    fmt = infer_format(store.path)
    if fmt == "parquet":
        return xds_from_parquet(spark, store.path, columns,
                                group_cols, index_cols, where)
    if fmt == "casa":
        return casa.xds_from_casa(spark, store.path, columns,
                                  group_cols, index_cols, where)
    # zarr reads take only a column projection; grouping/ordering/filter
    # are applied on the lazy frames afterwards, matching the parquet leg
    # (partition_datasets re-derives one Dataset per group tuple).
    group_cols = list(group_cols)
    index_cols = list(index_cols)
    if where is not None:
        # the filter may reference unprojected columns; read everything
        # and let partition_datasets prune to ``columns`` after filtering
        read_cols = None
    elif columns is not None:
        read_cols = list(dict.fromkeys(
            list(columns) + group_cols + index_cols))
    else:
        read_cols = None
    dss = zarr.xds_from_zarr(spark, store.path, read_cols)
    if not (group_cols or index_cols or where or
            (columns is not None and read_cols != list(columns or ()))):
        return dss
    from ..dataset import concat as _concat
    from ..dataset import partition_datasets

    return partition_datasets(_concat(dss), group_cols, index_cols,
                              where, columns)


def xds_to_storage_table(datasets, url: str, fmt: str = "parquet",
                         partition_cols: Iterable[str] | None = None,
                         mode: str = "overwrite") -> None:
    """Format-dispatched write (reference daskms/dask_ms.py:383-439)."""
    store = TableStore.parse(url)
    if fmt == "parquet":
        return xds_to_parquet(datasets, store.path, partition_cols, mode)
    if fmt == "casa":
        return casa.xds_to_casa(datasets, store.path)
    return zarr.xds_to_zarr(datasets, store.path)
