"""Storage dispatch: route a URL to the right format reader/writer.

Reference S6/S10: ``xds_from_storage_table`` probes for ``table.dat``
(CASA), ``.zgroup`` (zarr) or ``*.parquet``
(daskms/dask_ms.py:341-439, daskms/fsspec_store.py:59-82) and supports
a ``::SUBTABLE`` url suffix (daskms/fsspec_store.py:17-189).

Spark natively speaks any Hadoop-compatible filesystem (file://, s3a://,
...), so the store abstraction reduces to path parsing + format probing.
CASA and zarr need native libraries not present in this environment;
they are import-gated stubs (see casa.py / zarr.py) — the reference
itself blesses conversion to cloud-native formats as the scale path
(``dask-ms convert``, daskms/apps/convert.py:139-280).
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
    return zarr.xds_from_zarr(spark, store.path, columns,
                              group_cols, index_cols, where)


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
