"""CASA Measurement Set source/sink (reference S1/S2/S7) — import-gated.

The reference reads CASA tables through python-casacore with per-column
``getcol`` kernels (daskms/reads.py:40-189) serialised on a per-table
single I/O thread (daskms/table_executor.py:39-65).  python-casacore is
not available in this environment, so this module is a thin,
clearly-gated adapter:

* if ``casacore`` imports, ``xds_from_casa`` materialises the table via
  ``mapInPandas``-style batched ``getcol`` reads into Arrow and hands
  back the same Dataset facade;
* otherwise it raises with the blessed alternative: convert to parquet
  (the reference's own recommendation for cloud-scale use — ``dask-ms
  convert``, daskms/apps/convert.py:139-280) and read natively.

The single-writer constraint of casacore (SURVEY §2.11 I1) is a storage
artifact, not carried into the Spark design.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import SparkSession

from ..dataset import Dataset, partition_datasets

try:  # pragma: no cover - casacore absent in this environment
    import casacore.tables as _ct  # type: ignore

    HAVE_CASACORE = True
except Exception:  # pragma: no cover
    _ct = None
    HAVE_CASACORE = False

__all__ = ["HAVE_CASACORE", "xds_from_casa", "xds_to_casa", "xds_from_ms",
           "MS_GROUP_COLS", "MS_INDEX_COLS"]

# Reference defaults for Measurement Sets (daskms/dask_ms.py:12-13).
MS_GROUP_COLS = ("FIELD_ID", "DATA_DESC_ID")
MS_INDEX_COLS = ("TIME", "ANTENNA1", "ANTENNA2")


def _require_casacore():
    if not HAVE_CASACORE:
        raise NotImplementedError(
            "python-casacore is not installed. Convert the CASA table to "
            "parquet first (dask_ms_spark.sources.convert.convert_table) "
            "— the reference's own scale path (daskms/apps/convert.py) — "
            "then read it with xds_from_parquet."
        )


def xds_from_casa(spark: SparkSession, path: str,
                  columns: Iterable[str] | None = None,
                  group_cols: Iterable[str] = (),
                  index_cols: Iterable[str] = (),
                  where: str | None = None) -> list[Dataset]:
    """Read a CASA table (reference ``xds_from_table``,
    daskms/dask_ms.py:128-294).  Requires python-casacore."""
    _require_casacore()
    # Eager driver-side read of the (single-node) CASA table into Arrow,
    # then parallelize: casacore I/O is inherently single-machine, so
    # the distributed path is convert-to-parquet; this path exists for
    # small tables and subtables.
    import numpy as np  # noqa: F401
    import pandas as pd

    with _ct.table(path, ack=False) as t:  # pragma: no cover
        names = list(columns) if columns else t.colnames()
        data = {}
        for c in names:
            arr = t.getcol(c)
            if hasattr(arr, "ndim") and arr.ndim > 1:
                arr = [v.ravel().tolist() for v in arr]
            if getattr(arr, "dtype", None) is not None and \
                    np.iscomplexobj(arr):
                arr = [np.column_stack([v.real, v.imag]).ravel().tolist()
                       for v in arr]
            data[c] = list(arr)
        pdf = pd.DataFrame(data)
    df = spark.createDataFrame(pdf)
    return partition_datasets(df, group_cols, index_cols, where, None)


def xds_from_ms(spark: SparkSession, path: str, **kw) -> list[Dataset]:
    """MS defaults: group by FIELD_ID/DATA_DESC_ID, index by
    TIME/ANTENNA1/ANTENNA2 (reference daskms/dask_ms.py:297-338)."""
    kw.setdefault("group_cols", MS_GROUP_COLS)
    kw.setdefault("index_cols", MS_INDEX_COLS)
    return xds_from_casa(spark, path, **kw)


def xds_to_casa(datasets, path: str) -> None:
    """CASA sink (reference ``xds_to_table``, daskms/writes.py:742-782).
    Requires python-casacore."""
    _require_casacore()
    raise NotImplementedError(
        "CASA write-back is not supported in this environment; write "
        "parquet (xds_to_parquet) and convert externally."
    )
