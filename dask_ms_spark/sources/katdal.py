"""katdal (MeerKAT archive) source (reference S5/S12) — import-gated.

The reference exposes live MeerKAT archive data (RDB urls) as
MSv2-shaped datasets via a facade that transposes (time, chan,
corrprod) -> (row, chan, corr) with numba kernels
(daskms/experimental/katdal/katdal_import.py:51-111, facade
msv2_facade.py:52-121, transpose.py:34-131).

The katdal package is not available in this environment.  When it is,
the Spark-native shape of the ingest is:

* open the archive on the driver (metadata only);
* parallelize (scan, dump-index) ranges to executors;
* each task reads its time slice, transposes to row-major (the numba
  transpose becomes a numpy reshape inside ``mapInPandas``), and emits
  Arrow batches with the MSv2 column layout of §1 (interleaved-complex
  DATA, flat UVW, ...);
* write Hive-partitioned parquet (FIELD_ID / DATA_DESC_ID) — after
  which every query runs on the native parquet path.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import SparkSession

try:  # pragma: no cover - katdal absent in this environment
    import katdal as _katdal  # type: ignore

    HAVE_KATDAL = True
except Exception:  # pragma: no cover
    _katdal = None
    HAVE_KATDAL = False

__all__ = ["HAVE_KATDAL", "xds_from_katdal", "katdal_import"]


def _require_katdal():
    if not HAVE_KATDAL:
        raise NotImplementedError(
            "katdal is not installed; ingest MeerKAT data to parquet on "
            "a machine with katdal (see module docstring for the "
            "distributed ingest shape), then read with xds_from_parquet."
        )


def xds_from_katdal(spark: SparkSession, url: str,
                    applycal: str = "", no_auto: bool = True,
                    group_cols: Iterable[str] = ("FIELD_ID", "DATA_DESC_ID"),
                    ):
    """Open a MeerKAT archive as MSv2-shaped Datasets (reference
    ``xds_from_katdal``, katdal_import.py:51-111)."""
    _require_katdal()
    raise NotImplementedError("katdal ingest path requires katdal")


def katdal_import(spark: SparkSession, url: str, out_store: str,
                  no_auto: bool = True, applycal: str = "") -> None:
    """Archive -> parquet ingest job (reference ``katdal_import``,
    katdal_import.py:115-139)."""
    _require_katdal()
    raise NotImplementedError("katdal ingest path requires katdal")
