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

__all__ = ["HAVE_KATDAL", "xds_from_katdal", "katdal_import",
           "transpose_to_rowmajor"]


def transpose_to_rowmajor(vis, cp_index, time_col: str = "time",
                          cp_col: str = "corrprod",
                          data_col: str = "data"):
    """(time, corrprod)-keyed chan-arrays -> MSv2 row-major layout
    (time, antenna1, antenna2) with ``data[chan][corr]``.

    The reference does this with a numba kernel over dense blocks
    (daskms/experimental/katdal/transpose.py:34-131); here it is a
    declarative regroup, fully JVM-side: broadcast-join the tiny
    corrprod index (corrprod -> antenna1, antenna2, corr), shuffle
    once keyed on the output row identity (time, baseline), and build
    the (chan, corr) nested array with higher-order functions —
    ``collect_list`` of corr-tagged chan-arrays, corr-sorted, then a
    nested ``transform`` flips to chan-major.  Scales with the number
    of output rows; no dense intermediate ever materialises.

    ``cp_index`` columns: ``corrprod, antenna1, antenna2, corr``.
    """
    from pyspark.sql import functions as F

    joined = vis.join(F.broadcast(cp_index), cp_col)
    per_row = (joined.groupBy(time_col, "antenna1", "antenna2")
               .agg(F.array_sort(F.collect_list(F.struct(
                    F.col("corr"),
                    F.col(data_col).alias("v")))).alias("cs")))
    nchan = F.size(F.col("cs")[0]["v"])
    chan_major = F.transform(
        F.sequence(F.lit(0), nchan - F.lit(1)),
        lambda ch: F.transform(F.col("cs"), lambda s: s["v"][ch]))
    return per_row.select(time_col, "antenna1", "antenna2",
                          chan_major.alias(data_col))


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
