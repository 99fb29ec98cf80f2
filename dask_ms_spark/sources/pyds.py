"""Python DataSource V2 registration for the zarr store (reference S3).

``xds_from_zarr`` is the dataset-list API (one Dataset per
``{table}_{i}`` group, the reference's read surface —
daskms/experimental/zarr/__init__.py:380-528).  This module exposes the
SAME chunk-reading kernel through PySpark 4's ``pyspark.sql.datasource``
API, so a zarr group is a first-class relational source:

    spark.dataSource.register(ZarrDataSource)
    df = (spark.read.format("zarr")
          .option("group", "MAIN_0")         # optional when unambiguous
          .option("columns", "TIME,DATA")    # optional projection
          .load("/path/to/store.zarr"))

Scale shape — identical to ``xds_from_zarr``: the driver touches only
the JSON metadata (``.zarray``/``.zattrs``); ``partitions()`` emits one
``InputPartition`` per row-chunk so a 1000-executor cluster reads 1000
chunks concurrently; ``read()`` runs executor-side and yields Arrow
record batches (one language crossing per chunk).  ``pushFilters``
accepts ROWID range/equality predicates and prunes whole chunk
partitions at plan time — the Python-source analogue of parquet
row-group pruning (reference row-run selection, daskms/ordering.py:18-57).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    EqualTo, Filter, GreaterThan,
                                    GreaterThanOrEqual, InputPartition,
                                    LessThan, LessThanOrEqual)
from pyspark.sql.types import (ArrayType, LongType, StructField,
                               StructType)

from ..types import ROWID
from .zarr import _group_dirs, _np_to_spark, _read_cell_chunks, _read_json

__all__ = ["ZarrDataSource", "register_python_sources"]


def _resolve_group(path: str, group: str | None) -> str:
    groups = _group_dirs(path)
    if not groups:
        # a bare group directory (arrays directly under path)
        if os.path.exists(os.path.join(path, ".zgroup")):
            return path
        raise ValueError(f"no zarr groups under {path}")
    if group is None:
        if len(groups) > 1:
            raise ValueError(
                f"store has {len(groups)} groups {groups[:4]}...; pass "
                ".option('group', <name>) — the multi-dataset surface "
                "is xds_from_zarr")
        return os.path.join(path, groups[0])
    if group not in groups:
        raise KeyError(f"group {group!r} not in {groups}")
    return os.path.join(path, group)


def _load_arrays(group_dir: str, columns: list[str] | None) -> dict:
    arrays = {}
    for name in sorted(os.listdir(group_dir)):
        zpath = os.path.join(group_dir, name, ".zarray")
        if os.path.exists(zpath):
            arrays[name] = _read_json(zpath)
    if columns is not None:
        missing = set(columns) - set(arrays)
        if missing:
            raise KeyError(f"columns not in store: {sorted(missing)}")
        arrays = {c: arrays[c] for c in columns}
    if not arrays:
        raise ValueError(f"no zarr arrays under {group_dir}")
    compressed = [c for c, z in arrays.items()
                  if z.get("compressor") is not None
                  or z.get("filters") not in (None, [])]
    if compressed:
        raise NotImplementedError(
            f"compressed arrays {compressed[:3]} need the zarr package "
            "path (xds_from_zarr) or parquet conversion")
    return arrays


@dataclass
class _ChunkPartition(InputPartition):
    chunk_index: int


class ZarrReader(DataSourceReader):
    """One partition per row-chunk; ROWID predicates prune chunks."""

    def __init__(self, path: str, group: str | None,
                 columns: list[str] | None):
        self.group_dir = _resolve_group(path, group)
        self.arrays = _load_arrays(self.group_dir, columns)
        shapes = {c: z["shape"] for c, z in self.arrays.items()}
        nrows = {s[0] for s in shapes.values()}
        if len(nrows) != 1:
            raise ValueError(f"row-count mismatch: {shapes}")
        self.nrow = nrows.pop()
        row_chunks = {z["chunks"][0] for z in self.arrays.values()}
        if len(row_chunks) != 1:
            raise ValueError("arrays disagree on row chunking")
        self.row_chunk = row_chunks.pop()
        # ROWID bounds narrowed by pushed filters (inclusive)
        self.lo_bound = 0
        self.hi_bound = max(self.nrow - 1, 0)

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Prune chunk partitions from ROWID range predicates; every
        pushed filter is FULLY handled (rows outside the bound never
        leave the reader), so it is consumed, not re-evaluated."""
        for f in filters:
            if getattr(f, "attribute", None) != (ROWID,):
                yield f
                continue
            v = f.value
            if isinstance(f, EqualTo):
                self.lo_bound = max(self.lo_bound, int(v))
                self.hi_bound = min(self.hi_bound, int(v))
            elif isinstance(f, GreaterThan):
                self.lo_bound = max(self.lo_bound, int(v) + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo_bound = max(self.lo_bound, int(v))
            elif isinstance(f, LessThan):
                self.hi_bound = min(self.hi_bound, int(v) - 1)
            elif isinstance(f, LessThanOrEqual):
                self.hi_bound = min(self.hi_bound, int(v))
            else:
                yield f

    def partitions(self):
        first = self.lo_bound // self.row_chunk
        last = self.hi_bound // self.row_chunk
        n_chunks = max(1, (self.nrow + self.row_chunk - 1)
                       // self.row_chunk)
        return [_ChunkPartition(ci)
                for ci in range(max(0, first),
                                min(n_chunks, last + 1))]

    def read(self, partition: _ChunkPartition):
        import pyarrow as pa

        ci = partition.chunk_index
        lo = ci * self.row_chunk
        hi = min(self.nrow, lo + self.row_chunk)
        rowid = np.arange(lo, hi, dtype=np.int64)
        # apply the residual of the pushed ROWID bounds inside the
        # boundary chunks
        keep = (rowid >= self.lo_bound) & (rowid <= self.hi_bound)
        cols: dict[str, pa.Array] = {
            ROWID: pa.array(rowid[keep], type=pa.int64())}
        for c, z in self.arrays.items():
            arr = _read_cell_chunks(self.group_dir, c, z, ci,
                                    hi - lo, None)[keep]
            if arr.ndim > 1:
                cols[c] = pa.array(list(arr))
            elif arr.dtype.kind == "M":
                cols[c] = pa.array(arr.astype("datetime64[us]"))
            else:
                cols[c] = pa.array(arr)
        yield pa.RecordBatch.from_pydict(cols)


class ZarrDataSource(DataSource):
    """``spark.read.format("zarr")`` over the repo's zarr-v2 store
    layout.  Options: ``group`` (required when the store holds several
    ``{table}_{i}`` groups), ``columns`` (comma-separated projection)."""

    @classmethod
    def name(cls) -> str:
        return "zarr"

    def _reader_args(self):
        path = self.options.get("path")
        if not path:
            raise ValueError("load(path) is required for format('zarr')")
        group = self.options.get("group")
        columns = self.options.get("columns")
        cols = ([c.strip() for c in columns.split(",") if c.strip()]
                if columns else None)
        return path, group, cols

    def schema(self) -> StructType:
        path, group, cols = self._reader_args()
        arrays = _load_arrays(_resolve_group(path, group), cols)
        fields = [StructField(ROWID, LongType(), False)]
        for c, z in arrays.items():
            t = _np_to_spark(z["dtype"])
            fields.append(StructField(
                c, ArrayType(t) if len(z["shape"]) > 1 else t))
        return StructType(fields)

    def reader(self, schema: StructType) -> ZarrReader:
        path, group, cols = self._reader_args()
        return ZarrReader(path, group, cols)


def register_python_sources(spark) -> None:
    """Register every Python DataSource this package provides."""
    spark.dataSource.register(ZarrDataSource)
