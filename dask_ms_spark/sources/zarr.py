"""Zarr source/sink (reference S3/S8).

The reference reads/writes zarr groups ``{table}_{i}`` per partition
with chunk-aligned getters/setters
(daskms/experimental/zarr/__init__.py:129-157, :209-217, :270-364,
:380-528).  This module implements the same store layout as a **zarr
v2 directory store** using numpy + stdlib only, so the round trip
runs (and is tested) without the zarr package: uncompressed chunks
(``compressor: null``) plus the stdlib-codable codecs
``{"id": "zlib"}`` / ``{"id": "gzip"}``; stores it writes are
standard zarr v2 and open unchanged with ``zarr.open_group`` when
the package is present.

Execution model — the part the reference does with dask, re-expressed
Spark-side:

* **write**: rows are keyed by ``ROWID // row_chunk`` and routed to
  one task per chunk (``applyInPandas``); every task writes its own
  chunk files for all columns.  The driver only writes the tiny JSON
  metadata (``.zgroup``/``.zarray``/``.zattrs``) — mirroring the
  reference's eager DDL step — never the data.
* **read**: the driver reads only the JSON metadata, then
  ``mapInPandas`` over a ``spark.range(n_chunks)`` frame loads chunk
  files on executors — the analogue of the reference's per-chunk
  ``zarr_getter`` (daskms/experimental/zarr/__init__.py:367-372).  No
  full-table driver materialisation on any path.

Third-party stores with other codecs (blosc, ...) or filters are
read through the zarr package when installed (still chunk-at-a-time
on executors); without it they raise with the parquet conversion
path as the remedy.
"""

from __future__ import annotations

import json
import os
from typing import Iterable

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BooleanType, DataType, DoubleType,
                               FloatType, IntegerType, LongType, ShortType,
                               StringType, StructField, StructType,
                               TimestampType)

from ..dataset import Dataset
from ..types import PARTITION_KEY, ROWID

try:  # pragma: no cover - zarr absent in this environment
    import zarr as _zarr  # type: ignore

    HAVE_ZARR = True
except Exception:  # pragma: no cover
    _zarr = None
    HAVE_ZARR = False

__all__ = ["HAVE_ZARR", "xds_from_zarr", "xds_to_zarr",
           "rechunk_by_size"]

# element byte widths for the budget calculation (strings measured
# per store: zarr v2 fixed-width unicode is 4 bytes/char)
_ELEM_BYTES = {"boolean": 1, "tinyint": 1, "smallint": 2, "int": 4,
               "bigint": 8, "float": 4, "double": 8}


def rechunk_by_size(df: DataFrame, max_chunk_mem: int = 2 ** 27,
                    unchunked_cols: Iterable[str] = ()
                    ) -> tuple[int, dict]:
    """Derive ``(row_chunk, cell_chunks)`` so every chunk file this
    writer emits stays under ``max_chunk_mem`` bytes — the byte-budget
    default that prevents 2 GiB-class chunk mistakes (reference
    ``rechunk_by_size``, daskms/experimental/utils.py:126-218; same
    contract, re-expressed for this writer's (row, flat-cell) chunk
    grid).

    One metadata-only aggregation measures array cell widths and max
    string lengths (data never hits the driver).  The row chunk is
    shared across columns (zarr rows are co-chunked so groups stay
    slab-aligned): it is the largest row count that keeps every
    non-splittable column's block under budget; array columns whose
    block still exceeds the budget at that row chunk get a
    ``cell_chunks`` entry splitting the cell axis.  ``unchunked_cols``
    opts columns out of cell splitting (they then bound the row chunk
    instead; a single cell larger than the budget raises).
    """
    if max_chunk_mem < 1:
        raise ValueError(f"max_chunk_mem must be >= 1, "
                         f"got {max_chunk_mem}")
    unchunked = set(unchunked_cols)
    fields = [f for f in df.schema.fields if f.name != ROWID]
    aggs = []
    for f in fields:
        if isinstance(f.dataType, ArrayType):
            aggs.append(F.max(F.size(f.name)).alias(f"__w_{f.name}"))
            if isinstance(f.dataType.elementType, StringType):
                aggs.append(F.max(F.array_max(F.transform(
                    F.col(f.name), F.length))).alias(f"__sl_{f.name}"))
        elif isinstance(f.dataType, StringType):
            aggs.append(F.max(F.length(f.name)).alias(f"__sl_{f.name}"))
    meta = df.agg(*aggs).first() if aggs else {}

    def itemsize(f) -> int:
        t = (f.dataType.elementType if isinstance(f.dataType, ArrayType)
             else f.dataType)
        s = t.simpleString()
        if s == "string":
            return 4 * max(1, int(meta[f"__sl_{f.name}"] or 1))
        if s == "timestamp":
            return 8
        if s not in _ELEM_BYTES:
            raise ValueError(f"rechunk_by_size: unsupported element "
                             f"type {s!r} for column {f.name}")
        return _ELEM_BYTES[s]

    row_bound = None
    widths, sizes = {}, {}
    for f in fields:
        isz = itemsize(f)
        w = (max(1, int(meta[f"__w_{f.name}"] or 1))
             if isinstance(f.dataType, ArrayType) else 1)
        widths[f.name], sizes[f.name] = w, isz
        splittable = (isinstance(f.dataType, ArrayType)
                      and f.name not in unchunked)
        if w * isz > max_chunk_mem:
            # one row exceeds the budget: only a cell split can help,
            # so the ROW chunk must drop to 1 (dividing by isz alone
            # ignored the row width and produced a huge row_chunk —
            # guaranteed OOM in exactly this branch; review r8)
            if not splittable:
                raise ValueError(
                    f"rechunk_by_size: one row of column {f.name!r} "
                    f"is {w * isz} bytes, over the {max_chunk_mem}-"
                    "byte budget, and the column is not cell-"
                    "splittable — raise the budget or allow splitting")
            bound = max(1, max_chunk_mem // (w * isz))
        else:
            # whole cells preferred: splits only happen when a single
            # row cannot fit (slab-aligned reads stay cheap)
            bound = max_chunk_mem // (w * isz)
        row_bound = bound if row_bound is None else min(row_bound,
                                                        bound)
    row_chunk = max(1, row_bound if row_bound is not None
                    else max_chunk_mem)
    cell_chunks = {}
    for f in fields:
        w, isz = widths[f.name], sizes[f.name]
        if (isinstance(f.dataType, ArrayType)
                and f.name not in unchunked
                and row_chunk * w * isz > max_chunk_mem):
            cell_chunks[f.name] = max(1, max_chunk_mem
                                      // (row_chunk * isz))
    return row_chunk, cell_chunks

DEFAULT_ROW_CHUNK = 10_000  # reference default chunking (daskms/reads.py:33)

_SPARK_TO_NP = {
    "boolean": "|b1",
    "smallint": "<i2",
    "int": "<i4",
    "bigint": "<i8",
    "float": "<f4",
    "double": "<f8",
    "timestamp": "<M8[us]",
}

_NP_TO_SPARK: dict[str, DataType] = {
    "|b1": BooleanType(),
    "<i2": ShortType(),
    "<i4": IntegerType(),
    "<i8": LongType(),
    "<f4": FloatType(),
    "<f8": DoubleType(),
    "<M8[us]": TimestampType(),
}


def _np_to_spark(dtype: str) -> DataType:
    if dtype in _NP_TO_SPARK:
        return _NP_TO_SPARK[dtype]
    if dtype.startswith("<U"):
        return StringType()
    raise NotImplementedError(f"unsupported zarr dtype {dtype!r}")


def _fill_value(dtype: str):
    if dtype.startswith("<U"):
        return ""
    if dtype == "|b1":
        return False
    if dtype.startswith("<M8"):
        return 0
    return 0


def _write_json(path: str, obj) -> None:
    with open(path, "w") as fh:
        json.dump(obj, fh, indent=2, sort_keys=True)


def _read_json(path: str):
    with open(path) as fh:
        return json.load(fh)


# ---------------------------------------------------------------------------
# write


def _column_plan(df: DataFrame, max_strlen: dict[str, int],
                 widths: dict[str, int]) -> dict[str, dict]:
    """Per-column zarr array plan: numpy dtype + per-row width
    (None = scalar column, int = flat tensor width)."""
    plan: dict[str, dict] = {}
    for f in df.schema.fields:
        if f.name == ROWID:
            continue
        dt = f.dataType
        if isinstance(dt, ArrayType):
            elem = dt.elementType.simpleString()
            if elem not in _SPARK_TO_NP:
                raise NotImplementedError(
                    f"array column {f.name}: element {elem} unsupported")
            plan[f.name] = {"dtype": _SPARK_TO_NP[elem],
                            "width": widths[f.name]}
        elif isinstance(dt, StringType):
            n = max(1, max_strlen.get(f.name, 1))
            plan[f.name] = {"dtype": f"<U{n}", "width": None}
        else:
            simple = dt.simpleString()
            if simple not in _SPARK_TO_NP:
                raise NotImplementedError(
                    f"column {f.name}: type {simple} unsupported by the "
                    "zarr adapter; encode it (complex -> interleaved "
                    "floats, types.complex_array_type) first")
            plan[f.name] = {"dtype": _SPARK_TO_NP[simple], "width": None}
    return plan


def _write_group(df: DataFrame, group_dir: str, attrs: dict,
                 row_chunk: int,
                 cell_chunks: dict | None = None,
                 compressor: dict | None = None) -> int:
    """Write one dataset as one zarr group; returns rows written.

    ``cell_chunks`` maps a tensor column to a chunk size along its
    cell (width) axis; the column's chunk files become
    ``{ci}.{j}`` slabs so sliced readers (:func:`_read_cell_chunks`)
    can prune whole files.  Default: one cell chunk (``{ci}.0``).

    ``compressor`` (zarr v2 codec dict) supports the stdlib-codable
    codecs: ``{"id": "zlib", "level": N}`` (numcodecs raw-zlib) and
    ``{"id": "gzip", "level": N}`` — compressed stores round-trip
    with no zarr package on either side, and any standard zarr v2
    reader opens them.
    """
    cell_chunks = dict(cell_chunks or {})
    if compressor is not None:
        if compressor.get("id") not in ("zlib", "gzip"):
            raise NotImplementedError(
                f"compressor {compressor!r}: only the stdlib codecs "
                "zlib/gzip are supported without the zarr package")
    if ROWID not in df.columns:
        from ..operators.ordering import attach_rowid

        df = attach_rowid(df, [c for c in df.columns],
                          stable=True)

    # one small metadata aggregation: row count, null check, ragged-
    # tensor check, string widths (the eager-DDL analogue; data never
    # hits driver)
    aggs = [F.count(F.lit(1)).alias("__n"),
            F.min(ROWID).alias("__rid_lo"),
            F.max(ROWID).alias("__rid_hi"),
            F.countDistinct(ROWID).alias("__rid_n")]
    arr_cols = [f.name for f in df.schema.fields
                if isinstance(f.dataType, ArrayType)]
    str_cols = [f.name for f in df.schema.fields
                if isinstance(f.dataType, StringType)]
    data_cols = [f.name for f in df.schema.fields if f.name != ROWID]
    for c in arr_cols:
        aggs += [F.min(F.size(c)).alias(f"__lo_{c}"),
                 F.max(F.size(c)).alias(f"__hi_{c}")]
    for c in str_cols:
        aggs.append(F.max(F.length(c)).alias(f"__sl_{c}"))
    for c in data_cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long"))
                    .alias(f"__null_{c}"))
    for c in arr_cols:
        aggs.append(F.max(F.exists(F.col(c), lambda x: x.isNull()))
                    .alias(f"__enull_{c}"))
    meta = df.agg(*aggs).first()
    nrow = int(meta["__n"])
    if nrow and (int(meta["__rid_lo"]) != 0
                 or int(meta["__rid_hi"]) != nrow - 1
                 or int(meta["__rid_n"]) != nrow):
        # the countDistinct term catches duplicate ROWIDs that happen
        # to pair with a matching gap (e.g. [0, 1, 1, 3]): min/max
        # alone pass that input while rows still scatter into wrong
        # chunks (review r9).
        # gappy/global ROWIDs (a grouped or filtered dataset keeps
        # the parent table's ids): chunk files are keyed ROWID //
        # row_chunk while the array shape is [nrow], so non-dense ids
        # would scatter rows into wrong/absent chunks and zero-fill
        # the store (review r8).  Re-densify in ROWID order — the
        # same dense-fill discipline the CASA writer applies; ROWID
        # itself is a read-side coordinate, not a stored column, so
        # nothing is lost.
        from ..operators.ordering import attach_rowid

        df = attach_rowid(
            df.withColumnRenamed(ROWID, "__src_rowid"),
            ["__src_rowid"], stable=True).drop("__src_rowid")
        # the metadata above came from an INDEPENDENT evaluation of
        # the input plan; the stable attach_rowid just pinned a
        # second one.  On a nondeterministic input those can disagree
        # (row multiset, count, widths), so recompute the aggregation
        # on the PINNED frame — shape and chunk-grid decisions must
        # describe the rows actually written (review r9).
        meta = df.agg(*aggs).first()
        nrow = int(meta["__n"])
    nulled = {c: meta[f"__null_{c}"] for c in data_cols
              if (meta[f"__null_{c}"] or 0) > 0}
    nulled.update({c: "element" for c in arr_cols
                   if meta[f"__enull_{c}"]})
    if nulled:
        raise ValueError(
            f"null values in columns {nulled} — zarr arrays are dense; "
            "fill them first (df.fillna / F.coalesce with the column's "
            "fill value)")
    widths = {}
    for c in arr_cols:
        lo, hi = meta[f"__lo_{c}"], meta[f"__hi_{c}"]
        if nrow and lo != hi:
            raise ValueError(
                f"column {c} is ragged ({lo}..{hi} elements/row); zarr "
                "arrays are rectangular — partition by the shape-defining "
                "column (e.g. DATA_DESC_ID) first, as the reference does "
                "(README.rst:100-116)")
        widths[c] = int(hi) if nrow else 0
    strlen = {c: int(meta[f"__sl_{c}"] or 1) if nrow else 1
              for c in str_cols}
    plan = _column_plan(df, strlen, widths)

    os.makedirs(group_dir, exist_ok=True)
    _write_json(os.path.join(group_dir, ".zgroup"), {"zarr_format": 2})
    _write_json(os.path.join(group_dir, ".zattrs"), attrs)
    bad_cc = set(cell_chunks) - {c for c, sp in plan.items()
                                 if sp["width"] is not None}
    if bad_cc:
        raise ValueError(
            f"cell_chunks for non-tensor columns: {sorted(bad_cc)}")
    for col, spec in plan.items():
        adir = os.path.join(group_dir, col)
        os.makedirs(adir, exist_ok=True)
        w = spec["width"]
        # zarr v2 requires POSITIVE chunk dims even for a 0-size
        # axis (review r8: chunks=[n, 0] broke zarr.open_group and
        # the slab reader's ceil-division); a 0-width tensor gets
        # cc=1 metadata and no chunk files (its chunk grid is empty)
        cc = None if w is None else \
            max(1, min(int(cell_chunks.get(col, w) or w), w)) if w \
            else 1
        spec["cc"] = cc
        zarray = {
            "zarr_format": 2,
            "shape": [nrow] if w is None else [nrow, w],
            "chunks": [row_chunk] if w is None else [row_chunk, cc],
            "dtype": spec["dtype"],
            "compressor": dict(compressor) if compressor else None,
            "fill_value": _fill_value(spec["dtype"]),
            "order": "C",
            "filters": None,
        }
        _write_json(os.path.join(adir, ".zarray"), zarray)

    if nrow == 0:
        # metadata-only store: shape [0, ...] arrays have no chunk files
        return 0

    # distributed chunk-aligned writes: one task per row chunk
    cols = list(plan)
    specs = {c: dict(plan[c]) for c in cols}
    codec_id = compressor.get("id") if compressor else None
    codec_level = int(compressor.get("level", 6)) if compressor else 0

    def encode(payload: bytes) -> bytes:
        if codec_id is None:
            return payload
        import gzip as _gz
        import zlib as _zl

        if codec_id == "gzip":
            return _gz.compress(payload, compresslevel=codec_level)
        return _zl.compress(payload, codec_level)
    chunked = df.withColumn("__chunk",
                            (F.col(ROWID) / F.lit(row_chunk))
                            .cast("long"))
    out_schema = StructType([StructField("chunk", LongType()),
                             StructField("rows", LongType())])

    def write_chunk(pdf):
        import pandas as pd

        ci = int(pdf["__chunk"].iloc[0])
        pdf = pdf.sort_values(ROWID)
        n = len(pdf)
        for col in cols:
            spec = specs[col]
            dt, w = np.dtype(spec["dtype"]), spec["width"]
            if w is None:
                arr = np.asarray(pdf[col].to_numpy(), dtype=dt)
                full = np.zeros(row_chunk, dtype=dt)
                full[:n] = arr
                key = str(ci)
                tmp = os.path.join(group_dir, col,
                                   f".{key}.tmp{os.getpid()}")
                with open(tmp, "wb") as fh:
                    fh.write(encode(
                        np.ascontiguousarray(full).tobytes()))
                os.replace(tmp, os.path.join(group_dir, col, key))
            elif w == 0:
                continue        # 0-width axis: empty chunk grid
            else:
                arr = np.stack([np.asarray(v, dtype=dt)
                                for v in pdf[col]])
                cc = spec["cc"]
                n_cc = (w + cc - 1) // cc if w else 1
                # every chunk file padded to full (row_chunk, cc),
                # the zarr v2 layout the slab reader prunes against
                full = np.zeros((row_chunk, n_cc * cc), dtype=dt)
                full[:n, :w] = arr
                for j in range(n_cc):
                    key = f"{ci}.{j}"
                    part = full[:, j * cc:(j + 1) * cc]
                    tmp = os.path.join(group_dir, col,
                                       f".{key}.tmp{os.getpid()}")
                    with open(tmp, "wb") as fh:
                        fh.write(encode(
                            np.ascontiguousarray(part).tobytes()))
                    os.replace(tmp, os.path.join(group_dir, col, key))
        return pd.DataFrame({"chunk": [ci], "rows": [n]})

    written = (chunked
               .repartition(max(1, (nrow + row_chunk - 1) // row_chunk),
                            "__chunk")
               .groupBy("__chunk").applyInPandas(write_chunk, out_schema)
               .agg(F.sum("rows")).first()[0])
    assert written == nrow, (written, nrow)
    return int(nrow)


def xds_to_zarr(datasets: list[Dataset] | Dataset | DataFrame, store: str,
                table: str = "MAIN",
                row_chunk: int = DEFAULT_ROW_CHUNK,
                cell_chunks: dict | None = None,
                compressor: dict | None = None,
                max_chunk_mem: int | None = None) -> list[int]:
    """Write datasets to a zarr store, one group ``{table}_{i}`` per
    dataset (reference ``xds_to_zarr``,
    daskms/experimental/zarr/__init__.py:270-364; group naming
    ``:129-157``).  Chunk-aligned, executor-side, uncompressed v2.
    Returns rows written per group.

    ``cell_chunks`` (column -> chunk size along the cell axis) writes
    tensor columns as multiple ``{ci}.{j}`` slab files, so later
    sliced reads (``xds_from_zarr(..., slices=...)``) prune whole
    files — choose it to match the dominant read slab (e.g. channel
    blocks of a DATA column).

    ``max_chunk_mem`` (bytes) switches to the byte-budget default:
    ``row_chunk``/``cell_chunks`` are DERIVED per dataset via
    :func:`rechunk_by_size` so no chunk file exceeds the budget
    (explicit ``row_chunk``/``cell_chunks`` are ignored when set).
    """
    if isinstance(datasets, DataFrame):
        datasets = [Dataset(datasets, {})]
    if isinstance(datasets, Dataset):
        datasets = [datasets]
    os.makedirs(store, exist_ok=True)
    _write_json(os.path.join(store, ".zgroup"), {"zarr_format": 2})
    # a rewrite with FEWER datasets must not leave the previous
    # write's higher-indexed {table}_{i} groups behind — the reader
    # enumerates groups, so stale ones would silently come back as
    # data (review r8).  Other tables' groups are untouched.
    import re as _re
    import shutil as _sh

    pat = _re.compile(_re.escape(table) + r"_\d+$")
    for d in os.listdir(store):
        if pat.fullmatch(d) and int(d.rsplit("_", 1)[1]) >= \
                len(datasets):
            _sh.rmtree(os.path.join(store, d), ignore_errors=True)
    counts = []
    for i, ds in enumerate(datasets):
        if max_chunk_mem is not None:
            row_chunk, cell_chunks = rechunk_by_size(ds.df,
                                                     max_chunk_mem)
        attrs = {}
        for k, v in ds.attrs.items():
            if k == PARTITION_KEY:
                attrs[PARTITION_KEY] = [list(p) for p in v]
            elif isinstance(v, (str, int, float, bool)) or v is None:
                attrs[k] = v
            else:
                attrs[k] = str(v)
        counts.append(_write_group(ds.df, os.path.join(store,
                                                       f"{table}_{i}"),
                                   attrs, row_chunk, cell_chunks,
                                   compressor))
    return counts


# ---------------------------------------------------------------------------
# read


def peek_array_columns(store: str) -> set[str]:
    """Names of tensor columns (>= 2-d zarr arrays, read back as
    ``ArrayType``) across every group of a LOCAL store — from
    ``.zarray`` metadata only, no chunk IO.  Used to bind the
    ``taql_where`` array aggregates without opening the data
    (storage.py's schema-deferral leg)."""
    cols: set[str] = set()
    for g in _group_dirs(store):
        gdir = os.path.join(store, g)
        for name in os.listdir(gdir):
            zpath = os.path.join(gdir, name, ".zarray")
            if os.path.exists(zpath) \
                    and len(_read_json(zpath)["shape"]) > 1:
                cols.add(name)
    return cols


def _group_dirs(store: str) -> list[str]:
    subs = sorted(
        d for d in os.listdir(store)
        if os.path.isdir(os.path.join(store, d))
        and os.path.exists(os.path.join(store, d, ".zgroup")))
    # numeric-suffix order: MAIN_2 after MAIN_1, before MAIN_10
    def order(name: str):
        base, _, idx = name.rpartition("_")
        return (base, int(idx)) if idx.isdigit() else (name, -1)

    return sorted(subs, key=order)


def _cell_slab(cell_shape: list[int],
               sl: tuple) -> list[tuple[int, int]]:
    """Normalise python slices over the cell (non-row) dims into
    inclusive-exclusive (start, stop) ranges, one per axis (missing
    trailing axes taken whole; step must be 1 — chunk pruning is about
    contiguous slabs)."""
    if len(sl) > len(cell_shape):
        raise ValueError(
            f"slice rank {len(sl)} exceeds cell rank {len(cell_shape)}")
    out = []
    for axis, dim in enumerate(cell_shape):
        s = sl[axis] if axis < len(sl) else slice(None)
        if not isinstance(s, slice):
            i = int(s)
            if i < 0:                          # python index semantics
                i += dim
            s = slice(i, i + 1)
        start, stop, step = s.indices(dim)
        if step != 1:
            raise ValueError("strided cell slices are not supported")
        if stop <= start:
            raise ValueError(f"empty slice on axis {axis}: {s}")
        out.append((start, stop))
    return out


def _read_cell_chunks(group_dir: str, col: str, z: dict, ci: int,
                      n_valid: int, slab: list | None) -> "np.ndarray":
    """Assemble one row-chunk of a column from its cell-chunk files,
    reading ONLY the cell chunks that intersect ``slab`` AND, within
    each needed chunk file, only the pages the hyperslab touches (the
    reference's blc:trc read, daskms/reads.py:58-75): files are
    ``np.memmap``-ed with the chunk's C-order shape and indexed by
    the slab directly, so an interior slab faults in just the
    overlapping pages instead of materialising the whole chunk — the
    sub-chunk byte reduction on top of round 5's whole-chunk pruning.
    A trailing partial row chunk likewise touches only its
    ``n_valid`` rows' pages.

    zarr v2 layout: chunk key ``"{ci}.{j}.{k}..."``, every file padded
    to the full chunk shape; valid extents trimmed via the memmap
    index.  zlib/gzip-codec chunks are handled natively with stdlib
    decompression (a compressed chunk is an indivisible I/O unit, so
    the slab applies AFTER decode — whole-file pruning still holds);
    other codecs (blosc, ...) take the zarr-package path in
    ``_read_group``.
    """
    cell_shape = list(z["shape"][1:])
    cell_chunks = list(z["chunks"][1:])
    dtype = np.dtype(z["dtype"])
    row_chunk = z["chunks"][0]
    if any(s == 0 for s in cell_shape):
        # 0-size axis: the chunk grid is empty (no files on disk) —
        # synthesize the empty rows directly, flattened per cell like
        # the main return below (rank >2 otherwise leaks nested cells
        # into the flat-array contract — review r9)
        out = np.zeros([n_valid] + cell_shape, dtype=dtype)
        # explicit flattened width: reshape(-1) cannot infer the
        # second axis when n_valid == 0 (size-0 array, ambiguous -1)
        return (out.reshape(n_valid, int(np.prod(cell_shape)))
                if len(cell_shape) > 1 else out)
    codec = (z.get("compressor") or {}).get("id") \
        if isinstance(z.get("compressor"), dict) else None

    def load(path: str, shape: tuple):
        if codec is None:
            return np.memmap(path, dtype=dtype, mode="r", shape=shape)
        import zlib

        with open(path, "rb") as fh:
            raw = fh.read()
        # numcodecs "zlib" = raw zlib stream; "gzip" = gzip-framed
        data = zlib.decompress(raw, 47 if codec == "gzip" else 15)
        return np.frombuffer(data, dtype=dtype).reshape(shape)

    if slab is None:
        slab = [(0, d) for d in cell_shape]
    if not cell_shape:                      # 1-d array: single file
        arr = load(os.path.join(group_dir, col, str(ci)),
                   (row_chunk,))
        return np.array(arr[:n_valid])
    out_shape = [n_valid] + [b - a for a, b in slab]
    buf = np.empty(out_shape, dtype=dtype)
    ranges = [range(a // ch, (b - 1) // ch + 1)
              for (a, b), ch in zip(slab, cell_chunks)]
    from itertools import product

    for coord in product(*ranges):
        key = ".".join([str(ci)] + [str(j) for j in coord])
        arr = load(os.path.join(group_dir, col, key),
                   tuple([row_chunk] + cell_chunks))
        src: list[slice] = [slice(0, n_valid)]
        dst: list[slice] = [slice(0, n_valid)]
        for (a, b), ch, j in zip(slab, cell_chunks, coord):
            g0, g1 = max(a, j * ch), min(b, (j + 1) * ch)
            src.append(slice(g0 - j * ch, g1 - j * ch))
            dst.append(slice(g0 - a, g1 - a))
        buf[tuple(dst)] = arr[tuple(src)]
        del arr
    # explicit flattened width (n_valid can be 0 on a fully-pruned
    # tail chunk — reshape(-1) would raise on the size-0 array)
    return (buf.reshape(n_valid, int(np.prod([b - a for a, b in slab])))
            if len(cell_shape) > 1 else buf)


def _read_group(spark: SparkSession, group_dir: str,
                columns: Iterable[str] | None = None,
                slices: dict | None = None) -> Dataset:
    attrs_path = os.path.join(group_dir, ".zattrs")
    attrs = _read_json(attrs_path) if os.path.exists(attrs_path) else {}
    if PARTITION_KEY in attrs:
        attrs[PARTITION_KEY] = tuple(
            tuple(p) for p in attrs[PARTITION_KEY])

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
    slices = dict(slices or {})
    bad = set(slices) - set(arrays)
    if bad:
        raise KeyError(f"sliced columns not in read set: {sorted(bad)}")
    slabs: dict[str, list[tuple[int, int]]] = {}
    for c, sl in slices.items():
        if len(arrays[c]["shape"]) < 2:
            raise ValueError(
                f"column {c} is scalar; slices apply to tensor "
                "columns only")
        slabs[c] = _cell_slab(arrays[c]["shape"][1:], tuple(sl))

    def _native(z: dict) -> bool:
        comp = z.get("compressor")
        if z.get("filters") not in (None, []):
            return False
        if comp is None:
            return True
        # stdlib-decodable codecs: numcodecs zlib (raw stream) and
        # gzip (framed) — read without the zarr package
        return isinstance(comp, dict) and comp.get("id") in ("zlib",
                                                             "gzip")

    compressed = [c for c, z in arrays.items() if not _native(z)]
    if compressed and not HAVE_ZARR:
        raise NotImplementedError(
            f"store {group_dir} has arrays with non-native codecs/"
            f"filters ({compressed[:3]}...) and zarr is not installed; "
            "install zarr or convert the store to parquet")

    shapes = {c: z["shape"] for c, z in arrays.items()}
    nrows = {s[0] for s in shapes.values()}
    if len(nrows) != 1:
        raise ValueError(f"row-count mismatch across arrays: {shapes}")
    nrow = nrows.pop()
    if nrow == 0:
        fields = [StructField(ROWID, LongType(), False)]
        for c, z in arrays.items():
            t = _np_to_spark(z["dtype"])
            fields.append(StructField(
                c, ArrayType(t) if len(z["shape"]) > 1 else t))
        return Dataset(spark.createDataFrame([], StructType(fields)),
                       attrs)
    row_chunks = {z["chunks"][0] for z in arrays.values()}
    if len(row_chunks) != 1:
        raise ValueError("arrays disagree on row chunking; rechunk first")
    row_chunk = row_chunks.pop()
    n_chunks = max(1, (nrow + row_chunk - 1) // row_chunk)

    fields = [StructField(ROWID, LongType(), False)]
    for c, z in arrays.items():
        t = _np_to_spark(z["dtype"])
        fields.append(StructField(
            c, ArrayType(t) if len(z["shape"]) > 1 else t))
    schema = StructType(fields)
    metas = {c: dict(arrays[c]) for c in arrays}
    use_zarr_pkg = bool(compressed)

    def read_chunks(batches):
        import pandas as pd

        zroot = _zarr.open_group(group_dir, mode="r") \
            if use_zarr_pkg else None  # pragma: no cover
        for pdf in batches:
            for ci in pdf["id"].astype(int):
                lo = ci * row_chunk
                hi = min(nrow, lo + row_chunk)
                out = {ROWID: np.arange(lo, hi, dtype=np.int64)}
                for c, z in metas.items():
                    slab = slabs.get(c)
                    if use_zarr_pkg:  # pragma: no cover
                        if slab is None:
                            arr = zroot[c][lo:hi]
                        else:      # zarr prunes cell chunks natively
                            sel = tuple(slice(a, b) for a, b in slab)
                            arr = zroot[c][(slice(lo, hi),) + sel]
                        if arr.ndim > 2:
                            arr = arr.reshape(arr.shape[0], -1)
                    else:
                        arr = _read_cell_chunks(
                            group_dir, c, z, ci, hi - lo, slab)
                    if arr.ndim > 1:
                        out[c] = list(arr)
                    elif arr.dtype.kind == "M":
                        out[c] = arr.astype("datetime64[us]")
                    else:
                        out[c] = arr
                yield pd.DataFrame(out)

    df = spark.range(n_chunks).mapInPandas(read_chunks, schema)
    return Dataset(df, attrs)


def xds_from_zarr(spark: SparkSession, store: str,
                  columns: Iterable[str] | None = None,
                  slices: dict | None = None,
                  table: str | None = None) -> list[Dataset]:
    """Read a zarr store into Datasets, one per ``{table}_{i}`` group
    (reference ``xds_from_zarr``,
    daskms/experimental/zarr/__init__.py:380-528).  Only JSON metadata
    is read on the driver; chunk data is loaded per-chunk on executors
    via ``mapInPandas``.

    ``slices`` maps a tensor column to python slices over its cell
    dims; only the cell chunks intersecting the slab are read from
    storage (see :func:`_read_cell_chunks`).

    ``table`` selects one table's groups from a multi-table store
    (``xds_to_zarr(..., table=...)`` writes ``{table}_{i}`` groups;
    without the filter a mixed store returns every table's datasets
    interleaved).
    """
    groups = _group_dirs(store)
    if table is not None:
        import re as _re

        pat = _re.compile(_re.escape(table) + r"_\d+$")
        groups = [g for g in groups if pat.fullmatch(g)]
        if not groups:
            raise FileNotFoundError(
                f"no {table}_<i> groups under {store!r}")
    if not groups:
        # a bare array group (store IS the group)
        return [_read_group(spark, store, columns, slices)]
    return [_read_group(spark, os.path.join(store, g), columns, slices)
            for g in groups]
