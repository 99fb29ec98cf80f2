"""Deterministic MS-shaped example tables (reference parity:
daskms/example_data.py:12-124 and the conftest fixtures,
daskms/conftest.py:89-235; schemas specified in FIXTURES.md).

Encodings follow types.py: complex tensors are flat
``ArrayType(FloatType)`` with re/im interleaved (stride 2) and
``dims``/``shape`` in field metadata; every table carries ``ROWID``.
All random values use numpy ``RandomState(42)`` per FIXTURES.md.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (DoubleType, FloatType, IntegerType, LongType,
                               StringType, StructField, StructType)

from .types import ROWID, tensor_field

__all__ = ["ms_main_table", "spectral_window_table", "antenna_table",
           "example_ms"]


def _complex_flat(rng: np.random.RandomState, chan: int, corr: int) -> list:
    """One row's complex (chan, corr) tensor, flattened re/im stride 2."""
    re = rng.uniform(size=(chan, corr)).astype(np.float32)
    im = rng.uniform(size=(chan, corr)).astype(np.float32)
    return [float(v) for pair in zip(re.ravel(), im.ravel()) for v in pair]


def ms_main_table(spark: SparkSession, chan: int = 16,
                  corr: int = 4) -> DataFrame:
    """The 10-row main-table fixture (daskms/conftest.py:89-144 shape;
    FIXTURES.md §1)."""
    rng = np.random.RandomState(42)
    field_id = [0, 0, 0, 1, 1, 1, 1, 2, 2, 2]
    ddid = [0, 0, 0, 0, 0, 0, 0, 1, 1, 1]
    scan = [0, 1, 0, 1, 0, 1, 0, 1, 0, 1]
    time = [1.0, 0.9, 0.8, 0.7, 0.6, 0.5, 0.4, 0.3, 0.2, 0.1]
    ant1 = [0, 0, 1, 1, 1, 2, 1, 0, 0, 1]
    ant2 = [1, 2, 2, 3, 2, 1, 0, 1, 1, 2]
    rows = []
    for i in range(10):
        rows.append((
            i, field_id[i], ddid[i], scan[i], 0, time[i], ant1[i], ant2[i],
            [float(v) for v in rng.uniform(size=3)],
            _complex_flat(rng, chan, corr)))
    schema = StructType([
        StructField(ROWID, LongType(), False),
        StructField("FIELD_ID", IntegerType(), False),
        StructField("DATA_DESC_ID", IntegerType(), False),
        StructField("SCAN_NUMBER", IntegerType(), False),
        StructField("STATE_ID", IntegerType(), False),
        StructField("TIME", DoubleType(), False),
        StructField("ANTENNA1", IntegerType(), False),
        StructField("ANTENNA2", IntegerType(), False),
        tensor_field("UVW", DoubleType(), dims=("uvw",), shape=(3,)),
        tensor_field("DATA", FloatType(), dims=("chan", "corr"),
                     shape=(chan, corr)),
    ])
    return spark.createDataFrame(rows, schema)


def spectral_window_table(spark: SparkSession,
                          num_chans=(8, 16, 32)) -> DataFrame:
    """Ragged SPECTRAL_WINDOW subtable (daskms/conftest.py:147-186;
    FIXTURES.md §3): per-row channel counts, natively ragged arrays."""
    rows = []
    for i, nc in enumerate(num_chans):
        freqs = np.linspace(0.856e9, 2 * 0.856e9, nc)
        rows.append((i, int(nc), [float(f) for f in freqs]))
    schema = StructType([
        StructField(ROWID, LongType(), False),
        StructField("NUM_CHAN", IntegerType(), False),
        tensor_field("CHAN_FREQ", DoubleType(), dims=("chan",)),
    ])
    return spark.createDataFrame(rows, schema)


def antenna_table(spark: SparkSession, n: int = 14) -> DataFrame:
    """ANTENNA dimension subtable (daskms/conftest.py:189-235 shape)."""
    rng = np.random.RandomState(42)
    rows = [(i, [float(v) for v in 3.8e6 + rng.uniform(size=3) * 1e3],
             f"ANTENNA-{i}") for i in range(n)]
    schema = StructType([
        StructField(ROWID, LongType(), False),
        tensor_field("POSITION", DoubleType(), dims=("xyz",), shape=(3,)),
        StructField("NAME", StringType(), False),
    ])
    return spark.createDataFrame(rows, schema)


def example_ms(spark: SparkSession) -> dict[str, DataFrame]:
    """Multi-SPW/multi-pol star schema (daskms/example_data.py:12-124;
    FIXTURES.md §5): main (variably shaped DATA per DDID) + subtables.
    """
    rng = np.random.RandomState(42)
    ddid_of_row = [0, 0, 0, 1, 1, 1, 1, 1, 1, 1]  # 3 + 7 split
    shapes = {0: (16, 4), 1: (32, 2)}
    main_rows = []
    for i, dd in enumerate(ddid_of_row):
        chan, corr = shapes[dd]
        main_rows.append((i, i % 2, dd, float(i),
                          [float(v) for v in rng.uniform(size=3)],
                          _complex_flat(rng, chan, corr)))
    main_schema = StructType([
        StructField(ROWID, LongType(), False),
        StructField("FIELD_ID", IntegerType(), False),
        StructField("DATA_DESC_ID", IntegerType(), False),
        StructField("TIME", DoubleType(), False),
        tensor_field("UVW", DoubleType(), dims=("uvw",), shape=(3,)),
        tensor_field("DATA", FloatType(), dims=("chan", "corr")),
    ])
    spw = spark.createDataFrame(
        [(0, 16, [float(f) for f in np.linspace(0.856e9, 1.712e9, 16)]),
         (1, 32, [float(f) for f in np.linspace(0.856e9, 1.712e9, 32)])],
        StructType([
            StructField(ROWID, LongType(), False),
            StructField("NUM_CHAN", IntegerType(), False),
            tensor_field("CHAN_FREQ", DoubleType(), dims=("chan",)),
        ]))
    pol = spark.createDataFrame(
        [(0, 4, [9, 10, 11, 12]), (1, 2, [9, 12])],
        StructType([
            StructField(ROWID, LongType(), False),
            StructField("NUM_CORR", IntegerType(), False),
            tensor_field("CORR_TYPE", IntegerType(), dims=("corr",)),
        ]))
    ddid = spark.createDataFrame(
        [(0, 0, 0), (1, 1, 1)],
        StructType([
            StructField(ROWID, LongType(), False),
            StructField("SPECTRAL_WINDOW_ID", IntegerType(), False),
            StructField("POLARIZATION_ID", IntegerType(), False),
        ]))
    field = spark.createDataFrame(
        [(0, "FIELD-0", [0.1, -0.5]), (1, "FIELD-1", [0.2, -0.6])],
        StructType([
            StructField(ROWID, LongType(), False),
            StructField("NAME", StringType(), False),
            tensor_field("PHASE_DIR", DoubleType(), dims=("radec",),
                         shape=(2,)),
        ]))
    return {"MAIN": spark.createDataFrame(main_rows, main_schema),
            "SPECTRAL_WINDOW": spw, "POLARIZATION": pol,
            "DATA_DESCRIPTION": ddid, "FIELD": field,
            "ANTENNA": antenna_table(spark, 64)}
