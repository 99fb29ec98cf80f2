"""Write-semantics tests (reference S7: create/update/append + schema
evolution — daskms/writes.py:258-490)."""

import os

import pytest
from pyspark.sql import functions as F

from dask_ms_spark.operators.grouping import column_update, update_write
from dask_ms_spark.sources.parquet import xds_to_parquet
from tests.conftest import SF_DIR


def test_append_mode(spark, nation, tmp_path):
    """S7 append (daskms/writes.py:352-490): rows without ROWIDs append
    after existing data."""
    store = str(tmp_path / "appends")
    xds_to_parquet(nation, store)
    extra = nation.withColumn("n_nationkey", F.col("n_nationkey") + 100)
    xds_to_parquet(extra, store, mode="append")
    back = spark.read.parquet(store)
    assert back.count() == 2 * nation.count()
    assert back.where("n_nationkey >= 100").count() == nation.count()


def test_schema_evolution_add_column(spark, nation, tmp_path):
    """S7 add-missing-columns (daskms/writes.py:311-349): appending a
    frame with a new column; mergeSchema surfaces the union schema."""
    store = str(tmp_path / "evolve")
    xds_to_parquet(nation, store)
    widened = nation.withColumn("population", F.lit(1000000).cast("long")) \
                    .withColumn("n_nationkey", F.col("n_nationkey") + 100)
    xds_to_parquet(widened, store, mode="append")
    back = spark.read.option("mergeSchema", "true").parquet(store)
    assert "population" in back.columns
    assert back.where("population IS NOT NULL").count() == nation.count()
    assert back.where("population IS NULL").count() == nation.count()


def test_update_write_roundtrip(spark, orders, tmp_path):
    """S7 column-granular update: read-merge-write produces the base
    table with only the targeted column/rows changed."""
    store = str(tmp_path / "updated")
    base = orders.withColumn("ROWID", F.col("o_orderkey"))
    updates = base.where("o_orderstatus = 'F'") \
                  .select("ROWID", F.lit(0.0).alias("o_totalprice"))
    merged = update_write(base, updates, ["ROWID", "o_totalprice"])
    xds_to_parquet(merged, store)
    back = spark.read.parquet(store)
    n_f = orders.where("o_orderstatus = 'F'").count()
    assert back.where("o_totalprice = 0.0").count() == n_f
    assert back.count() == orders.count()
    # untouched columns byte-identical
    orig = {r.ROWID: r.o_orderpriority for r in base.select(
        "ROWID", "o_orderpriority").collect()}
    assert all(orig[r.ROWID] == r.o_orderpriority
               for r in back.select("ROWID", "o_orderpriority").collect())


def test_column_update_mapping(spark, nation):
    """Broadcast-mapping column update (putcol analogue)."""
    mapping = spark.createDataFrame(
        [(0, "ZERO"), (1, "ONE")], ["key", "new_name"])
    out = column_update(nation, "n_nationkey", "n_name",
                        mapping, "key", "new_name")
    got = {r.n_nationkey: r.n_name for r in out.collect()}
    assert got[0] == "ZERO" and got[1] == "ONE"
    orig = {r.n_nationkey: r.n_name for r in nation.collect()}
    assert all(got[k] == orig[k] for k in orig if k not in (0, 1))


def test_ratt_ms_descriptor_builder():
    """ratt_ms = ms + int-typed BITFLAG columns when present; without
    them the two builders agree exactly (the reference
    _maybe_fix_column contract)."""
    from pyspark.sql.types import (ArrayType, DoubleType, LongType,
                                   StructField, StructType)

    from dask_ms_spark.sources.descriptors import resolve_descriptor

    plain = StructType([StructField("TIME", LongType())])
    assert resolve_descriptor("ratt_ms", plain) == \
        resolve_descriptor("ms", plain)

    # double-typed frame columns would stay double under "ms";
    # ratt_ms fixes the bitflag pair to the canonical int
    with_bf = StructType([
        StructField("TIME", LongType()),
        StructField("BITFLAG", ArrayType(DoubleType())),
        StructField("BITFLAG_ROW", DoubleType())])
    d = resolve_descriptor("ratt_ms", with_bf)
    assert d["BITFLAG"]["valueType"] == "int"
    assert d["BITFLAG_ROW"]["valueType"] == "int"
    # the plain builder leaves the schema-derived type alone
    d0 = resolve_descriptor("ms", with_bf)
    assert d0["BITFLAG"]["valueType"] != "int"


def test_casa_update_reassembles_complex_and_tensor(spark):
    """The update path must consult the TARGET column descriptors:
    interleaved re/im floats recombine to complex and flat tensors
    reshape to the cell shape before putcol (review r8 — they were
    putcol'd as flat float blocks)."""
    import numpy as np
    from pyspark.sql import Row

    from dask_ms_spark.dataset import Dataset
    from dask_ms_spark.sources.casa import xds_to_casa

    calls = []

    class FakeWritable:
        def getcoldesc(self, c):
            if c == "DATA":
                return {"valueType": "COMPLEX", "shape": (2, 2)}
            if c == "UVW":
                return {"valueType": "DOUBLE", "shape": (3,)}
            return {"valueType": "INT"}

        def putcol(self, c, vals, lo, n):
            calls.append((c, np.asarray(vals).shape,
                          np.asarray(vals).dtype.kind, lo, n))

        def close(self):
            pass

    df = spark.createDataFrame(
        [Row(ROWID=i,
             DATA=[float(i), 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0],
             UVW=[1.0 * i, 2.0, 3.0],
             SC=i)
         for i in range(4)])
    n = xds_to_casa([Dataset(df, {})], "/fake",
                    table_factory=lambda p: FakeWritable())
    assert n == 4
    by_col = {c: (shape, kind) for c, shape, kind, _, _ in calls}
    assert by_col["DATA"] == ((4, 2, 2), "c")     # complex, reshaped
    assert by_col["UVW"] == ((4, 3), "f")         # tensor cell shape
    assert by_col["SC"][1] == "i"                 # scalar untouched
