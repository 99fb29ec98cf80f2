"""Python DataSource V2 surface (sources/pyds.py): the zarr store as
``spark.read.format("zarr")`` — schema inference, Arrow-batch reads,
ROWID chunk pruning via pushFilters, and option handling."""

import pytest
from pyspark.sql import functions as F

from dask_ms_spark.sources.pyds import (ZarrDataSource, ZarrReader,
                                        register_python_sources)
from dask_ms_spark.sources.zarr import xds_to_zarr


@pytest.fixture()
def store(spark, tmp_path):
    df = spark.range(25_000).select(
        F.col("id").alias("ROWID"),
        (F.col("id") * 2.0).alias("TIME"),
        F.array(F.col("id").cast("double"),
                (F.col("id") + 1).cast("double")).alias("UVW"))
    path = str(tmp_path / "t.zarr")
    xds_to_zarr(df, path)
    register_python_sources(spark)
    return path


def test_format_zarr_roundtrip(spark, store):
    r = spark.read.format("zarr").load(store)
    assert r.schema.simpleString() == \
        "struct<ROWID:bigint,TIME:double,UVW:array<double>>"
    assert r.count() == 25_000
    row = r.where("ROWID = 12345").collect()[0]
    assert row.TIME == 24_690.0 and row.UVW == [12345.0, 12346.0]


def test_format_zarr_filter_pushdown_values(spark, store):
    out = (spark.read.format("zarr").load(store)
           .where("ROWID >= 20000 AND ROWID < 20010"))
    got = [r.ROWID for r in out.collect()]
    assert got == list(range(20_000, 20_010))


def test_reader_prunes_chunk_partitions(store):
    from pyspark.sql.datasource import (GreaterThanOrEqual, LessThan,
                                        StringStartsWith)

    r = ZarrReader(store + "/MAIN_0", None, None)
    n_all = len(r.partitions())
    assert n_all == 3  # 25k rows / 10k default chunk
    unsupported = list(r.pushFilters([
        GreaterThanOrEqual(("ROWID",), 20_000),
        LessThan(("ROWID",), 20_010),
        StringStartsWith(("TIME",), "x"),   # not ours -> handed back
    ]))
    assert len(unsupported) == 1
    assert len(r.partitions()) == 1  # only the chunk holding 20k-20009


def test_columns_option_and_errors(spark, store):
    proj = (spark.read.format("zarr")
            .option("columns", "TIME").load(store))
    assert proj.columns == ["ROWID", "TIME"]
    assert proj.count() == 25_000
    with pytest.raises(Exception, match="not in store"):
        spark.read.format("zarr").option("columns", "NOPE") \
            .load(store).collect()


def test_multigroup_requires_group_option(spark, orders, tmp_path):
    from dask_ms_spark.dataset import partition_datasets

    path = str(tmp_path / "m.zarr")
    parts = partition_datasets(
        orders.select("o_orderkey", "o_totalprice", "o_orderpriority")
              .withColumn("ROWID", F.col("o_orderkey")),
        ["o_orderpriority"])
    xds_to_zarr(parts, path)
    with pytest.raises(Exception, match="group"):
        spark.read.format("zarr").load(path).collect()
    groups = sorted(
        d.name for d in __import__("pathlib").Path(path).iterdir()
        if d.is_dir())
    one = (spark.read.format("zarr").option("group", groups[0])
           .load(path))
    assert one.count() > 0
