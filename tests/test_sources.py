"""Source/sink tests: parquet round trips, storage dispatch, convert.

Reference model: format round-trip tests
(daskms/experimental/arrow/tests/test_parquet.py,
daskms/apps/tests/test_convert.py)."""

import os

import pytest
from pyspark.sql import functions as F

from dask_ms_spark.sources.convert import convert_store, convert_table
from dask_ms_spark.sources.parquet import (read_table, xds_from_parquet,
                                           xds_to_parquet)
from dask_ms_spark.sources.storage import (TableStore, infer_format,
                                           xds_from_storage_table,
                                           xds_to_storage_table)
from tests.conftest import SF_DIR


def test_table_store_parse():
    s = TableStore.parse("/data/ms.parquet::SPECTRAL_WINDOW")
    assert s.url == "/data/ms.parquet"
    assert s.subtable == "SPECTRAL_WINDOW"
    assert s.path == "/data/ms.parquet/SPECTRAL_WINDOW"
    assert TableStore.parse("/plain").path == "/plain"


def test_infer_format(tmp_path):
    casa = tmp_path / "casa_t"
    casa.mkdir()
    (casa / "table.dat").touch()
    z = tmp_path / "z"
    z.mkdir()
    (z / ".zgroup").touch()
    assert infer_format(str(casa)) == "casa"
    assert infer_format(str(z)) == "zarr"
    assert infer_format(str(tmp_path / "whatever")) == "parquet"


def test_parquet_roundtrip_partitioned(spark, orders, tmp_path):
    store = str(tmp_path / "orders_store")
    dss = xds_from_parquet(spark, os.path.join(SF_DIR, "orders.parquet"),
                           group_cols=["o_orderstatus"])
    xds_to_parquet(dss, store)
    # Hive layout written
    assert any(d.startswith("o_orderstatus=") for d in os.listdir(store))
    back = spark.read.parquet(store)
    assert back.count() == orders.count()
    orig = sorted(tuple(r) for r in
                  orders.groupBy("o_orderstatus").count().collect())
    rt = sorted(tuple(r) for r in
                back.groupBy("o_orderstatus").count().collect())
    assert orig == rt


def test_compact_parquet_shrinks_files_and_sorts(spark, orders,
                                                 tmp_path):
    from dask_ms_spark.sources.parquet import compact_parquet

    frag_store = str(tmp_path / "fragmented")
    # simulate micro-batch debris: many tiny files
    orders.repartition(24).write.parquet(frag_store)
    n_in = sum(1 for f in os.listdir(frag_store)
               if f.endswith(".parquet"))
    assert n_in == 24
    out_store = str(tmp_path / "compacted")
    n_out = compact_parquet(spark, frag_store, out_store,
                            sort_cols=["o_orderdate"], target_files=3)
    assert n_out == 3
    back = spark.read.parquet(out_store)
    assert back.count() == orders.count()
    # range layout: per-file min/max o_orderdate ranges are disjoint
    import pyarrow.parquet as pq

    ranges = []
    for f in sorted(os.listdir(out_store)):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(out_store, f))
        idx = md.schema.names.index("o_orderdate")
        lo = min(md.row_group(i).column(idx).statistics.min
                 for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max
                 for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next


def test_storage_dispatch_roundtrip(spark, nation, tmp_path):
    store = str(tmp_path / "nation_store")
    dss = xds_from_storage_table(
        spark, os.path.join(SF_DIR, "nation.parquet"))
    xds_to_storage_table(dss, store)
    assert infer_format(store) == "parquet"
    back = xds_from_storage_table(spark, store)
    assert back[0].df.count() == nation.count()


def test_partition_pruning_on_hive_store(spark, orders, tmp_path):
    """Group-pruned reads actually prune: the plan for one partition of
    a Hive store must not scan the others (G3 partition-key round trip +
    Catalyst partition pruning)."""
    store = str(tmp_path / "pruned")
    dss = xds_from_parquet(spark, os.path.join(SF_DIR, "orders.parquet"),
                           group_cols=["o_orderstatus"])
    xds_to_parquet(dss, store)
    back = xds_from_parquet(spark, store, group_cols=["o_orderstatus"])
    one = next(d for d in back if d.attrs["o_orderstatus"] == "F")
    plan = one.df._jdf.queryExecution().executedPlan().toString()
    assert "o_orderstatus=F" in plan or "PartitionFilters" in plan
    want = orders.where("o_orderstatus = 'F'").count()
    assert one.df.count() == want


def test_convert_excludes_and_partitions(spark, tmp_path):
    out = str(tmp_path / "converted")
    convert_table(spark, os.path.join(SF_DIR, "orders.parquet"), out,
                  exclude_columns=["o_orderpriority"],
                  group_cols=["o_orderstatus"])
    back = spark.read.parquet(out)
    assert "o_orderpriority" not in back.columns
    assert "o_orderstatus" in back.columns
    src = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    assert back.count() == src.count()


def test_keywords_roundtrip(spark, nation, tmp_path):
    """S7 table/column keyword metadata (daskms/writes.py:723-739)."""
    from dask_ms_spark.sources.keywords import (read_keywords,
                                                update_keywords)

    store = str(tmp_path / "kw_store")
    dss = xds_from_parquet(spark, os.path.join(SF_DIR, "nation.parquet"))
    xds_to_parquet(dss, store,
                   table_keywords={"MS_VERSION": 2.0},
                   column_keywords={"n_name": {"UNIT": "name"}})
    table, cols = read_keywords(store)
    assert table == {"MS_VERSION": 2.0}
    assert cols == {"n_name": {"UNIT": "name"}}
    update_keywords(store, {"EXTRA": 1}, {"n_name": {"QuantumUnits": ["s"]}})
    table, cols = read_keywords(store)
    assert table == {"MS_VERSION": 2.0, "EXTRA": 1}
    assert cols["n_name"] == {"UNIT": "name", "QuantumUnits": ["s"]}
    # keywordless store reads as empty dicts
    assert read_keywords(str(tmp_path)) == ({}, {})


def test_cli_convert_and_fragments(spark, tmp_path, capsys):
    """S11/F4 CLI apps (daskms/apps/convert.py, daskms/apps/fragments.py)."""
    from dask_ms_spark.apps import main

    out = str(tmp_path / "cli_out")
    rc = main(["convert", os.path.join(SF_DIR, "nation.parquet"), out,
               "--exclude", "n_regionkey"])
    assert rc == 0
    back = spark.read.parquet(out)
    assert "n_regionkey" not in back.columns
    assert back.count() == spark.read.parquet(
        os.path.join(SF_DIR, "nation.parquet")).count()

    # fragment ancestry + rebase through the CLI
    from dask_ms_spark.operators.overlay import write_fragment

    frag = str(tmp_path / "cli_frag")
    write_fragment(back.selectExpr("n_nationkey AS ROWID", "n_name"),
                   frag, parent=out)
    rc = main(["fragments", "ancestry", frag])
    assert rc == 0
    assert capsys.readouterr().out.splitlines() == [out, frag]
    rc = main(["fragments", "rebase", frag, str(tmp_path / "other")])
    assert rc == 0
    rc = main(["fragments", "ancestry", frag])
    lines = capsys.readouterr().out.splitlines()
    assert lines[0] == str(tmp_path / "other")


def test_gated_sources_raise_helpfully(spark, tmp_path):
    """casa stays import-gated; zarr reads natively (missing store =
    FileNotFoundError, compressed store without the zarr package points
    at the parquet conversion path)."""
    import json

    import pytest as _pytest

    from dask_ms_spark.sources import casa, zarr

    if not casa.HAVE_CASACORE:
        with _pytest.raises(NotImplementedError, match="parquet"):
            casa.xds_from_casa(spark, "/nonexistent")
    # zarr no longer gates on the package: a missing store is a plain
    # filesystem error, not a capability error
    with _pytest.raises(FileNotFoundError):
        zarr.xds_from_zarr(spark, str(tmp_path / "nonexistent"))
    # ...but a compressed store still needs the zarr package
    if not zarr.HAVE_ZARR:
        store = tmp_path / "compressed"
        (store / "x").mkdir(parents=True)
        (store / ".zgroup").write_text('{"zarr_format": 2}')
        (store / "x" / ".zarray").write_text(json.dumps({
            "zarr_format": 2, "shape": [4], "chunks": [4],
            "dtype": "<i8", "order": "C", "filters": None,
            "fill_value": 0,
            "compressor": {"id": "blosc"}}))
        with _pytest.raises(NotImplementedError, match="parquet"):
            zarr.xds_from_zarr(spark, str(store))


def test_filter_pushdown_reaches_scan(lineitem):
    """P2: the predicate must appear as PushedFilters in the scan."""
    df = lineitem.where("l_quantity < 5").select("l_orderkey", "l_quantity")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "l_quantity" in plan


def test_column_pruning_reaches_scan(lineitem):
    """P1: ReadSchema carries only the selected columns."""
    df = lineitem.select("l_orderkey", "l_quantity")
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_quantity" in read_schema
    assert "l_tax" not in read_schema


def test_transpose_to_rowmajor_matches_numpy(spark):
    """S5 layout transform: (time, corrprod) chan-arrays regroup to
    MSv2 (row, chan, corr) — verified against a numpy transpose."""
    import numpy as np

    from dask_ms_spark.sources.katdal import transpose_to_rowmajor

    ntime, nbl, ncorr, nchan = 3, 2, 2, 4
    rng = np.random.RandomState(7)
    # dense (time, chan, corrprod) block, corrprod = baseline x corr
    block = rng.rand(ntime, nchan, nbl * ncorr).round(6)
    cp_rows = [(bl * ncorr + c, bl, bl + 1, c)
               for bl in range(nbl) for c in range(ncorr)]
    cp_index = spark.createDataFrame(
        cp_rows, "corrprod int, antenna1 int, antenna2 int, corr int")
    vis_rows = [(t, cp, [float(block[t, ch, cp]) for ch in range(nchan)])
                for t in range(ntime) for cp in range(nbl * ncorr)]
    vis = spark.createDataFrame(
        vis_rows, "time int, corrprod int, data array<double>")
    out = transpose_to_rowmajor(vis, cp_index)
    assert out.count() == ntime * nbl
    for r in out.collect():
        bl = r.antenna1
        want = block[r.time, :, bl * ncorr:(bl + 1) * ncorr]
        got = np.array(r.data)
        assert got.shape == (nchan, ncorr)
        assert np.allclose(got, want)


def _make_fake_loader():
    """Deterministic in-memory archive implementing the loader seam
    (katdal.py protocol): 6 dumps x 4 chans x (3 baselines * 2 corrs).

    Defined inside a function so cloudpickle serializes the class by
    value — executors cannot import the test module."""

    class FakeKatdalLoader:
        N_DUMPS, N_CHANS = 6, 4
        BASELINES = [(0, 1), (0, 2), (1, 2)]
        FIELD_IDS = [0, 0, 1, 1, 0, 1]
        SCANS = [0, 0, 1, 1, 2, 2]

        def __init__(self, url):
            self.url = url

        def _cp(self):
            return [(a, b, c)
                    for (a, b) in self.BASELINES for c in (0, 1)]

        def meta(self):
            return {
                "n_dumps": self.N_DUMPS,
                "n_chans": self.N_CHANS,
                "timestamps": [1e9 + 8.0 * d
                               for d in range(self.N_DUMPS)],
                "corr_products": self._cp(),
                "field_ids": self.FIELD_IDS,
                "scan_numbers": self.SCANS,
                "data_desc_id": 0,
            }

        def block(self):
            import numpy as np

            d, ch, cp = np.meshgrid(
                np.arange(self.N_DUMPS), np.arange(self.N_CHANS),
                np.arange(len(self._cp())), indexing="ij")
            vis = (d + 0.125 * ch) + 1j * (0.5 * cp)
            return vis.astype(np.complex64)

        def read(self, start, stop):
            import numpy as np

            vis = self.block()[start:stop]
            return {
                "vis": vis,
                "flags": np.zeros(vis.shape, dtype=bool),
                "weights": np.ones(vis.shape, dtype=np.float32),
            }

    return FakeKatdalLoader


FakeKatdalLoader = _make_fake_loader()


def test_katdal_ingest_with_fake_loader(spark):
    """S5: distributed katdal ingest through the loader seam — dense
    (dump, chan, corrprod) blocks become MSv2 row-major datasets
    grouped by (FIELD_ID, DATA_DESC_ID), values checked vs numpy."""
    import numpy as np

    from dask_ms_spark.sources.katdal import xds_from_katdal
    from dask_ms_spark.types import ROWID

    dss = xds_from_katdal(spark, "fake://archive",
                          loader_factory=FakeKatdalLoader,
                          dumps_per_chunk=4)  # 2 chunks, last partial
    got = {(d.attrs["FIELD_ID"], d.attrs["DATA_DESC_ID"]): d
           for d in dss}
    assert set(got) == {(0, 0), (1, 0)}
    nbl = len(FakeKatdalLoader.BASELINES)
    assert got[(0, 0)].df.count() == 3 * nbl  # dumps 0,1,4
    assert got[(1, 0)].df.count() == 3 * nbl  # dumps 2,3,5

    # value check vs the fake's dense block: dump 4 (field 0, chunk 2),
    # baseline (0,2) -> corrprods 2,3
    loader = FakeKatdalLoader("fake://archive")
    block = loader.block()
    row = (got[(0, 0)].df
           .where("TIME = 1e9 + 32.0 AND ANTENNA1 = 0 AND ANTENNA2 = 2")
           .collect())
    assert len(row) == 1
    r = row[0]
    assert r.SCAN_NUMBER == 2
    assert r[ROWID] == 4 * nbl + 1
    data = np.array(r.DATA).reshape(loader.N_CHANS, 2, 2)
    for ch in range(loader.N_CHANS):
        for c, cp_col in enumerate((2, 3)):
            want = block[4, ch, cp_col]
            assert data[ch, c, 0] == np.float32(want.real)
            assert data[ch, c, 1] == np.float32(want.imag)

    # TIME-sorted within group (index_cols default)
    times = [r.TIME for r in got[(1, 0)].df.select("TIME").collect()]
    assert times == sorted(times)


def test_katdal_import_writes_hive_parquet(spark, tmp_path):
    """S12: archive -> Hive-partitioned parquet in one distributed
    pass; FLAG/WEIGHT_SPECTRUM shapes survive."""
    from dask_ms_spark.sources.katdal import katdal_import

    out = str(tmp_path / "ms_store")
    katdal_import(spark, "fake://archive", out,
                  loader_factory=FakeKatdalLoader)
    assert any(d.startswith("FIELD_ID=") for d in os.listdir(out))
    back = spark.read.parquet(out)
    assert back.count() == FakeKatdalLoader.N_DUMPS * 3
    r = back.where("ANTENNA1 = 0 AND ANTENNA2 = 1").first()
    assert len(r.FLAG) == FakeKatdalLoader.N_CHANS * 2
    assert all(not f for f in r.FLAG)
    assert all(w == 1.0 for w in r.WEIGHT_SPECTRUM)


def test_katdal_gate_without_loader(spark):
    """No loader and no katdal package -> the gate points at the
    parquet ingest path."""
    from dask_ms_spark.sources import katdal

    if not katdal.HAVE_KATDAL:
        with pytest.raises(NotImplementedError, match="parquet"):
            katdal.xds_from_katdal(spark, "rdb://nonexistent")


def test_table_store_s3_scheme_and_options(spark):
    """S10: s3 URL parse (scheme normalised to s3a, subtable joined
    with '/') and fsspec-style storage_options mapped onto the Hadoop
    configuration — testable without a live endpoint."""
    s = TableStore.parse(
        "s3://bucket/data/ms.zarr::SPECTRAL_WINDOW",
        storage_options={
            "key": "AKID", "secret": "SECRET",
            "client_kwargs": {"endpoint_url": "http://minio:9000"},
            "use_ssl": False, "path_style": True,
            "fs.s3a.connection.maximum": 64,
        })
    assert s.scheme == "s3"
    assert not s.is_local
    assert s.path == "s3a://bucket/data/ms.zarr/SPECTRAL_WINDOW"
    mapped = s.hadoop_options()
    assert mapped == {
        "fs.s3a.access.key": "AKID",
        "fs.s3a.secret.key": "SECRET",
        "fs.s3a.endpoint": "http://minio:9000",
        "fs.s3a.connection.ssl.enabled": "false",
        "fs.s3a.path.style.access": "true",
        "fs.s3a.connection.maximum": "64",
    }
    # apply() lands the entries on the live Hadoop configuration
    applied = s.apply(spark)
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    for k, v in applied.items():
        assert hconf.get(k) == v

    # anonymous access maps to the anonymous credentials provider
    anon = TableStore.parse("s3://public-bucket/t",
                            storage_options={"anon": True})
    assert anon.hadoop_options() == {
        "fs.s3a.aws.credentials.provider":
            "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"}

    # typo'd option names fail loudly instead of silently falling back
    with pytest.raises(ValueError, match="unsupported storage option"):
        TableStore.parse("s3://b/t",
                         storage_options={"sceret": "x"}).hadoop_options()

    # local paths are unaffected by the new parsing
    plain = TableStore.parse("/data/ms.parquet::SUB")
    assert plain.is_local and plain.scheme == "file"
    assert plain.path == "/data/ms.parquet/SUB"


def test_storage_options_reach_scan_non_file_scheme(spark, nation,
                                                    tmp_path):
    """S10 end-to-end on a NON-file:// scheme: Hadoop's viewfs
    resolves mounts purely from configuration, so the read/write only
    succeed if ``storage_options`` actually lands on the Hadoop conf
    before the scan — the same plumb-through an s3a endpoint/key set
    rides.  The unconfigured authority must fail."""
    from dask_ms_spark.dataset import Dataset
    from dask_ms_spark.sources.storage import (xds_from_storage_table,
                                               xds_to_storage_table)

    local = str(tmp_path / "nation_store")
    nation.write.parquet(local)

    # unconfigured mount table -> the scan cannot resolve the scheme
    with pytest.raises(Exception):
        spark.read.parquet("viewfs://nomount/data").count()

    opts = {"fs.viewfs.mounttable.cluster5.link./data":
            f"file://{local}",
            "fs.viewfs.mounttable.cluster5.link./out":
            f"file://{tmp_path / 'out_store'}"}
    dss = xds_from_storage_table(spark, "viewfs://cluster5/data",
                                 storage_options=opts)
    assert sum(d.df.count() for d in dss) == nation.count()

    # write leg through the same remote scheme, then verify the bytes
    # landed at the mount target via a plain local read
    xds_to_storage_table([Dataset(nation.limit(5), {})],
                         "viewfs://cluster5/out",
                         storage_options=opts)
    back = spark.read.parquet(str(tmp_path / "out_store"))
    assert back.count() == 5


def test_infer_format_remote_defaults_to_parquet():
    assert infer_format("s3a://bucket/nonexistent-store") == "parquet"


def _make_fake_casa_table():
    """python-casacore-shaped fake table (colnames/nrows/getcol/
    putcol), defined in a closure so cloudpickle ships it by value."""
    import numpy as np

    class FakeCasaTable:
        N = 37  # not a multiple of the chunk size used in tests
        rng = np.random.RandomState(11)
        COLS = {}

        def __init__(self, path, writable=False):
            self.path = path
            self.puts = []
            if not FakeCasaTable.COLS:
                n = FakeCasaTable.N
                FakeCasaTable.COLS = {
                    "FIELD_ID": (np.arange(n) % 3).astype(np.int32),
                    "TIME": 5e9 + np.arange(n, dtype=np.float64),
                    "NAME": np.array([f"src{i % 4}" for i in range(n)]),
                    "DATA": (FakeCasaTable.rng.rand(n, 4, 2)
                             + 1j * FakeCasaTable.rng.rand(n, 4, 2))
                    .astype(np.complex64),
                    "UVW": FakeCasaTable.rng.rand(n, 3),
                }

        def colnames(self):
            return list(self.COLS)

        def nrows(self):
            return self.N

        def getcol(self, col, startrow=0, nrow=-1):
            arr = self.COLS[col]
            stop = self.N if nrow < 0 else startrow + nrow
            return arr[startrow:stop]

        def getcolslice(self, col, blc, trc, inc=(), startrow=0,
                        nrow=-1):
            arr = self.COLS[col]
            stop = self.N if nrow < 0 else startrow + nrow
            sel = tuple(slice(b, t + 1, i or 1) for b, t, i in
                        zip(blc, trc, list(inc) or [1] * len(blc)))
            return arr[(slice(startrow, stop),) + sel]

        def putcol(self, col, value, startrow=0, nrow=-1):
            self.puts.append((col, startrow, len(value)))
            self.COLS[col] = self.COLS[col].copy()
            self.COLS[col][startrow:startrow + len(value)] = value

        def close(self):
            pass

    return FakeCasaTable


FakeCasaTable = _make_fake_casa_table()


def test_casa_distributed_read_with_fake_table(spark):
    """S1/S2: chunked executor-side getcol through the table seam —
    scalar/string/tensor/complex columns, values vs the fake's numpy
    arrays, grouped datasets with MS defaults."""
    import numpy as np

    from dask_ms_spark.sources.casa import xds_from_casa
    from dask_ms_spark.types import ROWID

    dss = xds_from_casa(spark, "/fake/ms", group_cols=["FIELD_ID"],
                        index_cols=["TIME"],
                        table_factory=FakeCasaTable, row_chunk=10)
    assert {d.attrs["FIELD_ID"] for d in dss} == {0, 1, 2}
    assert sum(d.df.count() for d in dss) == FakeCasaTable.N

    cols = FakeCasaTable("/fake/ms").COLS
    one = next(d for d in dss if d.attrs["FIELD_ID"] == 1)
    r = one.df.orderBy(ROWID).first()
    i = r[ROWID]
    assert cols["FIELD_ID"][i] == 1
    assert r.TIME == cols["TIME"][i]
    assert r.NAME == cols["NAME"][i]
    got = np.array(r.DATA, dtype=np.float32)
    want = cols["DATA"][i].ravel()
    assert np.allclose(got[0::2], want.real)
    assert np.allclose(got[1::2], want.imag)
    assert np.allclose(np.array(r.UVW), cols["UVW"][i])

    # column projection limits the probe + transfer set
    (proj,) = xds_from_casa(spark, "/fake/ms", columns=["TIME"],
                            table_factory=FakeCasaTable)
    assert sorted(proj.df.columns) == [ROWID, "TIME"]
    with pytest.raises(KeyError, match="not in table"):
        xds_from_casa(spark, "/fake/ms", columns=["NOPE"],
                      table_factory=FakeCasaTable)


def _make_slab_only_table():
    """Fake table that FORBIDS full-cell reads of DATA/UVW: any
    multi-row getcol on a sliced column raises, so the test proves the
    reader pushes the hyperslab down to storage (the one-row dtype
    probe remains legal)."""
    base = _make_fake_casa_table()

    class SlabOnlyTable(base):
        SLICED = ("DATA", "UVW")

        def getcol(self, col, startrow=0, nrow=-1):
            if col in self.SLICED and (nrow < 0 or nrow > 1):
                raise AssertionError(
                    f"full getcol({col}) — slab pushdown violated")
            return super().getcol(col, startrow, nrow)

    return SlabOnlyTable


def test_casa_slab_pushdown(spark):
    """P3 at the source: slices reach getcolslice so only the
    requested hyperslab's bytes are read per chunk — a full-cell
    getcol on a sliced column raises inside the factory."""
    import numpy as np

    from dask_ms_spark.sources.casa import xds_from_casa
    from dask_ms_spark.types import ROWID

    SlabOnlyTable = _make_slab_only_table()
    cols = SlabOnlyTable("/fake/ms").COLS
    # DATA cells are (4, 2) complex; take channel 1:3, corr 0 -> (2, 1)
    (ds,) = xds_from_casa(
        spark, "/fake/ms", columns=["DATA", "UVW", "TIME"],
        table_factory=SlabOnlyTable, row_chunk=10,
        slices={"DATA": (slice(1, 3), slice(0, 1)), "UVW": (slice(0, 2),)})
    rows = {r[ROWID]: r for r in ds.df.collect()}
    assert len(rows) == SlabOnlyTable.N
    for i in (0, 17, SlabOnlyTable.N - 1):
        want = cols["DATA"][i][1:3, 0:1].ravel()
        got = np.array(rows[i].DATA, dtype=np.float32)
        assert got.shape == (4,)  # 2 cells re/im-interleaved
        assert np.allclose(got[0::2], want.real)
        assert np.allclose(got[1::2], want.imag)
        assert np.allclose(np.array(rows[i].UVW), cols["UVW"][i][:2])
        assert rows[i].TIME == cols["TIME"][i]  # unsliced col intact

    # bad slices fail fast on the driver
    with pytest.raises(KeyError, match="sliced columns"):
        xds_from_casa(spark, "/fake/ms", columns=["TIME"],
                      table_factory=SlabOnlyTable,
                      slices={"DATA": (slice(0, 1),)})
    with pytest.raises(ValueError, match="scalar"):
        xds_from_casa(spark, "/fake/ms", columns=["TIME"],
                      table_factory=SlabOnlyTable,
                      slices={"TIME": (slice(0, 1),)})


def test_casa_read_plan_is_distributed(spark):
    """The scan must be mapInPandas over Range — no driver-eager
    createDataFrame of the whole table (the round-2 weakness)."""
    from dask_ms_spark.sources.casa import xds_from_casa

    (ds,) = xds_from_casa(spark, "/fake/ms",
                          table_factory=FakeCasaTable, row_chunk=10)
    plan = ds.df._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "Range" in plan
    assert "Scan ExistingRDD" not in plan


def test_casa_descriptor_builder():
    """S7 create mode: Spark schema -> casacore tabledesc — scalar
    columns on StandardStMan, fixed-shape complex tensors on
    TiledColumnStMan with the TRUE complex cell shape, variable-shape
    tensors ndim=-1, ROWID excluded."""
    from pyspark.sql.types import (ArrayType, DoubleType, FloatType,
                                   IntegerType, LongType, StringType,
                                   StructField, StructType)

    from dask_ms_spark.sources.casa import casa_table_descriptor
    from dask_ms_spark.types import ROWID, tensor_field

    schema = StructType([
        StructField(ROWID, LongType(), False),
        StructField("FIELD_ID", IntegerType()),
        StructField("NAME", StringType()),
        StructField("TIME", DoubleType()),
        tensor_field("DATA", FloatType(), ("chan", "corr"), (4, 2)),
        tensor_field("UVW", DoubleType(), ("uvw",), (3,)),
        StructField("FLAGROW", ArrayType(DoubleType())),  # var-shape
    ])
    desc = casa_table_descriptor(schema, complex_cols=["DATA"])
    assert ROWID not in desc
    assert desc["FIELD_ID"]["valueType"] == "int"
    assert desc["NAME"]["valueType"] == "string"
    assert desc["TIME"]["valueType"] == "double"
    d = desc["DATA"]
    assert d["valueType"] == "complex" and d["shape"] == [4, 2]
    assert d["ndim"] == 2 and d["option"] == 5
    assert d["dataManagerType"] == "TiledColumnStMan"
    assert desc["UVW"]["valueType"] == "double"
    assert desc["UVW"]["shape"] == [3]
    assert desc["FLAGROW"]["ndim"] == -1

    with pytest.raises(ValueError, match="unsupported"):
        casa_table_descriptor(StructType(
            [StructField("TS", __import__("pyspark").sql.types
                         .TimestampType())]))


def test_casa_create_table_roundtrip(spark):
    """S7 create mode end-to-end through the seam: descriptor-built
    table created, filled via contiguous putcol runs (complex cells
    re-assembled), and read back with xds_from_casa."""
    import numpy as np

    from dask_ms_spark.dataset import Dataset
    from dask_ms_spark.sources.casa import (create_casa_table,
                                            xds_from_casa)
    from dask_ms_spark.types import ROWID, tensor_field, with_tensor_metadata

    created = {}

    def create_factory(path, desc, nrow):
        class CreatedTable:
            def __init__(self):
                self.desc, self.nrow = desc, nrow
                self.cols = {}
                for c, d in desc.items():
                    vt = d["valueType"]
                    np_t = {"boolean": "?", "int": "<i4",
                            "float": "<f4", "double": "<f8",
                            "complex": "<c8", "dcomplex": "<c16",
                            "string": "O"}[vt]
                    shape = tuple(d.get("shape", ()))
                    self.cols[c] = np.zeros((nrow, *shape),
                                            dtype=np.dtype(np_t))

            def colnames(self):
                return list(self.cols)

            def nrows(self):
                return self.nrow

            def putcol(self, col, value, startrow=0, nrow=-1):
                self.cols[col][startrow:startrow + len(value)] = value

            def getcol(self, col, startrow=0, nrow=-1):
                stop = self.nrow if nrow < 0 else startrow + nrow
                return self.cols[col][startrow:stop]

            def close(self):
                pass

        created[path] = CreatedTable()
        return created[path]

    n = 12
    rng = np.random.RandomState(3)
    data = (rng.rand(n, 2, 2) + 1j * rng.rand(n, 2, 2)) \
        .astype(np.complex64)
    inter = np.empty((n, 8), dtype=np.float32)
    inter[:, 0::2] = data.reshape(n, -1).real
    inter[:, 1::2] = data.reshape(n, -1).imag
    rows = [(i, i % 3, float(i), [float(v) for v in inter[i]])
            for i in range(n)]
    df = spark.createDataFrame(
        rows, f"{ROWID} long, FIELD_ID int, TIME double, "
              "DATA array<float>")
    df = spark.createDataFrame(
        df.rdd, with_tensor_metadata(
            df.schema, {"DATA": ("chan", "corr")}, {"DATA": (2, 2)}))

    written = create_casa_table(
        [Dataset(df, {})], "/fake/new_ms", complex_cols=["DATA"],
        create_factory=create_factory)
    assert written == n
    t = created["/fake/new_ms"]
    assert np.allclose(t.cols["TIME"], np.arange(n, dtype=float))
    assert np.allclose(t.cols["DATA"], data)
    assert t.cols["DATA"].dtype == np.complex64

    # read back through the normal distributed reader
    (ds,) = xds_from_casa(spark, "/fake/new_ms",
                          table_factory=lambda p: created[p])
    got = {r[ROWID]: r for r in ds.df.collect()}
    assert len(got) == n
    back = np.array(got[5].DATA, dtype=np.float32)
    assert np.allclose(back[0::2], data[5].ravel().real)
    assert np.allclose(back[1::2], data[5].ravel().imag)
    assert got[5].FIELD_ID == 5 % 3


def test_casa_update_write_putcol_runs(spark):
    """S7 update mode: scattered ROWID updates split into contiguous
    putcol runs; values land in the fake table."""
    from dask_ms_spark.dataset import Dataset
    from dask_ms_spark.sources.casa import xds_to_casa
    from dask_ms_spark.types import ROWID

    sink = FakeCasaTable("/fake/ms", writable=True)
    updates = spark.createDataFrame(
        [(3, 1.5), (4, 2.5), (5, 3.5), (20, 9.5)],
        f"{ROWID} bigint, TIME double")
    n = xds_to_casa([Dataset(updates, {})], "/fake/ms",
                    table_factory=lambda p: sink)
    assert n == 4
    assert sink.puts == [("TIME", 3, 3), ("TIME", 20, 1)]
    assert sink.COLS["TIME"][3] == 1.5 and sink.COLS["TIME"][20] == 9.5


def test_casa_writes_stream_bounded_batches(spark):
    """S7 scale shape: BOTH write paths stream bounded putcol batches
    (max rows per call <= batch_rows) instead of materialising the
    whole table on the driver, with byte-identical round trips."""
    import numpy as np

    from dask_ms_spark.dataset import Dataset
    from dask_ms_spark.sources.casa import (create_casa_table,
                                            xds_to_casa)
    from dask_ms_spark.types import ROWID, tensor_field

    n, batch = 100, 16

    # --- create mode: dense fill in several bounded batches
    created = {}

    def create_factory(path, desc, nrow):
        class CreatedTable:
            def __init__(self):
                self.nrow = nrow
                self.cols = {c: np.zeros(
                    (nrow, *d.get("shape", ())),
                    dtype={"double": "<f8", "complex": "<c8",
                           "int": "<i4"}[d["valueType"]])
                    for c, d in desc.items()}
                self.puts = []

            def putcol(self, col, value, startrow=0, nrow=-1):
                self.puts.append((col, startrow, len(value)))
                self.cols[col][startrow:startrow + len(value)] = value

            def close(self):
                pass

        created[path] = CreatedTable()
        return created[path]

    rng = np.random.RandomState(7)
    data = (rng.rand(n, 2) + 1j * rng.rand(n, 2)).astype(np.complex64)
    inter = np.empty((n, 4), dtype=np.float32)
    inter[:, 0::2] = data.real
    inter[:, 1::2] = data.imag
    rows = [(i, float(i) * 0.5, [float(v) for v in inter[i]])
            for i in range(n)]
    from pyspark.sql.types import (DoubleType, FloatType, LongType,
                                   StructField, StructType)
    schema = StructType([
        StructField(ROWID, LongType()),
        StructField("TIME", DoubleType()),
        tensor_field("DATA", FloatType(), ("chan",), (2,))])
    df = spark.createDataFrame(rows, schema).repartition(8)

    written = create_casa_table(
        [Dataset(df, {})], "/fake/stream_ms", complex_cols=["DATA"],
        create_factory=create_factory, batch_rows=batch)
    assert written == n
    t = created["/fake/stream_ms"]
    # bounded batches: several calls, none larger than batch_rows
    time_puts = [p for p in t.puts if p[0] == "TIME"]
    assert len(time_puts) == -(-n // batch)
    assert max(p[2] for p in t.puts) <= batch
    # batches tile [0, n) exactly, in order
    assert [p[1] for p in time_puts] == \
        list(range(0, n, batch))
    # byte-identical round trip
    assert np.array_equal(t.cols["TIME"],
                          np.arange(n, dtype=np.float64) * 0.5)
    assert np.array_equal(t.cols["DATA"], data)

    # --- update mode: bounded batches AND contiguous-run splitting
    sink = FakeCasaTable("/fake/ms", writable=True)
    # rows 0..29 contiguous except a hole at 10 (runs 0-9, 11-29)
    upd = [(i, 1000.0 + i) for i in range(30) if i != 10]
    updates = spark.createDataFrame(
        upd, f"{ROWID} bigint, TIME double").repartition(4)
    got = xds_to_casa([Dataset(updates, {})], "/fake/ms",
                      table_factory=lambda p: sink, batch_rows=8)
    assert got == 29
    assert max(p[2] for p in sink.puts) <= 8
    want = FakeCasaTable.COLS["TIME"]
    assert want[10] != 1010.0  # the hole is untouched
    for i in range(30):
        if i != 10:
            assert want[i] == 1000.0 + i


def _make_created_casa_table():
    """Readable+writable fake for the CREATE leg: builds zeroed numpy
    buffers from the tabledesc, serves colnames/nrows/getcol for the
    read-back, defined in a closure so cloudpickle ships it by value."""
    import numpy as np

    class CreatedCasaTable:
        def __init__(self, desc, nrow):
            self.desc, self.nrow = desc, nrow
            self.puts = []
            self.cols = {}
            for c, d in desc.items():
                np_t = {"boolean": "?", "int": "<i4", "float": "<f4",
                        "double": "<f8", "complex": "<c8",
                        "dcomplex": "<c16", "string": "O"}[d["valueType"]]
                shape = tuple(d.get("shape", ()))
                self.cols[c] = np.zeros((nrow, *shape),
                                        dtype=np.dtype(np_t))

        def colnames(self):
            return list(self.cols)

        def nrows(self):
            return self.nrow

        def getcol(self, col, startrow=0, nrow=-1):
            stop = self.nrow if nrow < 0 else startrow + nrow
            return self.cols[col][startrow:stop]

        def putcol(self, col, value, startrow=0, nrow=-1):
            self.puts.append((col, startrow, len(value)))
            self.cols[col][startrow:startrow + len(value)] = value

        def close(self):
            pass

    return CreatedCasaTable


CreatedCasaTable = _make_created_casa_table()


def test_convert_store_to_casa_ms_skeleton(spark, tmp_path):
    """S7/S11: parquet -> casa CREATION through convert/dispatch with
    the MS descriptor presets — main + two subtables written through
    the fake factory, preset skeleton columns present, group columns
    re-expanded, and the values round-trip back to parquet equal."""
    import numpy as np

    from dask_ms_spark.sources.casa import xds_from_casa
    from dask_ms_spark.sources.convert import convert_store

    # --- input store: MS-shaped parquet main + subtable dirs
    n = 20
    main = spark.createDataFrame(
        [(float(i), i % 3, (i + 1) % 3, i % 2,
          [float(i), float(-i)]) for i in range(n)],
        "TIME double, ANTENNA1 int, ANTENNA2 int, FIELD_ID int, "
        "DATA array<float>")
    from dask_ms_spark.types import with_tensor_metadata
    main = spark.createDataFrame(
        main.rdd, with_tensor_metadata(
            main.schema, {"DATA": ("chan",)}, {"DATA": (1,)}))
    store_in = str(tmp_path / "ms_store")
    main.write.parquet(store_in)
    spark.createDataFrame(
        [("ea01", 25.0), ("ea02", 25.0)],
        "NAME string, DISH_DIAMETER double") \
        .write.parquet(os.path.join(store_in, "ANTENNA"))
    spark.createDataFrame(
        [(4, 1.4e9)], "NUM_CHAN int, REF_FREQUENCY double") \
        .write.parquet(os.path.join(store_in, "SPECTRAL_WINDOW"))

    created = {}

    def create_factory(path, desc, nrow):
        created[path] = CreatedCasaTable(desc, nrow)
        return created[path]

    convert_store(spark, store_in, "/fake/full_ms",
                  subtables=["ANTENNA", "SPECTRAL_WINDOW"],
                  output_format="casa", descriptor="ms",
                  group_cols=["FIELD_ID"],
                  create_factory=create_factory)

    assert set(created) == {"/fake/full_ms", "/fake/full_ms/ANTENNA",
                            "/fake/full_ms/SPECTRAL_WINDOW"}
    mt = created["/fake/full_ms"]
    # MS MAIN skeleton: required preset columns exist even though the
    # input frame never carried them
    for col in ("FLAG_ROW", "SIGMA", "WEIGHT", "EXPOSURE", "UVW",
                "SCAN_NUMBER"):
        assert col in mt.cols, col
    assert mt.desc["UVW"]["shape"] == [3]
    # DATA: preset promotes the interleaved float array to complex
    assert mt.desc["DATA"]["valueType"] == "complex"
    assert mt.cols["DATA"].dtype == np.complex64
    # group column FIELD_ID was re-expanded from attrs to a column
    assert sorted(np.unique(mt.cols["FIELD_ID"])) == [0, 1]
    # subtable skeletons
    at = created["/fake/full_ms/ANTENNA"]
    for col in ("MOUNT", "STATION", "POSITION", "OFFSET"):
        assert col in at.cols, col
    st = created["/fake/full_ms/SPECTRAL_WINDOW"]
    assert "CHAN_FREQ" in st.cols and "TOTAL_BANDWIDTH" in st.cols

    # --- round trip: casa (fake) -> parquet, values equal
    (back_ds,) = xds_from_casa(
        spark, "/fake/full_ms",
        columns=["TIME", "ANTENNA1", "ANTENNA2", "FIELD_ID", "DATA"],
        table_factory=lambda p: created[p])
    out_pq = str(tmp_path / "back.parquet")
    back_ds.df.write.parquet(out_pq)
    got = {r.TIME: r for r in spark.read.parquet(out_pq).collect()}
    want = {r.TIME: r for r in main.collect()}
    assert len(got) == n
    for t, w in want.items():
        g = got[t]
        assert (g.ANTENNA1, g.ANTENNA2, g.FIELD_ID) == \
            (w.ANTENNA1, w.ANTENNA2, w.FIELD_ID)
        assert list(g.DATA) == list(w.DATA)
    (ant,) = xds_from_casa(spark, "/fake/full_ms/ANTENNA",
                           columns=["NAME", "DISH_DIAMETER"],
                           table_factory=lambda p: created[p])
    assert {r.NAME for r in ant.df.collect()} == {"ea01", "ea02"}


def test_jsonl_roundtrip_and_dispatch(spark, tmp_path):
    """JSONL corpus ingest: extension-dispatched read/write through
    the storage layer, filter applied on read, parquet conversion the
    blessed follow-up."""
    from dask_ms_spark.sources.convert import convert_table
    from dask_ms_spark.sources.storage import (infer_format,
                                               xds_from_storage_table,
                                               xds_to_storage_table)

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    out = str(tmp_path / "corpus.jsonl")
    assert infer_format(out) == "jsonl"
    assert infer_format("s3://bucket/dump.ndjson.gz") == "jsonl"
    xds_to_storage_table(docs, out, fmt="jsonl")

    dss = xds_from_storage_table(spark, out, where="n_chars > 100")
    got = sum(ds.df.count() for ds in dss)
    want = docs.where("n_chars > 100").count()
    assert got == want > 0

    # jsonl -> parquet conversion (the production first step)
    pq = str(tmp_path / "corpus.parquet")
    convert_table(spark, out, pq, exclude_columns=["lang"])
    back = spark.read.parquet(pq)
    assert back.count() == docs.count()
    assert "lang" not in back.columns


def _s3_jars_present() -> bool:
    """True when Spark's JVM can actually speak s3a:// — the
    hadoop-aws filesystem plus an AWS SDK jar."""
    import glob

    import pyspark

    jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
    have_fs = glob.glob(os.path.join(jars, "hadoop-aws-*.jar"))
    have_sdk = (glob.glob(os.path.join(jars, "aws-java-sdk*.jar"))
                + glob.glob(os.path.join(jars, "bundle-*.jar")))
    return bool(have_fs and have_sdk)


try:
    from moto.server import ThreadedMotoServer

    HAVE_MOTO = True
except Exception:  # pragma: no cover
    ThreadedMotoServer = None
    HAVE_MOTO = False


@pytest.mark.skipif(
    not HAVE_MOTO,
    reason="s3 round trip needs moto")
def test_s3_round_trip_via_moto(spark, nation):
    """S10 full S3-protocol leg: write a dataset to a moto-served
    bucket through xds_to_storage_table and read it back, with
    credentials + endpoint riding fsspec-style storage_options only.
    With hadoop-aws jars on the classpath this exercises native s3a;
    without them (this sandbox) the boto3 staging fallback
    (sources/s3staging.py) carries the identical call — either way
    the S3 wire protocol round-trips for real against moto.
    Complements test_storage_options_reach_scan_non_file_scheme,
    which proves the Hadoop-conf plumb-through for the native leg."""
    from dask_ms_spark.dataset import Dataset
    from dask_ms_spark.sources.storage import (xds_from_storage_table,
                                               xds_to_storage_table)

    server = ThreadedMotoServer(ip_address="127.0.0.1", port=0)
    server.start()
    try:
        host, port = server.get_host_and_port()
        endpoint = f"http://{host}:{port}"
        import boto3

        boto3.client(
            "s3", endpoint_url=endpoint,
            aws_access_key_id="testing",
            aws_secret_access_key="testing",
            region_name="us-east-1").create_bucket(Bucket="dms-test")

        opts = {"key": "testing", "secret": "testing",
                "client_kwargs": {"endpoint_url": endpoint},
                "use_ssl": False, "path_style": True}
        xds_to_storage_table([Dataset(nation, {})],
                             "s3://dms-test/nation_store",
                             storage_options=opts)
        dss = xds_from_storage_table(spark,
                                     "s3://dms-test/nation_store",
                                     storage_options=opts)
        assert sum(d.df.count() for d in dss) == nation.count()
    finally:
        server.stop()


def test_casa_scan_to_ms_kernels(spark):
    """Integration: CASA-source scan (fake factory) feeding the MS
    downstream kernels — complex DATA through Stokes-style plane
    math, flag-occupancy QA, and BDA on the scanned frame.  The
    reference user's read -> process chain on this engine, CASA leg."""
    import numpy as np
    from pyspark.sql import functions as F

    from dask_ms_spark.operators.bda import bda_average, flag_summary
    from dask_ms_spark.sources.casa import xds_from_casa
    from dask_ms_spark.types import ROWID

    FakeCasaTable = _make_fake_casa_table()
    dss = xds_from_casa(spark, "/fake/ms", group_cols=["FIELD_ID"],
                        index_cols=["TIME"],
                        table_factory=FakeCasaTable, row_chunk=10)
    cols = FakeCasaTable("/fake/ms").COLS

    # one frame with baseline-ish keys derived from the scan
    parts = []
    for d in dss:
        parts.append(d.df.withColumn("fid",
                                     F.lit(d.attrs["FIELD_ID"])))
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    # DATA is (4, 2) complex interleaved -> amplitude of plane 0 as
    # the scalar payload; flag = negative imaginary part
    amp0 = F.sqrt(F.element_at(F.col("DATA"), 1)
                  * F.element_at(F.col("DATA"), 1)
                  + F.element_at(F.col("DATA"), 2)
                  * F.element_at(F.col("DATA"), 2))
    ms = df.select(
        "fid", ROWID,
        (F.col("TIME") - 5e9).alias("t"),
        ((F.col("fid") + 1) * 200.0).alias("uv"),
        F.array(amp0.cast("double")).alias("data"),
        F.array(F.lit(False)).alias("flag"))

    qa = {r.fid: r for r in flag_summary(ms, ["fid"], "flag").collect()}
    assert sum(r.n_vis for r in qa.values()) == FakeCasaTable.N
    assert all(r.n_flagged == 0 for r in qa.values())

    out = bda_average(ms, "t", ["fid"], "uv", base_interval=4.0,
                      ref_uvdist=600.0, max_factor=4,
                      data_col="data", flag_col="flag")
    got = out.collect()
    assert sum(r.n_rows for r in got) == FakeCasaTable.N
    # field 0: uv 200 -> factor 3 -> 12s bins over 37 rows
    f0 = [r for r in got if r.fid == 0]
    assert all(r.factor == 3 for r in f0)
    # spot-check one averaged cell against numpy over the fake table
    data = cols["DATA"]
    fid = cols["FIELD_ID"]
    t = cols["TIME"] - 5e9
    rows0 = [i for i in range(FakeCasaTable.N)
             if fid[i] == 0 and 0 <= t[i] < 12]
    want = float(np.mean(np.abs(
        data[rows0, 0, 0].astype(np.complex128))))
    got0 = next(r for r in f0 if r.bin == 0)
    assert abs(got0.data_mean[0] - want) < 1e-6


def test_manifest_prunes_files(spark, tmp_path):
    """Footer-statistics data skipping: a range-laid-out table builds
    a per-file min/max manifest (footer-only reads via mapInPandas);
    a narrow range query reads a strict subset of files and returns
    exactly what the full scan + filter returns."""
    import glob

    from pyspark.sql import functions as F

    from dask_ms_spark.sources.manifest import (build_manifest,
                                                prune_files,
                                                read_pruned)

    path = str(tmp_path / "ranged")
    df = spark.range(0, 10000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("payload"))
    # range layout: each of the 8 files holds a narrow k interval
    df.repartitionByRange(8, "k").write.parquet(path)
    n_files = len(glob.glob(path + "/*.parquet"))
    assert n_files == 8

    man = build_manifest(spark, path, ["k"])
    rows = man.collect()
    assert len(rows) == n_files
    assert all(r.num_rows > 0 and r.null_count == 0 for r in rows)

    kept = prune_files(man, "k", 2000, 2400)
    assert 0 < len(kept) < n_files          # real skipping happened

    got = read_pruned(spark, man, "k", 2000, 2400)
    want = spark.read.parquet(path).where(F.col("k").between(2000, 2400))
    assert sorted(r.k for r in got.collect()) == \
        sorted(r.k for r in want.collect())
    # the pruned scan's file index holds exactly the kept files
    assert got.inputFiles() and \
        {os.path.basename(f) for f in got.inputFiles()} == \
        {os.path.basename(f) for f in kept}

    # disjoint range -> zero files, empty result, schema preserved
    empty = read_pruned(spark, man, "k", 50000, 60000)
    assert empty.count() == 0
    assert empty.columns == ["k", "payload"]

    import pytest
    with pytest.raises(ValueError, match="column"):
        build_manifest(spark, path, [])
    # executor-side guard surfaces as a PythonException wrapper
    with pytest.raises(Exception, match="absent"):
        build_manifest(spark, path, ["nope"]).collect()


def test_manifest_int64_precision_and_truncation_guard(spark, tmp_path):
    """r6-advice regression: int64 statistics above 2^53 must compare
    as longs (the str->double round trip rounded them and could prune
    a file that actually matches); 64-byte string statistics are
    treated as possibly writer-truncated and never prune."""
    import pandas as pd
    from pyspark.sql import functions as F

    from dask_ms_spark.sources.manifest import (build_manifest,
                                                prune_files,
                                                read_pruned)

    big = 2 ** 53 + 1                       # not double-representable
    tmp = str(tmp_path / "bigint")
    os.makedirs(tmp)
    pd.DataFrame({"k": [big, big + 10]}).to_parquet(
        os.path.join(tmp, "a.parquet"))
    pd.DataFrame({"k": [5, 6]}).to_parquet(
        os.path.join(tmp, "b.parquet"))
    man = build_manifest(spark, tmp, ["k"])
    rows = {os.path.basename(r.file): r for r in man.collect()}
    assert rows["a.parquet"].min_long == big       # typed, exact
    assert rows["a.parquet"].max_long == big + 10

    # exact-value query: double math would see min == 2^53 and could
    # prune on [big+1, big+10]; long compare keeps the file
    kept = prune_files(man, "k", big, big)
    assert [os.path.basename(f) for f in kept] == ["a.parquet"]
    got = read_pruned(spark, man, "k", big, big)
    assert [r.k for r in got.collect()] == [big]

    # string stats at the 64-byte truncation boundary: recorded as
    # missing -> the file is conservatively kept for any bound
    tmp2 = str(tmp_path / "longstr")
    os.makedirs(tmp2)
    pd.DataFrame({"s": ["x" * 64, "y" * 64]}).to_parquet(
        os.path.join(tmp2, "c.parquet"))
    pd.DataFrame({"s": ["aa", "ab"]}).to_parquet(
        os.path.join(tmp2, "d.parquet"))
    man2 = build_manifest(spark, tmp2, ["s"])
    srows = {os.path.basename(r.file): r for r in man2.collect()}
    assert srows["c.parquet"].min_value is None
    assert srows["d.parquet"].min_value == "aa"
    kept2 = {os.path.basename(f)
             for f in prune_files(man2, "s", "zz", "zzz")}
    # d is provably out of range; c has no usable stats -> kept
    assert kept2 == {"c.parquet"}


def test_probe_attaches_ms_dims():
    """table_schemas parity: a probe of an MS-suffixed path labels
    tensor columns with the canonical MS dim names (complex DATA cell
    dims, UVW), unknown tensor columns get {col}-{i} auto-names, and
    non-MS paths auto-name everything (reference
    daskms/table_schemas.py lookup-by-suffix)."""
    from dask_ms_spark.sources.casa import probe_casa_table
    from dask_ms_spark.types import field_dims

    schema, _, _, _ = probe_casa_table(FakeCasaTable, "/fake/test.ms")
    dims = {f.name: field_dims(f) for f in schema.fields}
    assert dims["DATA"] == ("chan", "corr")
    assert dims["UVW"] == ("uvw",)
    assert dims["TIME"] is None                # scalar: no metadata

    schema2, _, _, _ = probe_casa_table(FakeCasaTable, "/fake/other")
    dims2 = {f.name: field_dims(f) for f in schema2.fields}
    assert dims2["DATA"] == ("DATA-1", "DATA-2")
    assert dims2["UVW"] == ("UVW-1",)


def test_manifest_back_compat_without_typed_columns(spark, tmp_path):
    """Manifests written before min_long/max_long existed still prune
    through the string-repr path (no unresolved-column error), and
    int bounds against them stay correct at double-safe magnitudes."""
    import os

    from dask_ms_spark.sources.manifest import (build_manifest,
                                                prune_files)

    p = os.path.join(str(tmp_path), "t")
    spark.range(100).selectExpr("id AS k").coalesce(4) \
        .write.parquet(p)
    legacy = build_manifest(spark, p, ["k"]) \
        .drop("min_long", "max_long").cache()
    kept = prune_files(legacy, "k", 0, 10)
    assert 1 <= len(kept) < 4
    got = sorted(r.k for r in spark.read.parquet(*kept)
                 .where("k between 0 and 10").collect())
    assert got == list(range(11))


@pytest.mark.skipif(not HAVE_MOTO, reason="needs moto")
def test_s3_subtable_round_trip_via_moto(spark, nation, customer):
    """S10 + the ::SUBTABLE convention over S3: main and subtable
    write to one bucket store and read back independently through
    the same url dialect the reference uses
    (daskms/fsspec_store.py:120-140)."""
    from dask_ms_spark.dataset import Dataset
    from dask_ms_spark.sources.storage import (xds_from_storage_table,
                                               xds_to_storage_table)

    server = ThreadedMotoServer(ip_address="127.0.0.1", port=0)
    server.start()
    try:
        host, port = server.get_host_and_port()
        endpoint = f"http://{host}:{port}"
        import boto3

        boto3.client(
            "s3", endpoint_url=endpoint,
            aws_access_key_id="testing",
            aws_secret_access_key="testing",
            region_name="us-east-1").create_bucket(Bucket="dms-sub")
        opts = {"key": "testing", "secret": "testing",
                "client_kwargs": {"endpoint_url": endpoint}}
        base = "s3://dms-sub/obs_store"
        xds_to_storage_table([Dataset(nation, {})], base,
                             storage_options=opts)
        sub = customer.limit(20)
        xds_to_storage_table([Dataset(sub, {})],
                             f"{base}::CUSTOMER",
                             storage_options=opts)
        got_main = xds_from_storage_table(spark, base,
                                          storage_options=opts)
        got_sub = xds_from_storage_table(
            spark, f"{base}::CUSTOMER", storage_options=opts)
        assert sum(d.df.count() for d in got_main) == nation.count()
        assert sum(d.df.count() for d in got_sub) == 20
        keys = {r.c_custkey for d in got_sub
                for r in d.df.select("c_custkey").collect()}
        assert keys == {r.c_custkey for r in
                        sub.select("c_custkey").collect()}
    finally:
        server.stop()


def test_s3staging_helpers():
    """Unit coverage for the boto3 staging leg: url parsing, anon
    client construction (UNSIGNED signature), and fsspec-style
    credential mapping."""
    import pytest as _pytest

    from dask_ms_spark.sources.s3staging import (boto3_client,
                                                 split_bucket_key)

    assert split_bucket_key("s3://b/a/c/") == ("b", "a/c")
    assert split_bucket_key("s3://bucket") == ("bucket", "")
    with _pytest.raises(ValueError):
        split_bucket_key("s3:///nokey")
    c = boto3_client({"anon": True,
                      "client_kwargs": {"endpoint_url": "http://x:1"}})
    assert c.meta.endpoint_url == "http://x:1"
    c2 = boto3_client({"key": "k", "secret": "s", "token": "t",
                       "region_name": "eu-west-1"})
    assert c2.meta.region_name == "eu-west-1"


@pytest.mark.skipif(not HAVE_MOTO, reason="needs moto")
def test_s3_fallback_overwrite_and_sibling_isolation(spark, nation):
    """Review fixes (r8): mode='overwrite' REPLACES remote objects
    (no stale-part merge), mode='error' raises on an existing prefix,
    and a sibling key sharing the string prefix (store_v2 beside
    store) is never swept into a read of store."""
    from dask_ms_spark.dataset import Dataset
    from dask_ms_spark.sources.storage import (xds_from_storage_table,
                                               xds_to_storage_table)

    server = ThreadedMotoServer(ip_address="127.0.0.1", port=0)
    server.start()
    try:
        host, port = server.get_host_and_port()
        endpoint = f"http://{host}:{port}"
        import boto3

        boto3.client(
            "s3", endpoint_url=endpoint,
            aws_access_key_id="testing",
            aws_secret_access_key="testing",
            region_name="us-east-1").create_bucket(Bucket="dms-ow")
        opts = {"key": "testing", "secret": "testing",
                "client_kwargs": {"endpoint_url": endpoint}}
        url = "s3://dms-ow/store"
        a = nation.where("n_nationkey < 10")
        b = nation.where("n_nationkey >= 10")
        xds_to_storage_table([Dataset(a, {})], url,
                             storage_options=opts)
        # sibling store sharing the string prefix
        xds_to_storage_table([Dataset(nation, {})], url + "_v2",
                             storage_options=opts)
        # overwrite must REPLACE a's parts, not merge with them
        xds_to_storage_table([Dataset(b, {})], url, mode="overwrite",
                             storage_options=opts)
        back = xds_from_storage_table(spark, url,
                                      storage_options=opts)
        keys = sorted(r.n_nationkey for d in back
                      for r in d.df.select("n_nationkey").collect())
        assert keys == sorted(
            r.n_nationkey for r in b.select("n_nationkey").collect())
        with pytest.raises(FileExistsError):
            xds_to_storage_table([Dataset(a, {})], url, mode="error",
                                 storage_options=opts)
    finally:
        server.stop()


@pytest.mark.skipif(not HAVE_MOTO, reason="needs moto")
def test_s3_zarr_round_trip_keeps_dot_metadata(spark, nation):
    """Review fix (r9): upload_dir used to skip EVERY dotfile, but a
    zarr store's metadata lives in dotfiles (.zgroup/.zarray/
    .zattrs).  A jar-less s3 zarr write must upload them or the
    remote store is unreadable — and with mode='overwrite' the old
    store would already be deleted, losing data permanently."""
    from dask_ms_spark.dataset import Dataset
    from dask_ms_spark.sources.s3staging import boto3_client
    from dask_ms_spark.sources.storage import (xds_from_storage_table,
                                               xds_to_storage_table)

    server = ThreadedMotoServer(ip_address="127.0.0.1", port=0)
    server.start()
    try:
        host, port = server.get_host_and_port()
        endpoint = f"http://{host}:{port}"
        import boto3

        boto3.client(
            "s3", endpoint_url=endpoint,
            aws_access_key_id="testing",
            aws_secret_access_key="testing",
            region_name="us-east-1").create_bucket(Bucket="dms-zarr")
        opts = {"key": "testing", "secret": "testing",
                "client_kwargs": {"endpoint_url": endpoint}}
        url = "s3://dms-zarr/store"
        xds_to_storage_table([Dataset(nation, {})], url, fmt="zarr",
                             storage_options=opts)
        # the store metadata dotfiles must be among the uploaded keys
        client = boto3_client(opts)
        keys = [o["Key"] for o in client.list_objects_v2(
            Bucket="dms-zarr", Prefix="store")["Contents"]]
        assert any(k.endswith(".zgroup") for k in keys), keys
        assert any(k.endswith(".zarray") for k in keys), keys
        assert any(k.endswith(".zattrs") for k in keys), keys
        back = xds_from_storage_table(spark, url, storage_options=opts)
        got = sorted(r.n_nationkey for d in back
                     for r in d.df.select("n_nationkey").collect())
        assert got == sorted(
            r.n_nationkey for r in nation.select("n_nationkey").collect())
    finally:
        server.stop()


def test_katdal_uvw_from_per_corrprod_uvw(spark):
    """r9 review: a loader exposing katdal-style per-corr-product
    u/v/w arrays yields real UVW coordinates (previously zero-filled
    silently); and pol-suffixed corr_products ('m000h','m001v') map
    to deterministic dense antenna ids via _KatdalLoader.meta's
    name enumeration."""
    import numpy as np

    from dask_ms_spark.sources.katdal import xds_from_katdal

    class UVWLoader(FakeKatdalLoader):
        def read(self, start, stop):
            out = super().read(start, stop)
            ncp = len(self._cp())
            nd = stop - start
            base = (np.arange(start, stop)[:, None] * 10.0
                    + np.arange(ncp)[None, :] // 2)  # per-baseline
            out["u"] = base
            out["v"] = base + 0.25
            out["w"] = base + 0.5
            return out

    [ds0, _] = xds_from_katdal(spark, "fake://archive",
                               loader_factory=UVWLoader,
                               dumps_per_chunk=4)
    r = (ds0.df.where("TIME = 1e9 + 0.0 AND ANTENNA1 = 0 "
                      "AND ANTENNA2 = 2").first())
    # dump 0, baseline (0,2) = second baseline -> u = 0*10 + 1
    assert list(np.round(np.array(r.UVW), 3)) == [1.0, 1.25, 1.5]


def test_katdal_meta_parses_pol_suffixed_labels():
    """_KatdalLoader.meta on MeerKAT-style labels: same antenna's h/v
    products share one id, ids are dense and deterministic, and
    int-valued ds.spw is used directly (review r9)."""
    import numpy as np

    from dask_ms_spark.sources.katdal import _KatdalLoader

    class FakeDS:
        corr_products = [(a + p1, b + p2)
                         for a, b in (("m000", "m001"),
                                      ("m000", "m063"),
                                      ("m001", "m063"))
                         for p1 in "hv" for p2 in "hv"]
        shape = (2, 4, 12)
        timestamps = np.array([1.0, 2.0])
        spw = 1
        spectral_windows = ["SPW_OBJ_0", "SPW_OBJ_1"]

        class sensor:
            @staticmethod
            def get(name):
                return [0, 0]

    meta = _KatdalLoader(FakeDS()).meta()
    assert meta["antenna_names"] == ["m000", "m001", "m063"]
    ants = {(a, b) for a, b, _ in meta["corr_products"]}
    assert ants == {(0, 1), (0, 2), (1, 2)}
    corrs = {c for _, _, c in meta["corr_products"]}
    assert corrs == {0, 1, 2, 3}          # hh, hv, vh, vv -> dense
    assert meta["data_desc_id"] == 1      # int spw used directly


def test_sidecar_io_on_url_schemed_store(spark, tmp_path):
    """r9 review: fragment/keyword/card sidecars on a URL-schemed
    store route through the JVM Hadoop filesystem instead of
    driver-local open() (which silently collapsed remote fragment
    ancestry and crashed remote keyword writes after the data had
    landed).  file:// exercises the exact JVM code path s3a/hdfs
    take."""
    from dask_ms_spark.operators.overlay import (get_ancestry,
                                                 read_fragment,
                                                 write_fragment)
    from dask_ms_spark.sources import sidecar
    from dask_ms_spark.sources.keywords import (read_keywords,
                                                write_keywords)

    root_dir = tmp_path / "root_store"
    frag_dir = tmp_path / "frag_store"
    root_url = f"file://{root_dir}"
    frag_url = f"file://{frag_dir}"

    spark.createDataFrame([(0, 1.0), (1, 2.0)],
                          "ROWID long, V double") \
        .write.parquet(str(root_dir))
    frag = spark.createDataFrame([(1, 9.0)], "ROWID long, V double")
    write_fragment(frag, frag_url, parent=root_url)
    # sidecar landed as a real file, readable back through the URL
    assert (frag_dir / "_dask_ms_spark_fragment.json").exists()
    assert get_ancestry(frag_url) == [root_url, frag_url]
    got = {r.ROWID: r.V for r in read_fragment(spark, frag_url)
           .collect()}
    assert got == {0: 1.0, 1: 9.0}

    write_keywords(root_url, {"MS_VERSION": 2.0}, {"V": {"UNIT": "Jy"}})
    tk, ck = read_keywords(root_url)
    assert tk == {"MS_VERSION": 2.0} and ck["V"] == {"UNIT": "Jy"}
    assert sidecar.read_text(root_url, "nope.json") is None


def test_zarr_cell_chunks_zero_size_reshape(tmp_path):
    """r9 ADVICE: the flattened-cell returns used ``reshape(n, -1)``,
    which numpy refuses whenever the array size is 0 (it cannot infer
    -1 when the known dims multiply to 0).  Two affected paths:
    a zero-width cell axis with rank > 1 (ANY n_valid — the product
    of cell dims is 0), and a fully-pruned/empty trailing row chunk
    (n_valid == 0) on the main memmap path.  Both now use an explicit
    flattened width."""
    import numpy as np

    from dask_ms_spark.sources.zarr import _read_cell_chunks

    # zero-width axis, rank-2 cells: no chunk files exist on disk
    z0 = {"shape": [10, 0, 3], "chunks": [4, 1, 3],
          "dtype": "<f8", "compressor": None}
    out = _read_cell_chunks(str(tmp_path), "COL", z0, 0,
                            n_valid=4, slab=None)
    assert out.shape == (4, 0)
    out = _read_cell_chunks(str(tmp_path), "COL", z0, 0,
                            n_valid=0, slab=None)
    assert out.shape == (0, 0)

    # main path, rank-2 cells, n_valid == 0 (empty trailing chunk)
    col_dir = tmp_path / "DATA"
    col_dir.mkdir()
    chunk = np.arange(4 * 2 * 3, dtype="<f8")
    chunk.tofile(str(col_dir / "0.0.0"))
    z1 = {"shape": [4, 2, 3], "chunks": [4, 2, 3],
          "dtype": "<f8", "compressor": None}
    out = _read_cell_chunks(str(tmp_path), "DATA", z1, 0,
                            n_valid=0, slab=None)
    assert out.shape == (0, 6)
    # and the non-empty case still round-trips the flattened values
    out = _read_cell_chunks(str(tmp_path), "DATA", z1, 0,
                            n_valid=4, slab=None)
    assert out.shape == (4, 6)
    assert np.array_equal(out, chunk.reshape(4, 6))
