"""Reference-faithful MS data-model tests: the exact workload of
daskms/tests/test_ms_read_and_update.py:39-267 re-expressed on the
Spark engine, over the FIXTURES.md fixtures."""

import pytest
from pyspark.sql import functions as F

from dask_ms_spark.dataset import partition_datasets
from dask_ms_spark.example_data import (antenna_table, example_ms,
                                        ms_main_table,
                                        spectral_window_table)
from dask_ms_spark.functions import complexf
from dask_ms_spark.operators.joins import broadcast_lookup
from dask_ms_spark.operators.overlay import overlay
from dask_ms_spark.sources.parquet import xds_from_parquet, xds_to_parquet
from dask_ms_spark.types import ROWID, field_dims, field_shape


@pytest.fixture(scope="module")
def ms(spark):
    return ms_main_table(spark).cache()


def test_ms_group_partitioning(ms):
    """Group by (FIELD_ID, DATA_DESC_ID) — the reference's default MS
    read (daskms/dask_ms.py:12-13): 3 datasets with the fixture's
    group sizes."""
    dss = partition_datasets(ms, ["FIELD_ID", "DATA_DESC_ID"])
    got = {(d.attrs["FIELD_ID"], d.attrs["DATA_DESC_ID"]): d.df.count()
           for d in dss}
    assert got == {(0, 0): 3, (1, 0): 4, (2, 1): 3}


def test_ms_sorted_read_per_group(ms):
    """index_cols (TIME, ANTENNA1, ANTENNA2): rows come back
    TIME-ascending within each group (the np.lexsort oracle,
    daskms/tests/test_ms_read_and_update.py:185-204)."""
    dss = partition_datasets(ms, ["FIELD_ID", "DATA_DESC_ID"],
                             index_cols=["TIME", "ANTENNA1", "ANTENNA2"])
    for ds in dss:
        times = [r.TIME for r in ds.df.select("TIME").collect()]
        assert times == sorted(times)


def test_ms_where_filter(ms):
    """taql_where analogue: FIELD_ID >= 0 AND FIELD_ID < 2
    (daskms/tests/test_ms_read_and_update.py:210-267)."""
    dss = partition_datasets(ms, ["FIELD_ID", "DATA_DESC_ID"],
                             where="FIELD_ID >= 0 AND FIELD_ID < 2")
    assert {d.attrs["FIELD_ID"] for d in dss} == {0, 1}
    assert sum(d.df.count() for d in dss) == 7


def test_ms_update_column_roundtrip(spark, ms, tmp_path):
    """The reference's update test: write a known ramp into STATE_ID,
    re-read, assert (daskms/tests/test_ms_read_and_update.py:112-173).
    On the immutable store this is the overlay write path (S7)."""
    updates = ms.select(ROWID, (F.col(ROWID) % 3).cast("int")
                        .alias("STATE_ID"))
    updated = overlay(ms, updates, key=ROWID)
    store = str(tmp_path / "ms_updated")
    xds_to_parquet(updated, store)
    back = spark.read.parquet(store)
    got = {r[0]: r[1] for r in back.select(ROWID, "STATE_ID").collect()}
    assert got == {i: i % 3 for i in range(10)}
    # untouched DATA column survives byte-identically
    orig = {r[0]: r[1] for r in ms.select(ROWID, "DATA").collect()}
    after = {r[0]: r[1] for r in back.select(ROWID, "DATA").collect()}
    assert orig == after


def test_ms_partitioned_roundtrip_preserves_tensors(spark, ms, tmp_path):
    """Hive-partitioned write + grouped re-read: partition pruning and
    tensor payload equality (format round-trip family, SURVEY §5)."""
    store = str(tmp_path / "ms_store")
    dss = partition_datasets(ms, ["FIELD_ID", "DATA_DESC_ID"])
    xds_to_parquet(dss, store)
    back = xds_from_parquet(spark, store,
                            group_cols=["FIELD_ID", "DATA_DESC_ID"])
    assert len(back) == 3
    orig = {r[0]: r[1] for r in ms.select(ROWID, "DATA").collect()}
    for ds in back:
        for r in ds.df.select(ROWID, "DATA").collect():
            assert r[1] == orig[r[0]]


def test_ms_complex_data_ops(ms):
    """Complex arithmetic on the DATA tensor: DATA * conj(DATA) is
    |DATA|^2 + 0j elementwise (§2.7)."""
    prod = ms.select(
        ROWID,
        complexf.c_mul(F.col("DATA"), complexf.c_conj(F.col("DATA")))
        .alias("P"),
        complexf.c_abs2(F.col("DATA")).alias("A2"))
    for r in prod.collect():
        res = r.P
        mags = r.A2
        for k in range(len(mags)):
            assert res[2 * k] == pytest.approx(mags[k], rel=1e-5)
            assert res[2 * k + 1] == pytest.approx(0.0, abs=1e-5)


def test_ragged_spectral_window(spark):
    """Variably-shaped subtable: natively ragged arrays replace the
    reference's per-row datasets (SURVEY §1.2 / G2)."""
    spw = spectral_window_table(spark)
    rows = spw.orderBy(ROWID).collect()
    assert [r.NUM_CHAN for r in rows] == [8, 16, 32]
    assert all(len(r.CHAN_FREQ) == r.NUM_CHAN for r in rows)
    assert field_dims(spw.schema["CHAN_FREQ"]) == ("chan",)


def test_example_ms_subtable_join(spark):
    """The ms_subtable_join example (examples/ms_subtable_join.py:36-69)
    as broadcast joins: every main row's DATA shape matches the
    SPW/POL of its DATA_DESC_ID."""
    tables = example_ms(spark)
    main = tables["MAIN"]
    ddid = tables["DATA_DESCRIPTION"].select(
        F.col(ROWID).alias("DATA_DESC_ID"),
        "SPECTRAL_WINDOW_ID", "POLARIZATION_ID")
    spw = tables["SPECTRAL_WINDOW"].select(
        F.col(ROWID).alias("SPECTRAL_WINDOW_ID"), "NUM_CHAN")
    pol = tables["POLARIZATION"].select(
        F.col(ROWID).alias("POLARIZATION_ID"), "NUM_CORR")
    j = broadcast_lookup(
        broadcast_lookup(
            broadcast_lookup(main, ddid, "DATA_DESC_ID"),
            spw, "SPECTRAL_WINDOW_ID"),
        pol, "POLARIZATION_ID")
    rows = j.select("DATA", "NUM_CHAN", "NUM_CORR").collect()
    assert len(rows) == 10
    for r in rows:
        assert len(r.DATA) == 2 * r.NUM_CHAN * r.NUM_CORR
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 3


def test_ms_dims_metadata(ms):
    assert field_dims(ms.schema["DATA"]) == ("chan", "corr")
    assert field_shape(ms.schema["DATA"]) == (16, 4)
    assert field_dims(ms.schema["UVW"]) == ("uvw",)


def test_concat_ms_reindexes_subtable_ids(spark):
    """CASA-concat semantics: subtables stack in part order, MAIN's
    DATA_DESC_ID/FIELD_ID and DATA_DESCRIPTION's SPW/POL pointers
    shift by cumulative offsets, matching ANTENNA tables stay
    unstacked, and the combined MAIN is the plain row union
    otherwise."""
    import pytest
    from pyspark.sql import functions as F

    from dask_ms_spark.example_data import example_ms
    from dask_ms_spark.operators.msconcat import concat_ms

    a = example_ms(spark)
    b = example_ms(spark)
    out = concat_ms([a, b])

    assert out["MAIN"].count() == 2 * a["MAIN"].count()
    # part 1's ids shifted by part 0's subtable sizes (2 each)
    dd_ids = sorted(r[0] for r in
                    out["MAIN"].select("DATA_DESC_ID").distinct()
                    .collect())
    assert dd_ids == [0, 1, 2, 3]
    f_ids = sorted(r[0] for r in
                   out["MAIN"].select("FIELD_ID").distinct().collect())
    assert f_ids == [0, 1, 2, 3]
    # stacked DATA_DESCRIPTION points at offset SPW/POL rows
    dd = {r.ROWID: (r.SPECTRAL_WINDOW_ID, r.POLARIZATION_ID)
          for r in out["DATA_DESCRIPTION"].collect()}
    assert dd[0] == (0, 0) and dd[1] == (1, 1)
    assert dd[2] == (2, 2) and dd[3] == (3, 3)
    assert out["SPECTRAL_WINDOW"].count() == 4
    # SPW rowids re-based into one index space
    assert sorted(r.ROWID for r in
                  out["SPECTRAL_WINDOW"].collect()) == [0, 1, 2, 3]
    # per-dd row counts double
    n_by_dd = {r.DATA_DESC_ID: r.n for r in
               out["MAIN"].groupBy("DATA_DESC_ID")
               .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert n_by_dd[0] == n_by_dd[2] == 3
    assert n_by_dd[1] == n_by_dd[3] == 7

    # heterogeneous-antenna path and the mismatch guard
    ant = spark.createDataFrame([(0, "A0"), (1, "A1")],
                                "ROWID long, NAME string")
    ant2 = spark.createDataFrame([(0, "B0"), (1, "B1")],
                                 "ROWID long, NAME string")
    pa = dict(a); pa["ANTENNA"] = ant
    pb = dict(b); pb["ANTENNA"] = ant2
    with pytest.raises(ValueError, match="ANTENNA table differs"):
        concat_ms([pa, pb])
    het = concat_ms([pa, pb], match_antennas=False)
    assert sorted(r.NAME for r in het["ANTENNA"].collect()) == \
        ["A0", "A1", "B0", "B1"]


def test_concat_ms_offsets_observation_state(spark):
    """OBSERVATION / STATE / PROCESSOR are row-position-indexed like
    the big four: part 1's MAIN pointers shift by part 0's subtable
    size and the tables stack (CASA concat semantics — taking them
    from part 0 silently re-points part 1's metadata).  SOURCE is
    id-indexed by an explicit column: differing parts raise."""
    import pytest
    from pyspark.sql import functions as F

    from dask_ms_spark.example_data import example_ms
    from dask_ms_spark.operators.msconcat import concat_ms

    def with_obs(part, tag):
        p = dict(part)
        p["MAIN"] = p["MAIN"].withColumn(
            "OBSERVATION_ID", F.lit(0).cast("int"))
        p["OBSERVATION"] = spark.createDataFrame(
            [(0, f"proj-{tag}")], "ROWID long, PROJECT string")
        return p

    a = with_obs(example_ms(spark), "a")
    b = with_obs(example_ms(spark), "b")
    out = concat_ms([a, b])
    obs_ids = sorted(r[0] for r in out["MAIN"]
                     .select("OBSERVATION_ID").distinct().collect())
    assert obs_ids == [0, 1]
    assert sorted(r.PROJECT for r in out["OBSERVATION"].collect()) \
        == ["proj-a", "proj-b"]
    assert sorted(r.ROWID for r in out["OBSERVATION"].collect()) \
        == [0, 1]

    # SOURCE: identical across parts -> taken once; differing -> raise
    src = spark.createDataFrame([(0, "3C286")],
                                "SOURCE_ID long, NAME string")
    a["SOURCE"] = src
    b["SOURCE"] = src
    assert concat_ms([a, b])["SOURCE"].count() == 1
    b["SOURCE"] = spark.createDataFrame(
        [(0, "3C48")], "SOURCE_ID long, NAME string")
    with pytest.raises(ValueError, match="SOURCE table differs"):
        concat_ms([a, b])


def test_concat_ms_preserves_negative_sentinels(spark):
    """casacore's -1 "no row" sentinel must survive concat unshifted
    (review fix r8): offsetting it would re-point the row at a real
    part-0 subtable entry."""
    from pyspark.sql import functions as F

    from dask_ms_spark.example_data import example_ms
    from dask_ms_spark.operators.msconcat import concat_ms

    def with_state(part, n_main_states):
        p = dict(part)
        p["MAIN"] = p["MAIN"].withColumn(
            "STATE_ID",
            F.when(F.monotonically_increasing_id() % 2 == 0,
                   F.lit(-1)).otherwise(F.lit(0)).cast("int"))
        p["STATE"] = spark.createDataFrame(
            [(i, "OBSERVE") for i in range(n_main_states)],
            "ROWID long, OBS_MODE string")
        return p

    a = with_state(example_ms(spark), 2)
    b = with_state(example_ms(spark), 2)
    out = concat_ms([a, b])
    ids = sorted(r[0] for r in out["MAIN"].select("STATE_ID")
                 .distinct().collect())
    assert ids == [-1, 0, 2]      # -1 preserved; part-1's 0 -> 2
    assert out["STATE"].count() == 4


def test_concat_ms_stacks_keyed_subtables(spark):
    """r9 review: FEED/POINTING/SYSCAL/WEATHER/HISTORY stack with
    their SPECTRAL_WINDOW_ID/ANTENNA_ID/OBSERVATION_ID pointers
    shifted (CASA concat behaviour) — previously part>=1 rows were
    silently dropped while their spw targets moved."""
    from dask_ms_spark.example_data import example_ms
    from dask_ms_spark.operators.msconcat import concat_ms

    a = example_ms(spark)
    b = example_ms(spark)
    feed = spark.createDataFrame(
        [(0, 0, 0), (1, 1, 1)],
        "ROWID long, ANTENNA_ID int, SPECTRAL_WINDOW_ID int")
    a = dict(a); b = dict(b)
    a["FEED"] = feed
    b["FEED"] = feed
    out = concat_ms([a, b])
    rows = {r.ROWID: (r.ANTENNA_ID, r.SPECTRAL_WINDOW_ID)
            for r in out["FEED"].collect()}
    assert len(rows) == 4                       # stacked, not dropped
    # part 1 spw pointers shifted by part 0's 2 SPW rows; ANTENNA_ID
    # unshifted under match_antennas=True
    assert rows[0] == (0, 0) and rows[1] == (1, 1)
    assert rows[2] == (0, 2) and rows[3] == (1, 3)


def test_concat_ms_rejects_permuted_antenna(spark):
    """r9 review: ANTENNA identity is POSITIONAL — a permuted
    (same-values) antenna table must fail the match_antennas check,
    not silently mis-attribute part>=1 baselines."""
    import pytest

    from dask_ms_spark.example_data import example_ms
    from dask_ms_spark.operators.msconcat import concat_ms

    a = dict(example_ms(spark))
    b = dict(example_ms(spark))
    a["ANTENNA"] = spark.createDataFrame(
        [(0, "A0"), (1, "A1")], "ROWID long, NAME string")
    b["ANTENNA"] = spark.createDataFrame(
        [(0, "A1"), (1, "A0")], "ROWID long, NAME string")  # permuted
    with pytest.raises(ValueError, match="ROW ORDER"):
        concat_ms([a, b])


def test_overlay_rejects_duplicate_fragment_keys(spark):
    """r9 review: a fragment carrying two rows for one ROWID would
    multiply root rows through the left join — consolidate must raise
    instead of silently inflating the table."""
    import pytest

    from dask_ms_spark.operators.overlay import overlay

    root = spark.createDataFrame([(0, 1.0), (1, 2.0)],
                                 "ROWID long, V double")
    frag = spark.createDataFrame([(1, 9.0), (1, 8.0)],
                                 "ROWID long, V double")
    with pytest.raises(Exception, match="duplicate 'ROWID'"):
        overlay(root, frag).collect()
    ok = spark.createDataFrame([(1, 9.0)], "ROWID long, V double")
    got = {r.ROWID: r.V for r in overlay(root, ok).collect()}
    assert got == {0: 1.0, 1: 9.0}
