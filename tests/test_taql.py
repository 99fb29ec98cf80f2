"""TAQL taql_where translation: the reference's predicate strings keep
working on the Spark engine (sources/storage.py taql_where=)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dask_ms_spark.taql import taql_where_to_sql


def test_translation_strings():
    assert taql_where_to_sql(
        "ANTENNA1 != ANTENNA2 && FIELD_ID IN [0,2]") == \
        "ANTENNA1 != ANTENNA2 AND FIELD_ID IN (0 , 2)"
    assert taql_where_to_sql("!FLAG_ROW || NVIS > 3") == \
        "NOT FLAG_ROW OR NVIS > 3"
    assert "element_at(UVW, (0) + 1)" in taql_where_to_sql("UVW[0] > 0")
    assert "slice(UVW, (0) + 1, (2) - (0))" in \
        taql_where_to_sql("SUMSQR(UVW[:2]) < 1e6")


def test_translation_widened_tier():
    """Round-7 grammar tier: BETWEEN, NOT IN, LIKE passthrough, TAQL
    pattern operators, date/time helper folding (reference WHERE
    fragments, daskms/tests/test_ordering.py:32-117 style)."""
    assert taql_where_to_sql("TIME BETWEEN 100 AND 200") == \
        "TIME BETWEEN 100 AND 200"
    assert taql_where_to_sql("FIELD_ID NOT IN [1, 3]") == \
        "FIELD_ID NOT IN (1 , 3)"
    assert taql_where_to_sql("NAME LIKE '3c%'") == "NAME LIKE '3c%'"
    # p// glob: * -> %, ? -> _, SQL wildcards escaped
    assert taql_where_to_sql("NAME ~ p/3c*_?/") == \
        "NAME LIKE '3c%\\__'"
    assert taql_where_to_sql("NAME ~ m/^ea[0-9]+$/") == \
        "NAME RLIKE '^ea[0-9]+$'"
    assert taql_where_to_sql("NAME ~ f/ea01/") == "NAME = 'ea01'"
    assert taql_where_to_sql("NAME !~ p/3c*/") == \
        "NAME NOT LIKE '3c%'"
    assert taql_where_to_sql("NAME !~ f/ea01/") == "NAME != 'ea01'"
    # datetime folds to MJD seconds (casacore epoch 1858-11-17);
    # 2000-01-01 00:00 UTC is MJD 51544
    sql = taql_where_to_sql("TIME > DATETIME('2000/01/01')")
    assert sql == f"TIME > {51544 * 86400.0!r}"
    assert taql_where_to_sql("T < MJD('2000-01-01')") == \
        "T < 51544.0"
    half = 51544 * 86400.0 + 12 * 3600 + 30 * 60 + 1.5
    assert taql_where_to_sql(
        "TIME <= DATETIME('2000/01/01/12:30:01.5')") == \
        f"TIME <= {half!r}"


def test_widened_tier_raises():
    import pytest

    with pytest.raises(ValueError, match="bare date"):
        taql_where_to_sql("TIME > 2016/01/01")
    with pytest.raises(ValueError, match="pattern literal"):
        taql_where_to_sql("NAME ~ 'x'")
    with pytest.raises(ValueError, match="one string literal"):
        taql_where_to_sql("TIME > DATETIME(2016)")
    with pytest.raises(ValueError, match="cannot parse"):
        taql_where_to_sql("TIME > DATETIME('16/1')")


def test_widened_tier_executes(spark):
    """Pattern + BETWEEN predicates run on Spark and agree with a
    python model."""
    rows = [Row(NAME=n, T=float(t)) for t, n in enumerate(
        ["3c286", "3c48", "ea01", "ea02", "j1331+305"])]
    df = spark.createDataFrame(rows)
    assert df.where(F.expr(taql_where_to_sql(
        "NAME ~ p/3c*/"))).count() == 2
    assert df.where(F.expr(taql_where_to_sql(
        "NAME !~ m/^ea/"))).count() == 3
    assert df.where(F.expr(taql_where_to_sql(
        "T BETWEEN 1 AND 3 && NAME NOT IN ['ea02']"))).count() == 2


def test_unsupported_syntax_raises():
    # ~= with nothing to compare still refuses
    with pytest.raises(ValueError, match="no right operand"):
        taql_where_to_sql("a ~=")
    with pytest.raises(ValueError, match="strided"):
        taql_where_to_sql("UVW[0:4:2] = UVW[0:2]")
    with pytest.raises(ValueError, match="range-form"):
        taql_where_to_sql("FIELD_ID IN [0:3]")
    with pytest.raises(ValueError, match="unsupported|unbalanced"):
        taql_where_to_sql("a > 5 [")
    with pytest.raises(ValueError, match="tokenise"):
        taql_where_to_sql("TIME > 10:30:00 @ x")


def test_predicates_execute_on_spark(spark):
    """Translated predicates run and agree with a Python model on an
    MS-shaped frame (0-based TAQL indexing honoured)."""
    rows = [Row(ANTENNA1=a, ANTENNA2=b, FIELD_ID=f, FLAG_ROW=fl,
                UVW=[float(a), float(b), float(f)])
            for a in range(3) for b in range(3)
            for f in range(3) for fl in (True, False)]
    df = spark.createDataFrame(rows)

    sql = taql_where_to_sql(
        "ANTENNA1 != ANTENNA2 && FIELD_ID IN [0,2] && !FLAG_ROW")
    got = df.where(F.expr(sql)).count()
    want = sum(1 for r in rows if r.ANTENNA1 != r.ANTENNA2
               and r.FIELD_ID in (0, 2) and not r.FLAG_ROW)
    assert got == want > 0

    # sumsqr over a TAQL slice: first two UVW components
    sql2 = taql_where_to_sql("SUMSQR(UVW[:2]) < 3")
    got2 = df.where(F.expr(sql2)).count()
    want2 = sum(1 for r in rows
                if r.UVW[0] ** 2 + r.UVW[1] ** 2 < 3)
    assert got2 == want2 > 0

    # element access is 0-based in TAQL
    sql3 = taql_where_to_sql("UVW[2] = 1")
    assert df.where(F.expr(sql3)).count() == \
        sum(1 for r in rows if r.UVW[2] == 1)


def test_taql_where_through_storage_read(spark, tmp_path):
    """End-to-end: taql_where= on xds_from_storage_table filters the
    scan, composed with where= via AND."""
    from dask_ms_spark.sources.storage import xds_from_storage_table

    rows = [Row(ANTENNA1=a, ANTENNA2=(a + i) % 4, SCAN=i)
            for a in range(4) for i in range(4)]
    path = str(tmp_path / "ms_like")
    spark.createDataFrame(rows).write.parquet(path)

    dss = xds_from_storage_table(
        spark, path, where="SCAN < 3",
        taql_where="ANTENNA1 != ANTENNA2")
    got = sum(d.df.count() for d in dss)
    want = sum(1 for r in rows
               if r.SCAN < 3 and r.ANTENNA1 != r.ANTENNA2)
    assert got == want > 0


def test_convert_cli_taql_where(spark, tmp_path, monkeypatch):
    """Reference CLI parity: dask-ms convert --taql-where filters the
    converted output through the TAQL translation."""
    from dask_ms_spark import apps

    rows = [Row(ANTENNA1=a, ANTENNA2=(a + 1) % 3, SPW=a % 2)
            for a in range(30)]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows).write.parquet(src)

    # reuse the live test session instead of building a second one
    monkeypatch.setattr("dask_ms_spark.session.get_spark",
                        lambda *a, **k: spark)
    out = str(tmp_path / "out")
    apps.main(["convert", src, out,
               "--taql-where", "SPW IN [1] && ANTENNA1 != ANTENNA2"])
    got = spark.read.parquet(out)
    want = sum(1 for r in rows
               if r.SPW == 1 and r.ANTENNA1 != r.ANTENNA2)
    assert got.count() == want > 0


def test_taql_where_on_casa_read(spark):
    """The reference's highest-traffic call shape —
    xds_from_ms(..., taql_where=...) — works through the CASA seam:
    translated predicate filters the distributed chunked read."""
    from tests.test_sources import FakeCasaTable
    from dask_ms_spark.sources.casa import xds_from_casa

    cols = FakeCasaTable("/fake/ms").COLS
    dss = xds_from_casa(spark, "/fake/ms",
                        table_factory=FakeCasaTable, row_chunk=10,
                        taql_where="FIELD_ID IN [0,2] && UVW[0] > 0.5")
    got = sum(d.df.count() for d in dss)
    want = sum(1 for i in range(FakeCasaTable.N)
               if cols["FIELD_ID"][i] in (0, 2)
               and cols["UVW"][i][0] > 0.5)
    assert got == want > 0


def test_convert_cli_zarr_compressor(spark, tmp_path, monkeypatch):
    """dask-ms convert --format zarr --zarr-compressor zlib:6 writes
    a compressed store that round-trips."""
    import json as _json
    import os

    from dask_ms_spark import apps
    from dask_ms_spark.sources.zarr import xds_from_zarr

    src = str(tmp_path / "src2")
    spark.range(40).selectExpr(
        "id AS A", "cast(id * 2.0 AS double) AS B") \
        .write.parquet(src)
    monkeypatch.setattr("dask_ms_spark.session.get_spark",
                        lambda *a, **k: spark)
    out = str(tmp_path / "out2")
    apps.main(["convert", src, out, "--format", "zarr",
               "--zarr-compressor", "zlib:6"])
    meta = _json.load(open(os.path.join(out, "MAIN_0", "A",
                                        ".zarray")))
    assert meta["compressor"] == {"id": "zlib", "level": 6}
    (ds,) = xds_from_zarr(spark, out)
    assert ds.df.count() == 40
    assert {r.B for r in ds.df.where("A = 7").collect()} == {14.0}


def test_curate_cli_end_to_end(spark, tmp_path, monkeypatch, capsys):
    """dask-ms-spark curate: the full funnel over the real sf0.001
    documents table — counts strictly decrease through the stages,
    output is split-partitioned, card.json records the funnel."""
    import json
    import os

    from dask_ms_spark import apps

    monkeypatch.setattr("dask_ms_spark.session.get_spark",
                        lambda *a, **k: spark)
    out = str(tmp_path / "corpus")
    rc = apps.main(["curate", "/root/testdata/sf0.001/documents.parquet",
                    out, "--min-words", "5",
                    "--near-dup-threshold", "0.7"])
    assert rc == 0
    card = json.load(open(os.path.join(out, "_card.json")))
    f = card["funnel"]
    assert f["input"] == 500
    assert 0 < f["final"] <= \
        f["after_quality_and_exact_dedup"] <= f["input"]
    assert {r["split"] for r in card["splits"]} <= \
        {"train", "val", "test"}
    back = spark.read.parquet(out)
    assert back.count() == f["final"]
    assert "split" in back.columns
    # funnel summary printed as the last stdout line
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line) == f

    # decontamination stage: use the corpus itself as the eval set —
    # every surviving doc is fully contaminated and must drop
    out2 = str(tmp_path / "decon")
    rc = apps.main(["curate",
                    "/root/testdata/sf0.001/documents.parquet", out2,
                    "--min-words", "5",
                    "--decontaminate",
                    "/root/testdata/sf0.001/documents.parquet",
                    "--contamination-fraction", "0.99"])
    assert rc == 0
    card2 = json.load(open(os.path.join(out2, "_card.json")))
    assert card2["funnel"]["n_contaminated_dropped"] > 0
    assert card2["funnel"]["final"] == 0 or \
        card2["funnel"]["final"] < card["funnel"]["final"]


def test_negative_index_from_end(spark):
    """TAQL [-1] (last element) maps to Spark's negative
    element_at."""
    sql = taql_where_to_sql("UVW[-1] > 1.5")
    assert "element_at(UVW, -1)" in sql
    df = spark.createDataFrame(
        [([1.0, 2.0],), ([1.0, 1.0],)], "UVW array<double>")
    assert df.where(F.expr(sql)).count() == 1


def test_reference_chunks_kwarg(spark):
    """xds_from_ms(..., chunks={'row': N}) — the reference's standard
    call shape — maps to the scan's row chunking; unknown axes raise
    instead of being ignored."""
    import pytest

    from tests.test_sources import FakeCasaTable
    from dask_ms_spark.sources.casa import xds_from_casa

    dss = xds_from_casa(spark, "/fake/ms", table_factory=FakeCasaTable,
                        chunks={"row": 10})
    assert sum(d.df.count() for d in dss) == FakeCasaTable.N
    with pytest.raises(ValueError, match="only 'row'"):
        xds_from_casa(spark, "/fake/ms", table_factory=FakeCasaTable,
                      chunks={"row": 10, "chan": 4})


def test_bda_cli_end_to_end(spark, tmp_path, monkeypatch, capsys):
    """dask-ms-spark bda: MS-shaped parquet in, averaged bins out —
    short baselines compress harder than long ones, flags honoured."""
    import os

    from pyspark.sql import Row, functions as F

    from dask_ms_spark import apps

    monkeypatch.setattr("dask_ms_spark.session.get_spark",
                        lambda *a, **k: spark)
    rows = []
    for bl, uv in ((1, 50.0), (2, 800.0)):
        for i in range(16):
            rows.append(Row(ANTENNA1=0, ANTENNA2=bl, UVDIST=uv,
                            TIME=2.0 * i,
                            DATA=[float(i), float(bl)],
                            FLAG=[i % 2 == 0, False],
                            WEIGHT=1.0))
    src = str(tmp_path / "ms")
    spark.createDataFrame(
        rows, "ANTENNA1 long, ANTENNA2 long, UVDIST double, "
              "TIME double, DATA array<double>, FLAG array<boolean>, "
              "WEIGHT double").write.parquet(src)
    out = str(tmp_path / "bda")
    rc = apps.main(["bda", src, out, "--base-interval", "2",
                    "--ref-uvdist", "800", "--max-factor", "16",
                    "--data-col", "DATA", "--flag-col", "FLAG",
                    "--weight-col", "WEIGHT"])
    assert rc == 0
    assert "compression" in capsys.readouterr().out
    got = spark.read.parquet(out)
    per_bl = {r.ANTENNA2: r.n for r in got.groupBy("ANTENNA2")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_bl[1] == 1         # uv 50 -> factor 16 -> one 32s bin
    assert per_bl[2] == 16        # uv 800 -> factor 1 -> 2s bins
    short = got.where("ANTENNA2 = 1").collect()[0]
    assert short.n_rows == 16 and short.weight_sum == 16.0
    # element 0: odd i survive the flag -> mean of 1,3,...,15 = 8
    assert short.data_mean[0] == 8.0 and short.flag == [False, False]


def test_translation_near_equality_and_intervals():
    """Round-7 late tier: ~= / !~= near-(in)equality (casacore NEAR,
    Note-199 default 1e-5 relative tolerance) and interval
    membership X [NOT] IN [a=:=b] with =/< bound markers."""
    assert taql_where_to_sql("TIME ~= 4.5e9") == \
        ("abs((TIME) - (4.5e9)) <= 1.0E-5 * "
         "greatest(abs(TIME), abs(4.5e9))")
    assert taql_where_to_sql("TIME !~= 0") == \
        ("NOT (abs((TIME) - (0)) <= 1.0E-5 * "
         "greatest(abs(TIME), abs(0)))")
    # right operand extends through arithmetic, stops at booleans
    assert taql_where_to_sql("A ~= B + 1 && C") == \
        ("abs((A) - (B + 1)) <= 1.0E-5 * "
         "greatest(abs(A), abs(B + 1)) AND C")
    assert taql_where_to_sql("TIME IN [100 =:= 200]") == \
        "(TIME >= 100 AND TIME <= 200)"
    assert taql_where_to_sql("TIME IN [100 <:< 200]") == \
        "(TIME > 100 AND TIME < 200)"
    assert taql_where_to_sql("TIME NOT IN [100 =:< 200]") == \
        "NOT (TIME >= 100 AND TIME < 200)"
    # composes inside boolean algebra
    assert taql_where_to_sql(
        "ANTENNA1 != ANTENNA2 && TIME IN [1e9=:=2e9]") == \
        "ANTENNA1 != ANTENNA2 AND (TIME >= 1e9 AND TIME <= 2e9)"
    # plain range-form still refuses (ambiguous semantics)
    with pytest.raises(ValueError, match="range-form"):
        taql_where_to_sql("TIME IN [1:5]")


def test_near_equality_executes(spark):
    """The emitted near-equality SQL runs in Spark and behaves like
    casacore NEAR: equal-within-1e-5-relative passes, outside
    fails."""
    df = spark.createDataFrame(
        [(1, 1e9, 1e9 + 1e3), (2, 1e9, 1e9 + 1e6)],
        "id long, a double, b double")
    sql = taql_where_to_sql("a ~= b")
    got = sorted(r.id for r in df.where(sql).collect())
    assert got == [1]            # 1e3/1e9 = 1e-6 near; 1e-3 not


def test_near_equality_arithmetic_lhs():
    """The LHS of ~= extends back through arithmetic (TAQL comparison
    binds looser than '+'): 'A + B ~= C' compares A + B, not B —
    popping one token silently mistranslated it (r7 advice)."""
    from dask_ms_spark.taql import taql_where_to_sql

    assert taql_where_to_sql("A + B ~= C") == (
        "abs((A + B) - (C)) <= 1.0E-5 * "
        "greatest(abs(A + B), abs(C))")
    # the LHS scan stops at a boolean operator, not before it
    assert taql_where_to_sql("X > 2 && A - 1 ~= C") == (
        "X > 2 AND abs((A - 1) - (C)) <= 1.0E-5 * "
        "greatest(abs(A - 1), abs(C))")
    # pattern matches share the scan: a parenthesised LHS survives
    assert taql_where_to_sql("(NAME) ~ p/3C*/") == \
        "( NAME ) LIKE '3C%'"


def test_nested_select_translation():
    """Tier 4: TAQL nested queries (X IN [SELECT ...]) translate to
    Spark IN-subqueries; ::SUBTABLE maps to the bare view name and
    ROWID() to the ROWID column the readers attach."""
    import pytest

    from dask_ms_spark.taql import taql_where_to_sql

    assert taql_where_to_sql(
        "ANTENNA1 IN [SELECT ROWID() FROM ::ANTENNA "
        "WHERE NAME ~ p/RT*/]") == \
        "ANTENNA1 IN (SELECT ROWID FROM ANTENNA WHERE NAME LIKE 'RT%')"
    assert taql_where_to_sql(
        "FIELD_ID IN [SELECT DISTINCT FIELD_ID FROM FIELD "
        "WHERE SOURCE_ID >= 2]") == \
        ("FIELD_ID IN (SELECT DISTINCT FIELD_ID FROM FIELD "
         "WHERE SOURCE_ID >= 2)")
    with pytest.raises(ValueError, match="FROM clause"):
        taql_where_to_sql("A IN [SELECT x]")


def test_multitable_nested_select_translation():
    """r12 (r11 verdict item 5): TAQL Note 199 multi-table nested
    selects — ``FROM ::TAB1 a, ::TAB2 b`` comma joins with aliases,
    qualified columns, and qualified ROWID() all translate; malformed
    FROM lists still refuse loudly."""
    import pytest

    from dask_ms_spark.taql import taql_where_to_sql

    assert taql_where_to_sql(
        "DATA_DESC_ID IN [SELECT d.ROWID() FROM ::DATA_DESCRIPTION d,"
        " ::SPECTRAL_WINDOW s WHERE d.SPECTRAL_WINDOW_ID = s.ROWID()"
        " && s.NUM_CHAN = 64]") == \
        ("DATA_DESC_ID IN (SELECT d.ROWID FROM DATA_DESCRIPTION d, "
         "SPECTRAL_WINDOW s WHERE d.SPECTRAL_WINDOW_ID = s.ROWID "
         "AND s.NUM_CHAN = 64)")
    # alias form without :: prefix; two bare names
    assert taql_where_to_sql(
        "A IN [SELECT x FROM tab1 t, tab2]") == \
        "A IN (SELECT x FROM tab1 t, tab2)"
    # the old two-token form is now the alias form, not an error
    assert taql_where_to_sql("A IN [SELECT x FROM tab1 tab2]") == \
        "A IN (SELECT x FROM tab1 tab2)"
    with pytest.raises(ValueError, match="comma-separated"):
        taql_where_to_sql("A IN [SELECT x FROM tab1 t u, tab2]")
    with pytest.raises(ValueError, match="ends with a comma"):
        taql_where_to_sql("A IN [SELECT x FROM tab1,]")
    with pytest.raises(ValueError, match="registered table/view"):
        taql_where_to_sql("A IN [SELECT x FROM 1tab]")


def test_multitable_nested_select_executes(spark):
    """The translated comma join runs in Spark as an equi-join under
    the WHERE equality — the casacore subtable-resolution semantics
    for a DATA_DESC_ID probe through SPECTRAL_WINDOW."""
    from dask_ms_spark.taql import taql_where_to_sql

    spark.createDataFrame(
        [(0, 0), (1, 1), (2, 2)],
        "ROWID long, SPECTRAL_WINDOW_ID long") \
        .createOrReplaceTempView("DATA_DESCRIPTION")
    spark.createDataFrame(
        [(0, 64), (1, 128), (2, 64)], "ROWID long, NUM_CHAN long") \
        .createOrReplaceTempView("SPECTRAL_WINDOW")
    main = spark.createDataFrame(
        [(i, i % 3) for i in range(30)],
        "row long, DATA_DESC_ID int")
    sql = taql_where_to_sql(
        "DATA_DESC_ID IN [SELECT d.ROWID() FROM ::DATA_DESCRIPTION d,"
        " ::SPECTRAL_WINDOW s WHERE d.SPECTRAL_WINDOW_ID = s.ROWID()"
        " && s.NUM_CHAN = 64]")
    got = sorted(r.row for r in main.where(sql).collect())
    assert got == [i for i in range(30) if i % 3 in (0, 2)]
    # plan check: the comma join under the equality is an equi-join,
    # not a cartesian product
    plan = main.where(sql)._jdf.queryExecution().executedPlan() \
        .toString()
    assert "CartesianProduct" not in plan


def test_nested_select_executes(spark):
    """The translated IN-subquery runs in Spark as a semi-join
    against a registered view — the reference's casacore rowid-set
    probe semantics."""
    from dask_ms_spark.taql import taql_where_to_sql

    spark.createDataFrame(
        [(0, "RT1"), (1, "RT2"), (2, "CS1")],
        "ROWID long, NAME string").createOrReplaceTempView("ANTENNA")
    main = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "row long, ANTENNA1 int")
    sql = taql_where_to_sql(
        "ANTENNA1 IN [SELECT ROWID() FROM ::ANTENNA "
        "WHERE NAME ~ p/RT*/]")
    got = main.where(sql).count()
    assert got == 20                     # antennas 0 and 1 match


def test_array_reductions_translate_and_execute(spark):
    """Tier 5: casacore array-reduction predicates (the flagging
    idioms) map to Spark higher-order functions and execute; SUM over
    an array stays refused (SQL-aggregate name collision)."""
    import pytest

    from dask_ms_spark.taql import taql_where_to_sql

    assert taql_where_to_sql("!ALL(FLAG)") == \
        "NOT forall(FLAG, __v -> __v)"
    assert taql_where_to_sql("NTRUE(FLAG) < NELEMENTS(FLAG)") == \
        "size(filter(FLAG, __v -> __v)) < size(FLAG)"
    df = spark.createDataFrame(
        [(0, [True, True]), (1, [True, False]), (2, [False, False])],
        "id long, FLAG array<boolean>")
    assert sorted(r.id for r in df.where(
        taql_where_to_sql("!ALL(FLAG)")).collect()) == [1, 2]
    assert sorted(r.id for r in df.where(
        taql_where_to_sql("ANY(FLAG)")).collect()) == [0, 1]
    assert sorted(r.id for r in df.where(taql_where_to_sql(
        "NTRUE(FLAG) == NFALSE(FLAG)")).collect()) == [1]
    with pytest.raises(ValueError):
        taql_where_to_sql("NTRUE() > 0")


def test_array_aggregates_schema_bound(spark, tmp_path):
    """r9: SUM/MIN/MAX/MEAN over an ARRAY column translate to
    higher-order reductions when the schema is bound (casacore Note
    199 array aggregates); bare calls stay refused (SQL-aggregate
    name collision), and scalar columns pass the names through."""
    import pytest

    from dask_ms_spark.taql import taql_where_to_sql

    # refusal without schema, with guidance
    with pytest.raises(ValueError, match="ambiguous without a schema"):
        taql_where_to_sql("SUM(SIGMA) > 1")

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0], 1.0), (1, [10.0, 20.0, 30.0], 2.0),
         (2, [0.0, 0.0, 0.0], 3.0)],
        "id long, SIGMA array<double>, W double")

    # one executed-in-Spark assertion per function
    assert sorted(r.id for r in df.where(taql_where_to_sql(
        "SUM(SIGMA) > 10", schema=df.schema)).collect()) == [1]
    assert sorted(r.id for r in df.where(taql_where_to_sql(
        "MIN(SIGMA) >= 1.0", schema=df.schema)).collect()) == [0, 1]
    assert sorted(r.id for r in df.where(taql_where_to_sql(
        "MAX(SIGMA) == 30", schema=df.schema)).collect()) == [1]
    assert sorted(r.id for r in df.where(taql_where_to_sql(
        "MEAN(SIGMA) ~= 2.0", schema=df.schema)).collect()) == [0]
    # slice operand: the root column decides array-ness
    assert sorted(r.id for r in df.where(taql_where_to_sql(
        "SUM(SIGMA[:2]) < 4", schema=df.schema)).collect()) == [0, 2]
    # iterable-of-names schema form
    assert "array_min" in taql_where_to_sql("MIN(SIGMA) > 0",
                                            schema={"SIGMA"})
    # scalar column under a bound schema: name passes through
    assert taql_where_to_sql("MAX(W) > 1",
                             schema=df.schema) == "MAX ( W ) > 1"

    # through the storage read path: parquet footer peek binds schema
    from dask_ms_spark.sources.storage import xds_from_storage_table

    p = str(tmp_path / "sig.parquet")
    df.write.parquet(p)
    [ds] = xds_from_storage_table(spark, p,
                                  taql_where="MEAN(SIGMA) > 5")
    assert sorted(r.id for r in ds.df.collect()) == [1]


def test_array_aggregates_nest_and_refuse_mixed(spark, tmp_path):
    """r9 review: (a) the bound schema propagates into nested-SELECT
    WHERE clauses, (b) mixed / derived operands refuse loudly in the
    translator instead of erroring deep inside Spark analysis, (c)
    element access (scalar-valued) is not an array reduction."""
    import pytest

    from dask_ms_spark.taql import taql_where_to_sql

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0], 1.0), (1, [10.0, 20.0, 30.0], 2.0)],
        "id long, SIGMA array<double>, W double")
    df.createOrReplaceTempView("SIG_T")

    # (a) array aggregate INSIDE a nested query, schema bound once
    got = df.where(taql_where_to_sql(
        "id IN [SELECT id FROM SIG_T WHERE SUM(SIGMA) > 10]",
        schema=df.schema)).collect()
    assert [r.id for r in got] == [1]

    # (b) operand-order independence: both spellings refuse the same
    # (MEAN(ABS(...)) now TRANSLATES via the elementwise lift — see
    # test_array_aggregate_elementwise_and_complex_views — so the
    # refusal probe uses an unsupported function name instead)
    for expr in ("SUM(SIGMA[0] * W)", "SUM(W * SIGMA[0])",
                 "MEAN(FOO(SIGMA))"):
        with pytest.raises(ValueError, match="mixes an array column"):
            taql_where_to_sql(expr, schema=df.schema)

    # (c) element access drops the array rank -> refusal, not an
    # aggregate over a scalar
    with pytest.raises(ValueError, match="mixes an array column"):
        taql_where_to_sql("SUM(SIGMA[0]) > 1", schema=df.schema)

    # parenthesised bare column still translates
    assert sorted(r.id for r in df.where(taql_where_to_sql(
        "MAX((SIGMA)) == 30", schema=df.schema)).collect()) == [1]


def test_array_aggregates_bind_for_casa_and_zarr(spark, tmp_path):
    """r9 review: the motivating idiom MEAN(SIGMA) < x must work on
    the PRIMARY MS formats without a hand-spelled schema — the casa
    reader binds its probed schema, the zarr leg binds from .zarray
    metadata, and the s3-staged recursion defers until local."""
    from dask_ms_spark.dataset import Dataset
    from dask_ms_spark.sources.storage import xds_from_storage_table
    from dask_ms_spark.sources.zarr import (peek_array_columns,
                                            xds_to_zarr)

    df = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0], 1.0), (1, [10.0, 20.0, 30.0], 2.0),
         (2, [0.0, 0.0, 0.0], 3.0)],
        "id long, SIGMA array<double>, W double")

    store = str(tmp_path / "sig_zarr")
    xds_to_zarr([Dataset(df, {})], store)
    assert peek_array_columns(store) == {"SIGMA"}
    [ds] = xds_from_storage_table(spark, store,
                                  taql_where="MEAN(SIGMA) > 5")
    assert sorted(r.id for r in ds.df.collect()) == [1]

    # casa: the reader translates against the probed schema (fake
    # factory seam — same harness as the casa scan tests)
    from dask_ms_spark.sources.casa import xds_from_casa
    from dask_ms_spark.types import ROWID
    from tests.test_sources import FakeCasaTable

    cols = FakeCasaTable("/fake/ms").COLS
    want_ids = sorted(
        int(i) for i in range(FakeCasaTable.N)
        if cols["UVW"][i].sum() > 1.5)
    [ds] = xds_from_casa(spark, "/fake/ms", columns=["TIME", "UVW"],
                         taql_where="SUM(UVW) > 1.5",
                         table_factory=FakeCasaTable)
    got_ids = sorted(r[ROWID] for r in ds.df.collect())
    assert got_ids == want_ids and want_ids  # non-degenerate filter


def test_array_aggregate_elementwise_and_complex_views(spark):
    """r9: elementwise functions (ABS/SQRT/SQUARE/...) and complex
    views (AMPLITUDE/PHASE/REAL/IMAG over the interleaved re/im
    layout) lift into the array-aggregate operand — the casacore
    flagging idioms mean(abs(SIGMA)) / mean(abs(DATA)).  One
    executed-in-Spark assertion per family."""
    import math

    from dask_ms_spark.taql import taql_where_to_sql

    df = spark.createDataFrame(
        [(0, [-1.0, 2.0, -3.0], [3.0, 4.0, 0.0, 1.0]),
         (1, [-10.0, 20.0, -30.0], [0.0, 0.0, 6.0, 8.0])],
        "id long, SIGMA array<double>, DATA array<double>")
    S = df.schema

    def ids(expr):
        return sorted(r.id for r in
                      df.where(taql_where_to_sql(expr, schema=S))
                      .collect())

    # |SIGMA| means: row0 (1+2+3)/3=2, row1 20
    assert ids("MEAN(ABS(SIGMA)) <= 2") == [0]
    assert ids("MAX(SQRT(ABS(SIGMA))) > 5") == [1]
    assert ids("SUM(SQUARE(SIGMA)) < 100") == [0]
    assert ids("MIN(FLOOR(SIGMA)) == -30") == [1]
    # amplitudes: row0 [5, 1], row1 [0, 10]
    assert ids("MAX(AMPLITUDE(DATA)) == 5") == [0]
    assert ids("MEAN(AMPLITUDE(DATA)) == 5") == [1]
    assert ids("SUM(REAL(DATA)) == 3") == [0]
    assert ids("SUM(IMAG(DATA)) == 8") == [1]
    # phase of (0,6)+(8j... row1 pairs: (0,0) atan2(0,0)=0, (6,8)
    want = math.atan2(8.0, 6.0)
    assert ids(f"MAX(PHASE(DATA)) ~= {want!r}") == [1]
    # nesting: amplitude then abs (no-op) then mean
    assert ids("MEAN(ABS(AMPLITUDE(DATA))) == 3") == [0]


def test_tier7_quantity_translation():
    """Tier 7: NUMBER UNIT folds to one double literal in the
    engine's conventions (angles->rad, time->s, length->m,
    freq->Hz), driver-side so every engine sees the same literal."""
    import math

    from dask_ms_spark.taql import taql_where_to_sql as T

    assert T("UVW[0] < 5km") == "element_at(UVW, (0) + 1) < 5000.0"
    assert T("B > 1.5GHz").endswith("1500000000.0")
    assert T("TIME > 30 min") == "TIME > 1800.0"
    assert T("A < 30arcsec").endswith(repr(30 * math.pi / 648000.0))
    assert T("A IN [1deg =:= 2deg]") == (
        f"(A >= {math.pi / 180.0!r} AND A <= {2 * math.pi / 180.0!r})")
    # quoted quantities stay string literals (documented NOT covered)
    assert T("NAME == '5deg'") == "NAME == '5deg'"
    # a number NOT followed by a unit is untouched
    assert T("A < 5") == "A < 5"


def test_tier7_mscal_refusals():
    import pytest as _pytest

    from dask_ms_spark.taql import taql_where_to_sql as T

    geo = {"lon_deg": 21.44, "lat_deg": -30.71,
           "ra_deg": 80.0, "dec_deg": -45.0}
    with _pytest.raises(ValueError, match="needs the mscal"):
        T("MSCAL.HA1 > 0")
    with _pytest.raises(ValueError, match="not in the translated"):
        T("MSCAL.LAST > 0", mscal=geo)
    with _pytest.raises(ValueError, match="qualified names"):
        T("FOO.BAR > 0", mscal=geo)
    with _pytest.raises(ValueError, match="geometry keys"):
        T("MSCAL.PA1 > 0", mscal={"lon_deg": 0.0})


def test_tier7_mscal_threads_through_array_operands():
    """ADVICE r10: _emit_array_operand must thread mscal= so a
    predicate mixing an array aggregate with tier-7 terms translates
    when geometry IS supplied; MSCAL nested INSIDE the array operand
    itself is refused with the array-operand message (not a spurious
    'needs the mscal=' when geometry was in fact given)."""
    import pytest as _pytest

    from dask_ms_spark.taql import taql_where_to_sql as T

    geo = {"lon_deg": 21.44, "lat_deg": -30.71,
           "ra_deg": 80.0, "dec_deg": -45.0}
    sch = {"SIGMA"}
    out = T("MEAN(ABS(SIGMA)) <= 2 && MSCAL.PA1 > 0",
            schema=sch, mscal=geo)
    assert "aggregate" in out and "atan" in out.lower()
    # units compare fine against an array aggregate
    out2 = T("MAX(SIGMA) < 5deg", schema=sch)
    assert out2.endswith(repr(5 * 3.141592653589793 / 180.0))
    # no array column in the operand: HAVING-style passthrough, with
    # the MSCAL body still expanded (the threading under test)
    out3 = T("MEAN(MSCAL.PA1) > 0", schema=sch, mscal=geo)
    assert out3.startswith("MEAN") and "atan2" in out3
    # an array column MIXED with MSCAL inside the operand refuses
    # with the array-operand message, not a spurious mscal error
    with _pytest.raises(ValueError, match="array column"):
        T("MEAN(SIGMA * MSCAL.PA1) > 0", schema=sch, mscal=geo)


def test_tier7_mscal_matches_column_builders(spark):
    """Executed parity, one assertion per derived column: the SQL the
    translator emits must agree with the functions/mscal.py Column
    builders (radians of their degree outputs) to float precision on
    a sweep of MS TIME values."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from dask_ms_spark.functions.mscal import (elevation_deg,
                                               hour_angle_deg,
                                               parallactic_angle_deg)
    from dask_ms_spark.taql import _mscal_sql

    geo = {"lon_deg": 21.443, "lat_deg": -30.712,
           "ra_deg": 80.894, "dec_deg": -45.779}
    # ~1 sidereal day of MS TIME (MJD seconds), 97 samples
    base = 5.05e9
    df = spark.range(97).select(
        "id", (F.lit(base) + F.col("id") * 900.0).alias("TIME"))
    lon, lat = F.lit(geo["lon_deg"]), F.lit(geo["lat_deg"])
    ra, dec = F.lit(geo["ra_deg"]), F.lit(geo["dec_deg"])
    cols = {
        "HA1": F.radians(hour_angle_deg(F.col("TIME"), lon, ra)),
        "PA1": F.radians(parallactic_angle_deg(
            F.col("TIME"), lon, lat, ra, dec)),
        "EL": F.radians(elevation_deg(F.col("TIME"), lon, lat,
                                      ra, dec)),
    }
    sqls = {
        "HA1": _mscal_sql("HA1", geo),
        "PA1": _mscal_sql("PA1", geo),
        "EL": f"element_at({_mscal_sql('AZEL1', geo)}, 2)",
    }
    out = df.select(
        *[F.expr(sqls[k]).alias(f"{k}_sql") for k in cols],
        *[v.alias(f"{k}_col") for k, v in cols.items()]).collect()
    for r in out:
        for k in cols:
            assert r[f"{k}_sql"] == _pytest.approx(
                r[f"{k}_col"], abs=1e-9), (k, r)


def test_tier7_azel_convention(spark):
    """Azimuth convention spot checks (north through east, [0, 2pi)):
    at hour angle 0 a source north of the zenith sits at az 0, south
    of it at az pi; just past the meridian (H > 0) the azimuth moves
    into the western half.  The RA that makes H(t0) = 0 is solved
    with the same USNO GMST polynomial driver-side."""
    import math

    import pytest as _pytest
    from pyspark.sql import functions as F

    from dask_ms_spark.taql import _mscal_sql

    t0, lon, lat = 5.05e9, 21.443, -30.712
    d = t0 / 86400.0 - 51544.5
    gmst_h = (18.697374558 + 24.06570982441908 * d) % 24.0
    ra0 = (gmst_h * 15.0 + lon) % 360.0        # H(t0) == 0
    df = spark.createDataFrame([(t0,)], "TIME double")

    def azel(dec_deg, ra_deg=ra0):
        geo = {"lon_deg": lon, "lat_deg": lat,
               "ra_deg": ra_deg, "dec_deg": dec_deg}
        r = df.select(F.expr(_mscal_sql("AZEL1", geo)).alias("ae")) \
            .first().ae
        return r[0], r[1]

    az, el = azel(lat + 10.0)        # 10 deg north of zenith
    assert az == _pytest.approx(0.0, abs=1e-6) \
        or az == _pytest.approx(2 * math.pi, abs=1e-6)
    assert el == _pytest.approx(math.radians(80.0), abs=1e-6)
    az, el = azel(lat - 10.0)        # 10 deg south of zenith
    assert az == _pytest.approx(math.pi, abs=1e-6)
    assert el == _pytest.approx(math.radians(80.0), abs=1e-6)
    # 15 deg past the meridian (H = +15 deg): western half
    az, el = azel(lat - 30.0, (ra0 - 15.0) % 360.0)
    assert math.pi < az < 2 * math.pi


def test_tier7_mscal_predicate_executes(spark):
    """End-to-end: a tier-7 predicate string filters a DataFrame and
    agrees with the equivalent Column-built filter."""
    from pyspark.sql import functions as F

    from dask_ms_spark.functions.mscal import hour_angle_deg
    from dask_ms_spark.taql import taql_where_to_sql as T

    geo = {"lon_deg": 21.443, "lat_deg": -30.712,
           "ra_deg": 80.894, "dec_deg": -45.779}
    df = spark.range(200).select(
        "id", (F.lit(5.05e9) + F.col("id") * 451.0).alias("TIME"))
    sql = T("MSCAL.HA1 > 0.3rad && TIME > 30 min", mscal=geo)
    got = sorted(r.id for r in df.where(sql).collect())
    want = sorted(r.id for r in df.where(
        (F.radians(hour_angle_deg(F.col("TIME"),
                                  F.lit(geo["lon_deg"]),
                                  F.lit(geo["ra_deg"]))) > 0.3)
        & (F.col("TIME") > 1800.0)).collect())
    assert got == want and got


def test_tier7_mscal_through_storage_read(spark, tmp_path):
    """taql_mscal threads the tier-7 geometry through the public
    storage dispatch, so a reference-style call site can pass an
    mscal predicate directly to xds_from_storage_table."""
    from pyspark.sql import functions as F

    from dask_ms_spark.functions.mscal import hour_angle_deg
    from dask_ms_spark.sources.storage import xds_from_storage_table

    geo = {"lon_deg": 21.443, "lat_deg": -30.712,
           "ra_deg": 80.894, "dec_deg": -45.779}
    path = str(tmp_path / "ms_main")
    spark.range(200).select(
        F.col("id").alias("ROWID"),
        (F.lit(5.05e9) + F.col("id") * 451.0).alias("TIME")) \
        .write.parquet(path)
    (ds,) = xds_from_storage_table(
        spark, path, taql_where="MSCAL.HA1 > 0.3rad",
        taql_mscal=geo)
    got = sorted(r.ROWID for r in ds.df.collect())
    src = spark.read.parquet(path)
    want = sorted(r.ROWID for r in src.where(
        F.radians(hour_angle_deg(F.col("TIME"),
                                 F.lit(geo["lon_deg"]),
                                 F.lit(geo["ra_deg"]))) > 0.3).collect())
    assert got == want and got


def test_tier7_mscal_uvw(spark):
    """r11 (r10 verdict item 6): MSCAL.UVW/UVW_J2000 translates to
    the Thompson-Moran-Swenson baseline rotation over explicitly
    bound baseline component columns, and the emitted SQL agrees
    with operators/calibration.uvw_from_baseline (wavelength=1) when
    fed the same hour angle, to float precision."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from dask_ms_spark.functions.mscal import hour_angle_deg
    from dask_ms_spark.operators.calibration import uvw_from_baseline
    from dask_ms_spark.taql import _mscal_sql, taql_where_to_sql as T

    geo = {"lon_deg": 21.443, "lat_deg": -30.712,
           "ra_deg": 80.0, "dec_deg": -45.0,
           "bx_col": "bx", "by_col": "by", "bz_col": "bz"}
    # refusals: missing baseline columns, clear message
    with _pytest.raises(ValueError, match="bx_col"):
        T("MSCAL.UVW[2] > 0",
          mscal={k: geo[k] for k in ("lon_deg", "lat_deg",
                                     "ra_deg", "dec_deg")})
    # translator emits the rotation; [2] is w (0-based TAQL index)
    sql = T("MSCAL.UVW_J2000[2] > 0", mscal=geo)
    assert "element_at" in sql and "atan2" not in sql

    df = spark.range(40).select(
        "id",
        (F.col("id") * 977.0 % 4000.0 + 4.9e9).alias("TIME"),
        ((F.col("id") * 17.3) % 1000.0 - 500.0).alias("bx"),
        ((F.col("id") * 11.9) % 1000.0 - 500.0).alias("by"),
        ((F.col("id") * 5.7) % 200.0 - 100.0).alias("bz"))
    import math
    ha = F.radians(hour_angle_deg(F.col("TIME"), F.lit(geo["lon_deg"]),
                                  F.lit(geo["ra_deg"])))
    want = uvw_from_baseline(df.withColumn("ha", ha), "bx", "by",
                             "bz", "ha", dec=math.radians(-45.0))
    got = df.select("id", F.expr(_mscal_sql("UVW", geo)).alias("uvw"))
    rows = (want.select("id", "u", "v", "w")
            .join(got, "id")
            .select((F.abs(F.col("u") - F.element_at("uvw", 1))
                     + F.abs(F.col("v") - F.element_at("uvw", 2))
                     + F.abs(F.col("w") - F.element_at("uvw", 3)))
                    .alias("err")))
    max_err = rows.agg(F.max("err")).first()[0]
    assert max_err < 1e-9
    # predicate executes end-to-end and matches the Column filter
    kept_sql = sorted(r.id for r in df.where(
        T("MSCAL.UVW[2] > 0", mscal=geo)).select("id").collect())
    kept_col = sorted(r.id for r in want.where(F.col("w") > 0)
                      .select("id").collect())
    assert kept_sql == kept_col and 0 < len(kept_sql) < 40


def test_tier7_uvw_through_storage_read(spark, tmp_path):
    """End-to-end: taql_mscal= with baseline column names drives the
    UVW derived column through xds_from_storage_table's dispatch —
    the reference call shape with casacore-derived UVW cuts."""
    import math

    from dask_ms_spark.functions.mscal import hour_angle_deg
    from dask_ms_spark.operators.calibration import uvw_from_baseline
    from dask_ms_spark.sources.storage import xds_from_storage_table

    geo = {"lon_deg": 21.443, "lat_deg": -30.712,
           "ra_deg": 80.0, "dec_deg": -45.0,
           "bx_col": "BX", "by_col": "BY", "bz_col": "BZ"}
    rows = spark.range(60).select(
        "id",
        (F.col("id") * 977.0 % 4000.0 + 4.9e9).alias("TIME"),
        ((F.col("id") * 17.3) % 1000.0 - 500.0).alias("BX"),
        ((F.col("id") * 11.9) % 1000.0 - 500.0).alias("BY"),
        ((F.col("id") * 5.7) % 200.0 - 100.0).alias("BZ"))
    path = str(tmp_path / "ms_like")
    rows.write.parquet(path)

    dss = xds_from_storage_table(
        spark, path, taql_where="MSCAL.UVW[2] > 0", taql_mscal=geo)
    got = sorted(r.id for d in dss for r in d.df.select("id").collect())

    ha = F.radians(hour_angle_deg(F.col("TIME"), F.lit(geo["lon_deg"]),
                                  F.lit(geo["ra_deg"])))
    want_df = uvw_from_baseline(rows.withColumn("ha", ha), "BX", "BY",
                                "BZ", "ha", dec=math.radians(-45.0))
    want = sorted(r.id for r in want_df.where(F.col("w") > 0)
                  .select("id").collect())
    assert got == want and 0 < len(got) < 60
