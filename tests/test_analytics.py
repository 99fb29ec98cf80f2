"""Invariant tests for the event-analytics and retrieval queries —
cross-engine value equality is the driver oracle's job; these pin the
semantic properties that stay true under any data regeneration."""

import os

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR",
                        "/root/testdata/sf0.001")


def test_funnel_stages_monotone(spark):
    import __spark_entry__ as entry

    rows = {r["stage"]: r for r in
            entry.q_events_funnel(spark, SF_DIR).collect()}
    assert set(rows) == {"1_view", "2_click", "3_purchase"}
    n1, n2, n3 = (rows[s]["n_users"] for s in
                  ("1_view", "2_click", "3_purchase"))
    # each stage requires the previous one strictly earlier
    assert n1 >= n2 >= n3
    assert rows["1_view"]["avg_hours"] is None
    for s in ("2_click", "3_purchase"):
        if rows[s]["n_users"] > 0:
            # strict ts > predecessor => non-negative mean latency
            # (>= 0, not > 0: the 6-decimal rounding of hours can
            # legitimately round a sub-2ms mean down to exactly 0.0)
            assert rows[s]["avg_hours"] >= 0


def test_retention_offset_zero_is_whole_cohort(spark):
    """Every user's first event lies in their own week 0, so summing
    offset-0 counts across cohorts recovers the full user count."""
    import __spark_entry__ as entry

    ret = entry.q_events_retention(spark, SF_DIR)
    n_users = (spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
               .select("user_id").distinct().count())
    zero = (ret.where("week_offset = 0")
               .agg(F.sum("n_users")).collect()[0][0])
    assert zero == n_users
    assert ret.where("week_offset < 0").count() == 0


def test_histogram_partitions_all_events(spark):
    import __spark_entry__ as entry

    hist = entry.q_value_histogram(spark, SF_DIR).collect()
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    assert sum(r["n"] for r in hist) == ev.count()
    for r in hist:
        assert 0 <= r["bin"] <= 24
        assert r["bin_lo"] == r["bin"] * 20.0


def test_bm25_ranked_and_bounded(spark):
    import __spark_entry__ as entry

    rows = entry.q_bm25_search(spark, SF_DIR).collect()
    assert 0 < len(rows) <= 20
    scores = [r["bm25"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        assert r["bm25"] > 0
        assert 1 <= r["n_terms_hit"] <= 3
    spark.catalog.clearCache()


def test_tpch_q20_suppliers_from_filtered_nation(spark):
    """Whatever qualifies must be a NATION_3 supplier (vacuously true
    when the small SF has none — the oracle run at sf0.01 covers the
    non-empty case)."""
    import __spark_entry__ as entry

    out = {r["s_suppkey"] for r in
           entry.q_tpch_q20(spark, SF_DIR).collect()}
    allowed = {r["s_suppkey"] for r in
               spark.read.parquet(os.path.join(SF_DIR, "supplier.parquet"))
               .join(spark.read.parquet(os.path.join(SF_DIR,
                                                     "nation.parquet"))
                     .where("n_name = 'NATION_3'"),
                     F.col("s_nationkey") == F.col("n_nationkey"))
               .collect()}
    assert out <= allowed


def test_negative_sampling_invariants(spark):
    """k negatives per anchor, all within [0, N), never the anchor
    itself, and deterministic across invocations."""
    from dask_ms_spark.llm.sampling import negative_sampling

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n = docs.count()
    a = negative_sampling(docs, "doc_id", k=3).collect()
    assert len(a) == 3 * n
    for r in a:
        assert 0 <= r.neg_id < n
        assert r.neg_id != r.doc_id
    b = negative_sampling(docs, "doc_id", k=3).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
