"""SparkSession factory tuned for the dask-ms-spark engine.

The reference (ratt-ru/dask-ms) relies on dask's scheduler plus a
per-table single I/O thread (daskms/table_executor.py:39-65).  On Spark
none of that is needed; instead we centralise the session-level knobs
that matter at scale:

* AQE on (runtime coalescing, skew-join splitting) — replaces the
  reference's static chunk planning (daskms/reads.py:302-309).
* Arrow for all Python<->JVM transfer — the Pandas-UDF fast path.
* shuffle.partitions sized to the local core count for tests; on a real
  cluster this is left to AQE's coalescing with a high initial value.
* 128 MiB maxPartitionBytes — the scan-split analogue of the
  reference's 10k-row default chunking (daskms/reads.py:33).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark", "ensure_parallelism"]


def _cpus() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 4)
    except ValueError:
        return os.cpu_count() or 4


def get_spark(app_name: str = "dask-ms-spark", master: str | None = None,
              extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    Defaults are safe for local testing and scale-minded: every setting
    here is one you would also set on a 1000-executor cluster except
    ``master``, which defaults to ``local[N]``.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        # --- adaptive execution: runtime re-planning, skew handling ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing: local default; AQE coalesces down ---
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        # --- scans: 128 MiB splits, vectorized parquet reader ---
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        # --- Arrow everywhere Python touches data ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- broadcast: dim tables in this schema are tiny ---
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # --- timestamps: avoid ns/us ambiguity vs external oracles ---
        .config("spark.sql.session.timeZone", "UTC")
        # parquet TIMESTAMP(NANOS) (e.g. the events table) is illegal
        # for Spark's reader by default; read as epoch-nanos long and
        # normalise in the reader (streaming/events.py:normalize_ts)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def ensure_parallelism(df, min_partitions: int | None = None):
    """Round-robin repartition ``df`` iff its scan yields fewer
    partitions than the session's core count.

    Why: a small parquet file is a single row group = ONE input split,
    so CPU-heavy per-row work (md5 shingling, regex scoring) serialises
    on one core no matter how many the session has.  At production
    scale inputs span many splits and this is a no-op — the check reads
    the planned partition count (no job runs), so the extra exchange
    only ever appears when the scan genuinely under-parallelises.
    The reference has the same issue inverted: its chunks arg splits a
    monolithic CASA table into dask tasks (daskms/dask_ms.py:243-267).
    """
    spark = df.sparkSession
    if min_partitions is None:
        min_partitions = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < min_partitions:
        return df.repartition(min_partitions)
    return df


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
