"""Bucketed tables: shuffle-free co-located joins and aggregations.

No reference analogue — dask-ms reads whole tables and leaves joins to
user code (SURVEY §2.5).  At 100 TB the dominant cost of a fact-fact
join (e.g. lineitem ⋈ orders, or visibility rows ⋈ per-row flags) is
the shuffle of both sides; bucketing both tables on the join key at
write time pins co-partitioning on disk, so every later join or
aggregation on that key runs map-side, no exchange.

This is the disk-persistent complement to ``repartition``-based
co-location: pay one shuffle at ingest, amortise it over every
downstream query.  Spark's bucketing rides the session catalog
(``saveAsTable``), so stores live in ``spark.sql.warehouse.dir``.
"""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import DataFrame, SparkSession

__all__ = ["write_bucketed", "read_bucketed", "bucketed_join"]


def write_bucketed(df: DataFrame, table: str, bucket_cols: Iterable[str],
                   num_buckets: int = 32, sort: bool = True,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` bucketed (and bucket-sorted) on ``bucket_cols``.

    ``num_buckets`` should track downstream parallelism: each bucket is
    one map-side task in later joins.  Sorting within buckets lets
    sort-merge joins skip their sort as well.
    """
    bucket_cols = list(bucket_cols)
    writer = (df.write.mode(mode)
                .bucketBy(num_buckets, *bucket_cols))
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: Iterable[str] | str, how: str = "inner") -> DataFrame:
    """Join two co-bucketed tables; with matching bucket specs Catalyst
    plans a zero-exchange sort-merge join (verify with
    ``.explain()`` — no Exchange below the join)."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table),
                                        on=keys, how=how)
