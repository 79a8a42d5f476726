"""Bucketed co-located fetch join — the 10^10-frontier physical path.

When the wave's candidate set is too large to broadcast (the default
wave plan broadcasts candidate metadata into the pages scan), the
scale-out strategy is to bucket BOTH tables by the join key at write
time: `bucketBy(n, 'url')` + `sortBy('url')`. A sort-merge join between
two tables bucketed identically on the join key needs NO Exchange on
either side — every bucket pair joins locally where it was scanned, so
the page corpus (html bytes) never moves even with a billion-row
frontier. Verified by tests/test_plans.py::test_bucketed_fetch_join_has_no_exchange.

Bucket count is the knob that fixes per-task memory at any total size:
10^10 urls / 2^14 buckets ~ 600k urls per bucket regardless of cluster
shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame, table: str, n_buckets: int, key: str = "url"
) -> None:
    """Materialize a table bucketed+sorted by the join key (one-time
    cost, amortized over every later wave's fetch join)."""
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_fetch(
    spark: SparkSession, frontier_table: str, pages_table: str
) -> DataFrame:
    """Co-located inner join of two identically-bucketed tables on url.

    With matching bucket specs Spark plans a sort-merge join with zero
    Exchange operators — the html column streams from the local scan
    straight into the join.
    """
    frontier = spark.table(frontier_table)
    pages = spark.table(pages_table)
    return pages.join(frontier, "url", "inner")
