"""Crawl-order priority: deterministic sort keys + first-wins dedup.

Reproduces the reference's total processing order (SURVEY.md §2.12):
scraper rank -> section rank -> page position, with DW's lexicographic
url order (crawler_dw.py:194), and the first-wins cross-source in-wave
dedup (get_all_articles.py:14-17) — as a Window ranking, NOT
dropDuplicates (which is order-nondeterministic under shuffles).

Ordering is materialized as a sortable string key, never as partition
iteration order, so results are invariant under
spark.sql.shuffle.partitions (tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .synth import DW_SOURCE

SORT_KEY = "sort_key"


def with_sort_key(frontier: DataFrame) -> DataFrame:
    """sort_key = '%02d|%02d|%s' % (source_rank, section_rank, ord).

    Hierarchical ``ord`` strings compare lexicographically (ASCII), which
    matches the oracle's Python tuple/string comparison exactly.
    """
    return frontier.withColumn(
        SORT_KEY,
        F.format_string("%02d|%02d|%s", "source_rank", "section_rank", "ord"),
    )


def seed_ord(frontier: DataFrame) -> DataFrame:
    """Apply the DW lexicographic rule to a raw seed frontier whose
    ``ord`` is a zero-padded page position: DW discovery sorts its link
    set by url (crawler_dw.py:194), so DW seeds order by the url itself."""
    return frontier.withColumn(
        "ord", F.when(F.col("source") == DW_SOURCE, F.col("url")).otherwise(F.col("ord"))
    )


def first_wins_dedup(frontier: DataFrame) -> DataFrame:
    """Keep, per url, the row with the smallest sort_key (the earliest
    scraper/section/page position — reference seen_urls set semantics,
    get_all_articles.py:14-17)."""
    df = frontier if SORT_KEY in frontier.columns else with_sort_key(frontier)
    w = W.partitionBy("url").orderBy(SORT_KEY)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def child_frontier(extracted: DataFrame) -> DataFrame:
    """Explode discovered outlinks into next-wave frontier rows.

    Children inherit the parent's source/section ranks; their ``ord`` is
    parent_ord + '.' + zero-padded link index (hierarchical — sorts
    deterministically among carried-over rows of any depth). Mirrors
    reference one-hop discovery generalized to multi-wave.
    """
    return (
        extracted.select(
            F.col("source"),
            F.col("source_rank"),
            F.concat(F.col("section"), F.lit("/out")).alias("section"),
            F.col("section_rank"),
            F.col("ord").alias("_parent_ord"),
            F.posexplode_outer("outlinks").alias("_pos", "child_url"),
        )
        .filter(F.col("child_url").isNotNull())
        .select(
            F.col("child_url").alias("url"),
            "source",
            "source_rank",
            "section",
            "section_rank",
            # format_string('%04d') WIDENS past 4 digits like the oracle's
            # zfill(4); lpad would TRUNCATE '12345' to '1234', colliding
            # child ords on any page with >=10000 outlinks
            F.concat(
                F.col("_parent_ord"), F.lit("."), F.format_string("%04d", "_pos")
            ).alias("ord"),
        )
    )


def global_rank(df: DataFrame) -> DataFrame:
    """Materialize the global crawl rank.

    A single-partition Window over the whole wave is fine for fixture
    diffs; at 10^10 scale use the two-phase variant: range-partition by
    sort_key, rank within partitions, then add per-partition offsets
    (computed from partition counts) — same result, no single-reducer
    bottleneck. Implemented here as the exact two-phase form.
    """
    part = F.spark_partition_id()
    w_local = W.partitionBy(part).orderBy(SORT_KEY)
    ranked = (
        df.repartitionByRange(max(df.sparkSession.sparkContext.defaultParallelism, 1), SORT_KEY)
        .withColumn("_pid", part)
        .withColumn("_local_rn", F.row_number().over(w_local))
    )
    counts = ranked.groupBy("_pid").agg(F.count("*").alias("_n"))
    w_off = W.orderBy("_pid").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.withColumn("_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0))).drop("_n")
    return (
        ranked.join(F.broadcast(offsets), "_pid")
        .withColumn("rank", (F.col("_off") + F.col("_local_rn")).cast("long"))
        .drop("_pid", "_local_rn", "_off")
    )
