"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship composite pipeline on sf0.001;
``queries``/``oracle_sql`` expose the operator inventory of SURVEY.md §2
plus the training-data-pipeline operators (dedup / similarity / text
analysis), each with a DuckDB-equivalent oracle. The full crawl engine
itself (frontier, seen-set, politeness, waves) is exercised by
``crawl_wave_articles`` (rows-only check: the oracle is the committed
pure-Python reference oracle under tests/, not SQL-expressible).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from newscrawl.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: crawl-analog pipeline over sf0.001 documents — dedup
    (first-wins), boilerplate + min-content gates, quality scoring, and
    a per-source distribution (the reference classifier's wave summary,
    classifier.py:295-307)."""
    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    low = F.lower(F.col("text"))
    kept = (
        docs.filter(F.length("text") >= 100)
        .filter(~(low.contains("subscribe") | low.contains("cookie")))
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy(F.md5(F.encode(F.col("text"), "utf-8"))).orderBy("doc_id")
            ),
        )
        .filter(F.col("rn") == 1)
    )
    agg = kept.groupBy("source", "lang").agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.length("text")), 2).alias("avg_chars"),
    )
    # total as a Window over the post-agg rows (bounded at group
    # cardinality): ONE corpus scan — a crossJoin against a
    # re-aggregated total would re-scan (branches don't share subplans)
    return agg.select(
        "source",
        "lang",
        "n",
        "avg_chars",
        F.round(
            F.lit(100.0) * F.col("n") / F.sum("n").over(W.partitionBy()), 2
        ).alias("pct"),
    ).orderBy("source", "lang")


def _crawl_wave_articles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real engine end-to-end at small scale: synthesize the page
    corpus, run 2 crawl waves (frontier -> anti-join -> priority ->
    fetch join -> extract UDF -> commit), return the articles table.
    Deterministic; correctness vs the reference oracle is asserted by
    tests/test_wave.py."""
    from newscrawl import synth, wave
    from newscrawl.storage import ManifestParquetCatalog

    cfg = synth.SynthConfig(n_seed=2, n_total=12, n_waves=2)
    catalog = ManifestParquetCatalog(tempfile.mkdtemp(prefix="newscrawl_entry_"))
    wave.run_crawl(spark, catalog, cfg)
    arts = wave.read_articles(spark, catalog)
    # The driver's rows-check canonicalizer sorts every column via pandas
    # lexsort, which cannot factorize list cells — serialize the entity
    # ARRAY<STRING> columns to a stable scalar for the comparator. The
    # engine-side schema (ARTICLES, schema.py) keeps the real arrays; the
    # golden diff in tests/test_wave.py checks those.
    for c in ("locations", "organizations", "persons"):
        arts = arts.withColumn(c, F.array_join(F.col(c), "|"))
    return arts.orderBy("wave_id", "url")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # crawl_wave_articles FIRST: the driver checks only the first 50 entries
    # in insertion order, and this composite engine row (rows-only check) must
    # never fall outside that window again (absent from CORRECTNESS_r01-r03).
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "crawl_wave_articles": _crawl_wave_articles
    }
    for name, (fn, _sql) in QUERIES.items():
        out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    # crawl_wave_articles intentionally omitted: its oracle is the
    # pure-Python reference-control-flow oracle (newscrawl/
    # reference_oracle.py), diffed in tests/test_wave.py.
    return {name: sql for name, (_fn, sql) in QUERIES.items()}
