"""newscrawl — a from-scratch PySpark-native URL-frontier + fetch scheduler.

Re-expresses the semantics of the reference single-process news crawler
(christianfitaram/news-crawler-ai, read-only at /root/reference) as a
distributed Spark DataFrame pipeline over Iceberg-style page tables:

- deterministic text extraction + outlink discovery (reference
  ingest/utils.py:17-24 invariant) as vectorized Arrow/pandas UDFs
- exact URL-seen anti-join with a sharded bloom-filter prefilter and a
  cuckoo-filter spill tier (reference link_pool unique-index membership,
  lib/repositories/link_pool_repository.py:56-79)
- reference-identical crawl ordering (scraper rank -> section rank ->
  page position, DW lexicographic; ingest/get_all_articles.py:10-17,
  ingest/crawler_dw.py:194) via deterministic sort keys + Window ranking
- per-host politeness budgets + robots gating (additions mandated by the
  north rule; disabled => reference-equivalent mode)
- resumable atomic multi-table wave commits with per-partition lineage
  (ManifestParquetCatalog, Iceberg semantics on plain parquet)

No code is copied from the reference; it is a different architecture
(declarative DataFrame plans, not an imperative scrape loop).
"""

__version__ = "0.1.0"
