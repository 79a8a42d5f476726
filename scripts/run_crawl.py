#!/usr/bin/env python
"""Cluster entry point: run (or resume) a crawl via spark-submit.

    zip -r engine.zip newscrawl/
    spark-submit --py-files engine.zip scripts/run_crawl.py \
        --catalog /data/crawl_state --pages /data/pages_parquet \
        --waves 10 --budget 1000

On a multi-executor cluster no code changes are needed: the wave plan
is declarative and all state lives in the catalog directory (shared
filesystem / object store). Without --pages, a deterministic synthetic
corpus is generated distributed (see newscrawl.synth).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True, help="state root (snapshots + tables)")
    ap.add_argument("--pages", default=None, help="parquet dir of pages (url, warc_ts, html, text, lang)")
    ap.add_argument("--waves", type=int, default=3)
    ap.add_argument("--budget", type=int, default=None, help="per-host per-wave fetch budget")
    ap.add_argument("--no-bloom", action="store_true")
    ap.add_argument(
        "--webhook-key",
        default=None,
        help="HMAC key; when set, each wave commits a signed webhook_payloads table",
    )
    ap.add_argument(
        "--scheduler",
        choices=("reference", "scaled"),
        default="reference",
        help="candidate ordering: reference parity, or the scaled "
        "(budget tier, host idle time, news score) priority queue with "
        "persisted host_state recency",
    )
    ap.add_argument(
        "--media-sink",
        action="store_true",
        help="commit a per-wave media_features table (typed features + "
        "resize plan over the fetched payloads; payloads never persisted)",
    )
    ap.add_argument(
        "--compact",
        action="store_true",
        help="after the run, bin-pack each state table's small data "
        "files (RewriteDataFiles analog) and expire all but the last "
        "2 snapshots — the standard table-maintenance loop",
    )
    ap.add_argument(
        "--dedup-gate",
        choices=("flag", "drop"),
        default=None,
        help="incremental near-dup gate: probe the persistent MinHash "
        "band index each wave; 'flag' records decisions in "
        "near_dup_flags, 'drop' also withholds flagged articles from "
        "the articles sink",
    )
    ap.add_argument(
        "--min-quality",
        type=float,
        default=None,
        help="quality sink gate: articles scoring below this threshold "
        "are recorded in quality_flags instead of the articles table "
        "(crawl semantics untouched)",
    )
    ap.add_argument(
        "--robots",
        default=None,
        help="parquet dir of a robots rules table (host, disallow "
        "array<string>[, allow array<string>]) — RFC 9309 gate applied "
        "to every wave's candidates (see politeness.build_robots_table "
        "for parsing robots.txt bodies into this shape)",
    )
    ap.add_argument("--synth-seed", type=int, default=8, help="synthetic seeds per section (when no --pages)")
    ap.add_argument("--synth-total", type=int, default=240, help="synthetic universe per section")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("newscrawl")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    from newscrawl import synth, wave
    from newscrawl.schema import PAGES
    from newscrawl.storage import ManifestParquetCatalog

    cfg = synth.SynthConfig(
        n_seed=args.synth_seed, n_total=args.synth_total, n_waves=args.waves
    )
    pages = (
        spark.read.schema(PAGES).parquet(args.pages)
        if args.pages
        else synth.build_pages_df(spark, cfg)
    )
    catalog = ManifestParquetCatalog(args.catalog)
    metrics = wave.run_crawl(
        spark,
        catalog,
        cfg,
        n_waves=args.waves,
        pages=pages,
        budget=args.budget,
        use_bloom=not args.no_bloom,
        webhook_key=args.webhook_key.encode("utf-8") if args.webhook_key else None,
        scheduler=args.scheduler,
        media_sink=args.media_sink,
        robots=spark.read.parquet(args.robots) if args.robots else None,
        dedup_gate=args.dedup_gate,
        min_quality=args.min_quality,
    )
    for m in metrics:
        print(json.dumps(m))
    if args.compact:
        from newscrawl import schema as sch

        for table, tschema in (
            ("articles", sch.ARTICLES),
            ("seen", sch.SEEN),
            ("frontier", sch.FRONTIER),
        ):
            res = catalog.compact(spark, table, tschema)
            print(json.dumps({"maintenance": "compact", "table": table, **res}))
        print(json.dumps({"maintenance": "expire", **catalog.expire_snapshots(keep_last=2)}))
    spark.stop()


if __name__ == "__main__":
    main()
