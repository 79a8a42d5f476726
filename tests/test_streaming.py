"""Streaming ingestion mode: waves driven by arriving page files."""

from __future__ import annotations

import hashlib

from newscrawl import streaming, synth, wave
from newscrawl.storage import ManifestParquetCatalog


def test_stream_crawl_processes_arrivals_as_waves(spark, tmp_path):
    cfg = synth.SynthConfig(n_seed=3, n_total=12, hot_links=False)
    pages = synth.build_pages_df(spark, cfg, num_partitions=4)
    pages_dir = str(tmp_path / "pages")
    # 4 parquet files -> maxFilesPerTrigger=2 gives 2 micro-batches
    pages.write.parquet(pages_dir)

    catalog = ManifestParquetCatalog(str(tmp_path / "cat"))
    wave.init_crawl(spark, catalog, synth.build_seeds_df(spark, cfg))
    n = streaming.stream_crawl(
        spark,
        catalog,
        pages_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=2,
    )
    assert n >= 2  # multiple waves from split arrivals

    arts = wave.read_articles(spark, catalog).collect()
    assert arts
    # every article's text is byte-identical to corpus ground truth
    for r in arts:
        page = synth.page_for_url(r.url, cfg)
        assert hashlib.sha256(r.text.encode()).digest() == hashlib.sha256(
            page.text.encode()
        ).digest()
    # seen set has no duplicate urls across waves
    seen = wave.read_seen(spark, catalog).collect()
    urls = [r.url for r in seen]
    assert len(urls) == len(set(urls))
