"""Engine-level cold-start robustness: a crawl over an EMPTY pages
table (every fetch misses — a dead source, a not-yet-populated pages
partition) must commit its waves with zero articles instead of
crashing, on both the plain and the fully-gated path.

This is the engine sibling of the registry-wide empty-corpus sweep
(test_empty_corpus.py): the wave loop pulls several driver-side
metrics per wave (observed candidate counts, distribution collects,
seen-set deltas), and each is a potential None/empty trap when no
page joins the frontier.
"""

from __future__ import annotations

import pytest

from newscrawl import synth, wave
from newscrawl.storage import ManifestParquetCatalog


@pytest.fixture()
def empty_pages(spark):
    cfg = synth.SynthConfig(n_waves=2)
    return cfg, synth.build_pages_df(spark, cfg).limit(0)


def _assert_empty_crawl(out):
    assert len(out) == 2
    for m in out:
        assert m["n_yielded"] == 0
        assert m["n_articles"] == 0
        # the frontier still advances: seeds become candidates even
        # though none of them fetch
        assert m["n_candidates"] > 0


def test_crawl_over_empty_pages_commits_zero_article_waves(
    spark, empty_pages, tmp_path
):
    cfg, pages = empty_pages
    cat = ManifestParquetCatalog(str(tmp_path / "cat"))
    out = wave.run_crawl(spark, cat, cfg, n_waves=2, pages=pages)
    _assert_empty_crawl(out)


def test_gated_crawl_over_empty_pages_commits_and_stays_quiet(
    spark, empty_pages, tmp_path
):
    """The fully-loaded path (dedup gate + quality gate + webhook +
    media sink) over zero fetched pages: every gate sees an empty
    frame and every sink commits an empty table."""
    cfg, pages = empty_pages
    cat = ManifestParquetCatalog(str(tmp_path / "cat"))
    out = wave.run_crawl(
        spark,
        cat,
        cfg,
        n_waves=2,
        pages=pages,
        dedup_gate="flag",
        min_quality=0.5,
        webhook_key=b"k",
        media_sink=True,
    )
    _assert_empty_crawl(out)
