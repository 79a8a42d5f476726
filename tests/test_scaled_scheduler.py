"""Scaled-scheduler crawl mode (north rule: priority = host budget,
recency, news score): host_state persists, recency updates per wave as a
logical wave clock, and idle-longest / never-fetched hosts crawl first."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from newscrawl import synth, wave
from newscrawl.politeness import with_host
from newscrawl.schema import HOST_STATE
from newscrawl.storage import ManifestParquetCatalog

CFG = synth.SynthConfig()


@pytest.fixture(scope="module")
def scaled_crawl(spark, tmp_path_factory):
    catalog = ManifestParquetCatalog(str(tmp_path_factory.mktemp("scaled")))
    metrics = wave.run_crawl(spark, catalog, CFG, scheduler="scaled")
    return catalog, metrics


def test_host_state_persists_and_updates(spark, scaled_crawl):
    catalog, metrics = scaled_crawl
    assert len(metrics) == CFG.n_waves
    hs = catalog.read(spark, "host_state", HOST_STATE).collect()
    assert hs, "host_state table never written"
    # every host that yielded appears, stamped with a logical wave clock
    seen_hosts = {
        r.host
        for r in with_host(
            wave.read_seen(spark, catalog).select("url")
        ).collect()
    }
    state_hosts = {r.host for r in hs}
    assert seen_hosts <= state_hosts
    # timestamps are the epoch-seconds wave clock: within [1, n_waves]
    for r in hs:
        assert r.last_fetch_ts is not None
        assert 1 <= r.last_fetch_ts.timestamp() <= CFG.n_waves


def test_never_fetched_hosts_crawl_first(spark, scaled_crawl):
    """The hot host is only discoverable from wave-1 outlinks, so at
    wave 1 it is never-fetched (idle key 0) while every seed host was
    fetched in wave 0 — with equal budget tiers the scaled order must
    put all hot-host urls before any already-fetched host's urls."""
    catalog, _metrics = scaled_crawl
    seen = wave.read_seen(spark, catalog)
    w1 = (
        with_host(seen.filter(F.col("processed_wave") == "w0001"))
        .orderBy("sort_key")
        .collect()
    )
    assert w1
    hot = [i for i, r in enumerate(w1) if r.host == synth.HOT_HOST]
    cold = [i for i, r in enumerate(w1) if r.host != synth.HOT_HOST]
    assert hot, "hot host never discovered in wave 1"
    assert max(hot) < min(cold), "never-fetched host did not sort first"


def test_scaled_mode_same_coverage_as_reference(spark, scaled_crawl, tmp_path):
    """Scheduling changes the ORDER, never the SET: with no budgets the
    scaled crawl must process exactly the reference-mode url set."""
    catalog, _metrics = scaled_crawl
    ref_cat = ManifestParquetCatalog(str(tmp_path / "ref"))
    wave.run_crawl(spark, ref_cat, CFG, scheduler="reference")
    scaled_urls = {r.url for r in wave.read_seen(spark, catalog).collect()}
    ref_urls = {r.url for r in wave.read_seen(spark, ref_cat).collect()}
    assert scaled_urls == ref_urls


def test_host_state_seed_budget_tiers(spark, tmp_path):
    """Caller-seeded budgets put low-budget-tier hosts first regardless
    of recency (budget is the leading key dimension)."""
    cfg = synth.SynthConfig(n_seed=2, n_total=8, n_waves=1, hot_links=False)
    hosts = sorted({r["url"].split("/")[2] for r in synth.seed_rows(cfg)})
    fast, slow = hosts[-1], hosts[0]  # invert the natural source order
    seed = spark.createDataFrame(
        [(fast, 1, None, None), (slow, 900, None, None)],
        schema=HOST_STATE,
    )
    catalog = ManifestParquetCatalog(str(tmp_path / "tiers"))
    wave.run_crawl(
        spark, catalog, cfg, scheduler="scaled", host_state_seed=seed
    )
    rows = (
        with_host(wave.read_seen(spark, catalog))
        .orderBy("sort_key")
        .collect()
    )
    fast_pos = [i for i, r in enumerate(rows) if r.host == fast]
    slow_pos = [i for i, r in enumerate(rows) if r.host == slow]
    other_pos = [
        i for i, r in enumerate(rows) if r.host not in (fast, slow)
    ]
    # ascending budget tiers: 001 first, 900 next, unseeded (999) last
    assert max(fast_pos) < min(slow_pos)
    assert max(slow_pos) < min(other_pos)


def test_all_options_integration(spark, tmp_path):
    """Everything on at once: scaled scheduler + per-host budget +
    robots + webhook sink + bloom — the kitchen-sink crawl must commit
    consistent state."""
    import hashlib
    import hmac as hmac_mod
    import json

    from newscrawl.schema import WEBHOOK_PAYLOADS
    from newscrawl.politeness import build_robots_table

    cfg = synth.SynthConfig(n_seed=3, n_total=12, n_waves=2)
    robots = build_robots_table(
        spark.createDataFrame(
            [("bbc.example.com", "User-agent: *\nDisallow: /news")],
            "host string, body string",
        )
    )
    catalog = ManifestParquetCatalog(str(tmp_path / "all"))
    metrics = wave.run_crawl(
        spark,
        catalog,
        cfg,
        scheduler="scaled",
        budget=2,
        robots=robots,
        webhook_key=b"k",
        media_sink=True,
    )
    assert len(metrics) == 2
    arts = wave.read_articles(spark, catalog).collect()
    assert arts
    # robots: the disallowed bbc /news prefix never yields
    assert not [a for a in arts if a.url.startswith("https://bbc.example.com/news")]
    # budget: at most 2 yields per host per wave
    for m in metrics:
        per_host_wave: dict = {}
        for r in wave.read_seen(spark, catalog).collect():
            if r.processed_wave == m["wave_id"]:
                h = r.url.split("/")[2]
                per_host_wave[h] = per_host_wave.get(h, 0) + 1
        assert all(n <= 2 for n in per_host_wave.values()), per_host_wave
    # webhook rows signed over committed payloads
    rows = catalog.read(spark, "webhook_payloads", WEBHOOK_PAYLOADS).collect()
    assert len(rows) == 2 * len(arts)
    for r in rows[:10]:
        want = hmac_mod.new(b"k", r.payload.encode(), hashlib.sha256).hexdigest()
        assert r.signature == want
    # metrics JSON blobs parse and sum consistently
    for m in metrics:
        dist = json.loads(m["topic_distribution"])
        assert sum(d["count"] for d in dist) == m["n_articles"]
    # media sink: every yielded url has a media_features row for its
    # wave, and every row's features + resize plan equal the pure-Python
    # spec recomputed from the synth page bytes (golden diff)
    import math

    from newscrawl.multimodal import _fallback_features

    media_rows = wave.read_media(spark, catalog).collect()
    assert media_rows
    html_by_url = {
        r.url: bytes(r.html) for r in synth.build_pages_df(spark, cfg).collect()
    }
    media_keys = {(r.url, r.wave_id) for r in media_rows}
    for s in wave.read_seen(spark, catalog).collect():
        assert (s.url, s.processed_wave) in media_keys
    for r in media_rows:
        n, sha, w, h, ch, ok, _sr, _ns = _fallback_features(html_by_url[r.url])
        assert (
            r.n_bytes, r.sha256_16, r.width, r.height, r.channels, r.decode_ok,
        ) == (n, sha, w, h, ch, ok)
        scale = 256 / max(w, h) if max(w, h) > 256 else 1.0
        assert (r.target_width, r.target_height, r.needs_resize) == (
            math.floor(w * scale), math.floor(h * scale), scale < 1.0,
        )
        assert r.media_type == "page"  # no media extensions in the corpus


def test_scaled_key_wide_budget_no_lexical_inversion(spark):
    """Budget 1000 must sort AFTER 999 (ascending tiers): a %03d-width
    key would put '1000...' before '999...' lexically."""
    from newscrawl.politeness import scaled_priority_key

    df = spark.createDataFrame(
        [
            ("https://a.example.com/x", "s", 0, "sec", 0, "0001"),
            ("https://b.example.com/x", "s", 0, "sec", 0, "0001"),
        ],
        "url string, source string, source_rank int, section string, "
        "section_rank int, ord string",
    )
    hs = spark.createDataFrame(
        [("a.example.com", 1000, None, None), ("b.example.com", 999, None, None)],
        schema=__import__("newscrawl.schema", fromlist=["HOST_STATE"]).HOST_STATE,
    )
    rows = scaled_priority_key(df, hs).orderBy("sort_key").collect()
    assert [r.url.split("/")[2] for r in rows] == [
        "b.example.com",
        "a.example.com",
    ]
    # out-of-range inputs clamp instead of widening/injecting signs
    hs2 = spark.createDataFrame(
        [("a.example.com", 10_000_000, 5.0, None), ("b.example.com", -3, -2.0, None)],
        schema=hs.schema,
    )
    keys = {r.url: r.sort_key for r in scaled_priority_key(df, hs2).collect()}
    assert keys["https://a.example.com/x"].startswith("999999|")
    assert keys["https://b.example.com/x"].startswith("000000|")
