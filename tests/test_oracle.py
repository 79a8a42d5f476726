"""Reference-oracle sanity: determinism + control-flow invariants."""

from newscrawl import reference_oracle as ro
from newscrawl import synth


def test_oracle_deterministic():
    cfg = synth.SynthConfig()
    a = ro.run_oracle(cfg)
    b = ro.run_oracle(cfg)
    assert [w.crawl_order for w in a.waves] == [w.crawl_order for w in b.waves]
    assert a.seen == b.seen
    assert a.text_sha == b.text_sha


def test_oracle_invariants():
    cfg = synth.SynthConfig()
    res = ro.run_oracle(cfg, n_waves=3)
    all_yielded = [u for w in res.waves for u in w.crawl_order]
    # a url is yielded at most once across waves (seen-set semantics)
    assert len(all_yielded) == len(set(all_yielded))
    assert set(all_yielded) == set(res.seen)
    # every yielded url meets the min-text threshold
    for u in all_yielded:
        page = synth.page_for_url(u, cfg)
        assert page is not None and len(page.text) >= cfg.min_text_chars
    # wave 0 discovers outlinks -> wave 1 must crawl some new urls
    assert res.waves[0].crawl_order and res.waves[1].crawl_order
    # skip-titled pages are seen but produce no article
    for w in res.waves:
        assert len(w.articles) == len(w.crawl_order) - w.n_skipped
        assert w.n_skipped >= 0
    # carried urls (fetch failures / short pages) never enter seen
    for row in res.final_frontier:
        if synth.page_for_url(row["url"], cfg) is None:
            assert row["url"] not in res.seen


def test_oracle_wave0_order_by_source_then_section():
    cfg = synth.SynthConfig()
    res = ro.run_oracle(cfg, n_waves=1)
    order = res.waves[0].crawl_order
    ranks = []
    for u in order:
        src, _sec, _i = synth.parse_url(u)
        ranks.append([s for s, _h, _ in synth.SOURCES].index(src))
    assert ranks == sorted(ranks)  # scraper-rank-major order


def test_oracle_dw_lexicographic():
    cfg = synth.SynthConfig(n_seed=6, n_total=24)
    res = ro.run_oracle(cfg, n_waves=1)
    dw = [u for u in res.waves[0].crawl_order if "//dw.example.com/" in u]
    assert len(dw) >= 3
    assert dw == sorted(dw)  # crawler_dw.py:194 sorted(set(links))
