"""Deterministic synthetic Common-Crawl-style corpus.

Every page is a pure function of its URL (md5-keyed content), so the
corpus is identical whether generated lazily in the single-process
oracle or distributed via ``spark.range -> mapInPandas`` — no
generation-order or parallelism dependence. This is what lets the same
corpus back both golden fixtures and multi-GB bench runs.

The source/section taxonomy mirrors the reference's 10 scrapers in
their fixed rank order (/root/reference/ingest/get_all_articles.py:10-11)
with the reference's section dictionaries
(custom_scrapers.py:240-247,278-284,318-324,425-432,517-521) and the
Selenium sources' 10-per-section cap (custom_scrapers.py:355,457,543).
An extra unseeded ``hot`` host provides host-level skew for politeness /
salting tests (north rule).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from datetime import datetime, timedelta
from typing import Iterator, Optional

from . import extract as ex

# (source, host, sections) in reference scraper-rank order.
SOURCES: list[tuple[str, str, list[str]]] = [
    ("bbc", "bbc.example.com", ["news"]),
    ("cnn", "cnn.example.com", ["news"]),
    ("wsj", "wsj.example.com", ["rss"]),
    ("aljazeera", "aljazeera.example.com", ["rss"]),
    ("dw", "dw.example.com", ["top-stories"]),
    (
        "guardian-rss",
        "rss.theguardian.example.com",
        ["world", "uk", "business", "technology", "environment", "science"],
    ),
    (
        "reuters",
        "reuters.example.com",
        ["world", "business", "markets", "technology", "legal"],
    ),
    (
        "guardian",
        "www.theguardian.example.com",
        ["world", "politics", "sport", "culture", "lifeandstyle"],
    ),
    (
        "france24",
        "france24.example.com",
        ["france", "africa", "middle-east", "americas", "europe", "asia-pacific"],
    ),
    ("npr", "npr.example.com", ["world", "politics", "business"]),
]

DW_SOURCE = "dw"
SELENIUM_SOURCES = {"guardian", "france24", "npr"}  # 10-per-section cap
SELENIUM_CAP = 10

HOT_SOURCE = "hot"
HOT_HOST = "hot.example.com"
HOT_SECTION = "t"

_HOST_TO_SOURCE = {host: src for src, host, _ in SOURCES}
_HOST_TO_SOURCE[HOT_HOST] = HOT_SOURCE
_SOURCE_TO_HOST = {src: host for src, host, _ in SOURCES}
_SOURCE_TO_HOST[HOT_SOURCE] = HOT_HOST

WORDS = (
    "the a of and to in for on with as world markets policy vote summit "
    "storm river energy court union strike deal border climate election "
    "economy minister protest treaty harbor signal meadow lantern orchard "
    "granite velvet copper falcon timber prairie cinder willow beacon "
    "quarry ember saffron juniper marble drift canyon sable tundra reef "
    "monsoon glacier basalt heron ivory lagoon zephyr"
).split()

_BASE_TS = datetime(2026, 1, 1, 0, 0, 0)


@dataclass(frozen=True)
class SynthConfig:
    n_seed: int = 3  # seed urls per (source, section)
    n_total: int = 18  # url universe per (source, section)
    hot_links: bool = True  # cross-host links to the skewed hot host
    hot_universe: int = 30
    link_cutoff: Optional[int] = None  # idx below this emits outlinks (default n_total//2)
    min_text_chars: int = ex.MIN_TEXT_CHARS
    n_waves: int = 3
    base_paras: int = 2  # paragraphs per page = base_paras + hash%4 (bench uses
    # larger values so pages approach realistic web-page weight)

    @property
    def cutoff(self) -> int:
        return self.link_cutoff if self.link_cutoff is not None else max(self.n_total // 2, self.n_seed + 1)


@dataclass
class Page:
    url: str
    warc_ts: datetime
    html: bytes
    text: str
    lang: str


def _ints(key: str, n: int) -> list[int]:
    """Deterministic uint32 stream keyed by ``key`` (md5-based)."""
    out: list[int] = []
    c = 0
    while len(out) < n:
        d = hashlib.md5(f"{key}#{c}".encode()).digest()
        out.extend(int.from_bytes(d[i : i + 4], "big") for i in range(0, 16, 4))
        c += 1
    return out[:n]


def _slug(source: str, section: str, idx: int) -> str:
    hs = _ints(f"slug|{source}|{section}|{idx}", 3)
    return "-".join(WORDS[h % len(WORDS)] for h in hs)


def url_for(source: str, section: str, idx: int) -> str:
    return f"https://{_SOURCE_TO_HOST[source]}/{section}/{_slug(source, section, idx)}-{idx}"


def parse_url(url: str) -> Optional[tuple[str, str, int]]:
    """url -> (source, section, idx), or None for foreign urls."""
    if not url.startswith("https://"):
        return None
    rest = url[len("https://") :]
    parts = rest.split("/")
    if len(parts) != 3:
        return None
    host, section, slug = parts
    source = _HOST_TO_SOURCE.get(host)
    if source is None:
        return None
    tail = slug.rsplit("-", 1)
    if len(tail) != 2 or not tail[1].isdigit():
        return None
    return source, section, int(tail[1])


def _words(key: str, n: int) -> str:
    return " ".join(WORDS[h % len(WORDS)] for h in _ints(key, n))


def page_for_url(url: str, cfg: SynthConfig) -> Optional[Page]:
    """The page behind ``url``, or None (fetch failure / outside corpus).

    Pure function of (url, cfg): content, outlinks, language, timestamp
    all derive from md5 of the url coordinates.
    """
    parsed = parse_url(url)
    if parsed is None:
        return None
    source, section, idx = parsed
    is_hot = source == HOT_SOURCE
    n_total = cfg.hot_universe if is_hot else cfg.n_total
    if idx >= n_total:
        return None
    if idx % 13 == 5:  # deterministic fetch failures (retried every wave)
        return None

    h = _ints(f"page|{source}|{section}|{idx}", 8)
    slug = _slug(source, section, idx)
    title = " ".join(w.capitalize() for w in slug.split("-"))
    if idx % 10 == 7:
        # boilerplate title -> yielded, marked processed, but skipped
        # (reference classifier.py:64-71,214-224)
        title = f"Sign up for our newsletter — {title}"

    short = idx % 11 == 3
    if short:
        paras = [_words(f"short|{url}", 4)]
    else:
        paras = [
            _words(f"para|{url}|{k}", 8 + (h[1] + k) % 7)
            for k in range((h[0] % 4) + cfg.base_paras)
        ]
        if h[2] % 7 == 0:
            paras.append("Follow us on social media for more updates")
        if h[2] % 9 == 0:
            paras.append(f"read more at https://{_SOURCE_TO_HOST[source]}/{section}/more")

    outlinks: list[str] = []
    if not is_hot and idx < cfg.cutoff and cfg.n_total > cfg.n_seed:
        span = cfg.n_total - cfg.n_seed
        for j in range(h[3] % 4):
            tgt = cfg.n_seed + (idx * 7 + j * 13 + h[4]) % span
            outlinks.append(url_for(source, section, tgt))
        if cfg.hot_links and h[5] % 5 == 0:
            outlinks.append(url_for(HOT_SOURCE, HOT_SECTION, h[6] % cfg.hot_universe))

    related = "".join(
        f'<a href="{o}">Related {k}</a>' for k, o in enumerate(outlinks)
    )
    body_paras = "\n".join(f"<p>{p}</p>" for p in paras)
    html = (
        "<!doctype html>\n"
        f"<html><head><title>{title} | {source}</title></head>\n"
        "<body>\n"
        f'<nav class="site-nav"><a href="/{section}">{section}</a>'
        '<a href="/about">About</a></nav>\n'
        '<div class="cookie-banner">We use cookies on our site. '
        "Accept all cookies to continue reading.</div>\n"
        "<article>\n"
        f"<h1>{title}</h1>\n"
        f"{body_paras}\n"
        f'<div class="related">{related}</div>\n'
        "</article>\n"
        "<footer>Follow us on social media. Share this article. "
        "Subscribe to our newsletter.</footer>\n"
        "</body></html>\n"
    ).encode("utf-8")

    text = ex.extract_text(html)  # ground truth == extractor output, by construction
    lang = "de" if h[7] % 17 == 0 else "en"
    warc_ts = _BASE_TS + timedelta(seconds=h[0] % (30 * 86400))
    return Page(url=url, warc_ts=warc_ts, html=html, text=text, lang=lang)


# ---------------------------------------------------------------------------
# Seed frontier (wave 0)
# ---------------------------------------------------------------------------


def seed_rows(cfg: SynthConfig) -> list[dict]:
    """Wave-0 frontier rows in reference discovery order: scraper rank,
    section rank (ordered dicts), page position; Selenium sources capped
    at 10/section. ``ord`` is the lexicographic position key — DW seeds
    use the url itself (crawler_dw.py:194 sorted(set(links)))."""
    rows: list[dict] = []
    for source_rank, (source, _host, sections) in enumerate(SOURCES):
        n = min(cfg.n_seed, SELENIUM_CAP) if source in SELENIUM_SOURCES else cfg.n_seed
        for section_rank, section in enumerate(sections):
            for pos in range(n):
                url = url_for(source, section, pos)
                rows.append(
                    {
                        "url": url,
                        "source": source,
                        "source_rank": source_rank,
                        "section": section,
                        "section_rank": section_rank,
                        "ord": url if source == DW_SOURCE else str(pos).zfill(12),
                    }
                )
    return rows


# ---------------------------------------------------------------------------
# Distributed corpus generation (scale path)
# ---------------------------------------------------------------------------


def _address_blocks(cfg: SynthConfig) -> list[tuple[str, str, int, int]]:
    """(source, section, start_global_idx, n) blocks covering the universe."""
    blocks: list[tuple[str, str, int, int]] = []
    off = 0
    for source, _host, sections in SOURCES:
        for section in sections:
            blocks.append((source, section, off, cfg.n_total))
            off += cfg.n_total
    blocks.append((HOT_SOURCE, HOT_SECTION, off, cfg.hot_universe))
    return blocks


def universe_size(cfg: SynthConfig) -> int:
    b = _address_blocks(cfg)
    s, _sec, off, n = b[-1][0], b[-1][1], b[-1][2], b[-1][3]
    return off + n


def iter_urls(cfg: SynthConfig, lo: int, hi: int) -> Iterator[str]:
    """Urls for global indices [lo, hi) — O(blocks) + O(hi-lo)."""
    for source, section, off, n in _address_blocks(cfg):
        if off + n <= lo or off >= hi:
            continue
        for i in range(max(lo, off), min(hi, off + n)):
            yield url_for(source, section, i - off)


def build_pages_df(spark, cfg: SynthConfig, num_partitions: int | None = None):
    """Distributed pages table: spark.range over the closed url universe,
    mapInPandas generating each page purely from its url. Scales to any
    corpus size without driver materialization."""
    import pandas as pd

    from .schema import PAGES

    n = universe_size(cfg)
    parts = num_partitions or spark.sparkContext.defaultParallelism
    blocks = _address_blocks(cfg)

    def gen(batch_iter):
        for pdf in batch_iter:
            recs = []
            for gid in pdf["id"]:
                gid = int(gid)
                # locate block
                for source, section, off, bn in blocks:
                    if off <= gid < off + bn:
                        page = page_for_url(url_for(source, section, gid - off), cfg)
                        if page is not None:
                            recs.append(
                                (page.url, page.warc_ts, page.html, page.text, page.lang)
                            )
                        break
            yield pd.DataFrame.from_records(
                recs, columns=["url", "warc_ts", "html", "text", "lang"]
            ) if recs else pd.DataFrame(
                {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            )

    return (
        spark.range(0, n, 1, parts)
        .mapInPandas(gen, schema=PAGES)
    )


def _seed_blocks(cfg: SynthConfig) -> list[tuple[str, int, str, int, int, int]]:
    """(source, source_rank, section, section_rank, start_gid, n) blocks."""
    blocks = []
    off = 0
    for source_rank, (source, _host, sections) in enumerate(SOURCES):
        n = min(cfg.n_seed, SELENIUM_CAP) if source in SELENIUM_SOURCES else cfg.n_seed
        for section_rank, section in enumerate(sections):
            blocks.append((source, source_rank, section, section_rank, off, n))
            off += n
    return blocks


def build_seeds_df(spark, cfg: SynthConfig, distributed_threshold: int = 50_000):
    """Seed frontier as a DataFrame. Small seed lists go through
    createDataFrame; large ones are generated DISTRIBUTED via
    spark.range -> mapInPandas (a 10^10-url frontier can never be built
    as a driver-side python list). Row content is identical either way
    (tested)."""
    from .schema import FRONTIER

    blocks = _seed_blocks(cfg)
    total = blocks[-1][4] + blocks[-1][5] if blocks else 0
    if total <= distributed_threshold:
        return spark.createDataFrame(
            [
                (r["url"], r["source"], r["source_rank"], r["section"], r["section_rank"], r["ord"])
                for r in seed_rows(cfg)
            ],
            schema=FRONTIER,
        )

    import pandas as pd

    parts = spark.sparkContext.defaultParallelism

    def gen(batch_iter):
        for pdf in batch_iter:
            recs = []
            for gid in pdf["id"]:
                gid = int(gid)
                for source, source_rank, section, section_rank, off, n in blocks:
                    if off <= gid < off + n:
                        pos = gid - off
                        url = url_for(source, section, pos)
                        recs.append(
                            (
                                url,
                                source,
                                source_rank,
                                section,
                                section_rank,
                                url if source == DW_SOURCE else str(pos).zfill(12),
                            )
                        )
                        break
            yield pd.DataFrame.from_records(
                recs,
                columns=["url", "source", "source_rank", "section", "section_rank", "ord"],
            ) if recs else pd.DataFrame(
                {c: [] for c in ["url", "source", "source_rank", "section", "section_rank", "ord"]}
            )

    return spark.range(0, total, 1, parts).mapInPandas(gen, schema=FRONTIER)
