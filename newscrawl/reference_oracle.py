"""Single-process reference oracle.

Mirrors the reference crawler's control flow exactly — one sequential
loop, one global seen-set — and produces the golden fixtures the Spark
engine is diffed against (crawl order, seen-set membership,
extracted-text bytes; BASELINE.json north_star assertions).

Control-flow parity with /root/reference:
- fixed scraper order, then section order, then page position
  (ingest/get_all_articles.py:10-11; section dicts in custom_scrapers.py)
- DW links processed in lexicographic url order (crawler_dw.py:194) —
  encoded in the ``ord`` key by seed_rows / child_ord
- first-wins in-wave dedup across sources (get_all_articles.py:14-17)
- seen-check BEFORE fetch (utils.py:7-13 at custom_scrapers.py:96 etc.)
- fetch failure / short text -> NOT inserted into the seen set, url is
  re-attempted next wave (scrapers only insert_link at yield time,
  custom_scrapers.py:96-108; len<100 guard at :376-378)
- yielded urls are always marked processed, even when the boilerplate
  title filter skips them (classifier.py:214-224,289-293)

The oracle shares ``extract``'s pure functions with the Spark UDFs, so
text bytes agree by construction; tests then verify it via sha256.
"""

from __future__ import annotations

import hashlib
from collections import Counter
from dataclasses import dataclass, field

from . import extract as ex
from . import synth


def sort_key(row: dict) -> tuple:
    return (row["source_rank"], row["section_rank"], row["ord"])


def child_ord(parent_ord: str, link_idx: int) -> str:
    return f"{parent_ord}.{str(link_idx).zfill(4)}"


def child_row(parent: dict, link_idx: int, url: str) -> dict:
    return {
        "url": url,
        "source": parent["source"],
        "source_rank": parent["source_rank"],
        "section": parent["section"] + "/out",
        "section_rank": parent["section_rank"],
        "ord": child_ord(parent["ord"], link_idx),
    }


@dataclass
class WaveResult:
    wave_id: str
    crawl_order: list[str] = field(default_factory=list)  # yielded urls, in order
    articles: list[dict] = field(default_factory=list)
    n_skipped: int = 0
    n_carry: int = 0
    n_new_outlinks: int = 0
    n_candidates: int = 0
    # classifier.py:295-318 — Counter.most_common (count desc, insertion
    # = first-seen tie-break), percentage of total classified
    topic_distribution: list[dict] = field(default_factory=list)
    sentiment_distribution: list[dict] = field(default_factory=list)


@dataclass
class OracleResult:
    waves: list[WaveResult] = field(default_factory=list)
    seen: dict = field(default_factory=dict)  # url -> (discovered_wave, processed_wave)
    text_sha: dict = field(default_factory=dict)  # url -> sha256 hex of utf-8 text
    final_frontier: list[dict] = field(default_factory=list)


def wave_id_for(i: int) -> str:
    return f"w{i:04d}"


def _dist(counter: Counter, total: int) -> list[dict]:
    """classifier.py:295-307 verbatim shape: most_common (count desc,
    insertion-order ties) with percentage of total classified."""
    return [
        {
            "label": label,
            "count": count,
            "percentage": round(100.0 * count / total, 2) if total else 0.0,
        }
        for label, count in counter.most_common()
    ]


def run_oracle(cfg: synth.SynthConfig, n_waves: int | None = None) -> OracleResult:
    n_waves = n_waves if n_waves is not None else cfg.n_waves
    res = OracleResult()
    frontier: list[dict] = synth.seed_rows(cfg)

    for w in range(n_waves):
        wid = wave_id_for(w)
        wave = WaveResult(wave_id=wid)

        # first-wins dedup in priority order (F2)
        cands: list[dict] = []
        in_wave: set[str] = set()
        for row in sorted(frontier, key=sort_key):
            if row["url"] not in in_wave:
                in_wave.add(row["url"])
                cands.append(row)
        wave.n_candidates = len(cands)

        carry: list[dict] = []
        children: list[dict] = []
        topic_counter: Counter = Counter()
        sentiment_counter: Counter = Counter()
        for row in cands:
            url = row["url"]
            if url in res.seen:  # anti-join vs persistent seen set (F1)
                continue
            page = synth.page_for_url(url, cfg)
            if page is None or len(page.text) < cfg.min_text_chars:
                carry.append(row)  # fetch failure / too short: retry next wave
                continue
            # yielded: enters seen set and the crawl order
            res.seen[url] = (wid, wid)
            res.text_sha[url] = hashlib.sha256(page.text.encode("utf-8")).hexdigest()
            wave.crawl_order.append(url)
            for j, link in enumerate(ex.discover_outlinks(page.html)):
                children.append(child_row(row, j, link))
            title = ex.extract_title(page.html)
            if ex.is_skip_title(title):
                wave.n_skipped += 1
                continue
            n_tokens, stop_ratio, lang_pred, quality = ex.analyze_text(page.text)
            # classify stage (classifier.py:232-277): summary with the
            # >200-char gate, topic, sentiment, entity buckets, the
            # per-run sample id (the wave id here), isCleaned=False —
            # the SAME fused kernel function the Spark extract UDF runs
            (
                summary,
                topic,
                sent_label,
                sent_score,
                locs,
                orgs,
                pers,
            ) = ex.enrich_article(page.text)
            topic_counter[topic] += 1
            sentiment_counter[sent_label] += 1
            wave.articles.append(
                {
                    "url": url,
                    "title": title,
                    "text": page.text,
                    "clean_text": ex.clean_text(page.text),
                    "source": row["source"],
                    "wave_id": wid,
                    "warc_ts": page.warc_ts,
                    "n_chars": len(page.text),
                    "n_tokens": n_tokens,
                    "stop_ratio": stop_ratio,
                    "lang_pred": lang_pred,
                    "quality": quality,
                    "fingerprint": ex.rolling_fingerprint(page.text),
                    "summary": summary,
                    "topic": topic,
                    "sentiment_label": sent_label,
                    "sentiment_score": sent_score,
                    "locations": locs,
                    "organizations": orgs,
                    "persons": pers,
                    "sample": wid,
                    "is_cleaned": False,
                }
            )

        total_classified = len(wave.articles)
        wave.topic_distribution = _dist(topic_counter, total_classified)
        wave.sentiment_distribution = _dist(sentiment_counter, total_classified)
        wave.n_carry = len(carry)
        wave.n_new_outlinks = len(children)
        frontier = carry + children
        res.waves.append(wave)

    res.final_frontier = frontier
    return res


# --- golden driver-oracle fixture for the end-to-end engine row ---------

# the comparator-friendly serialization __spark_entry__._crawl_wave_articles
# applies to the engine output: entity arrays |-joined, warc_ts rendered
# as a wall-clock string (TZ-proof: synth timestamps are naive and
# round-trip through one session)
GOLDEN_ARTICLE_COLUMNS = (
    "url title text clean_text source wave_id warc_ts n_chars n_tokens "
    "stop_ratio lang_pred quality fingerprint summary topic "
    "sentiment_label sentiment_score locations organizations persons "
    "sample is_cleaned"
).split()


def golden_wave_articles_table(cfg: synth.SynthConfig):
    """The articles table of a full oracle crawl as a pyarrow Table in
    the driver-comparator serialization — the DuckDB side of the
    ``crawl_wave_articles`` correctness row.  Written to
    tests/golden/crawl_wave_articles.parquet by scripts/make_golden.py;
    tests/test_entry.py asserts the committed fixture matches a fresh
    regeneration, so synth/extract changes cannot silently stale it."""
    import pyarrow as pa

    res = run_oracle(cfg)
    rows = []
    for w in res.waves:
        for a in w.articles:
            r = dict(a)
            r["warc_ts"] = a["warc_ts"].strftime("%Y-%m-%d %H:%M:%S")
            for c in ("locations", "organizations", "persons"):
                r[c] = "|".join(a[c])
            rows.append(tuple(r[c] for c in GOLDEN_ARTICLE_COLUMNS))
    rows.sort(key=lambda t: (t[5], t[0]))  # wave_id, url
    schema = pa.schema(
        [
            pa.field(c, t)
            for c, t in zip(
                GOLDEN_ARTICLE_COLUMNS,
                [
                    pa.string(), pa.string(), pa.string(), pa.string(),
                    pa.string(), pa.string(), pa.string(),
                    pa.int64(), pa.int64(), pa.float64(), pa.string(),
                    pa.float64(), pa.string(), pa.string(), pa.string(),
                    pa.string(), pa.float64(), pa.string(), pa.string(),
                    pa.string(), pa.string(), pa.bool_(),
                ],
            )
        ]
    )
    cols = list(zip(*rows)) if rows else [[] for _ in GOLDEN_ARTICLE_COLUMNS]
    return pa.table(
        {c: pa.array(v, schema.field(c).type) for c, v in zip(GOLDEN_ARTICLE_COLUMNS, cols)},
        schema=schema,
    )
