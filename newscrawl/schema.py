"""All table schemas, declared once (SURVEY.md §1.3: the reference is
schemaless-by-convention; we invert that with fixed StructTypes).

The ``pages`` shape is the authoritative input per BASELINE.json
``input_hint``: (url:string, warc_ts:timestamp, html:binary, text:string,
lang:string).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Common-Crawl-style page corpus (BASELINE.json input_hint).
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# URL frontier. ``ord`` is a hierarchical, lexicographically sortable
# position key: seeds get zero-padded page position (DW seeds get the url
# itself — reference crawler_dw.py:194 sorts DW links lexicographically);
# outlinks get parent_ord + "." + zero-padded link index.
FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("source_rank", T.IntegerType(), False),
        T.StructField("section", T.StringType(), False),
        T.StructField("section_rank", T.IntegerType(), False),
        T.StructField("ord", T.StringType(), False),
    ]
)

# URL-seen set (reference link_pool, lib/repositories/link_pool_repository.py:65-79).
# Membership for skipping is exact on the RAW url (reference never
# canonicalizes; ingest/utils.py:7-13). url_hash (xxhash64 of url) is the
# shard / bloom key only.
SEEN = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("discovered_wave", T.StringType(), True),
        T.StructField("processed_wave", T.StringType(), True),
        T.StructField("is_processed", T.BooleanType(), False),
        # deterministic within-wave position key, persisted so the crawl
        # order fixture is reconstructible from state alone
        T.StructField("sort_key", T.StringType(), True),
    ]
)

# Crawl output: the reference's CLASSIFIED-article shape
# (ingest/classifier.py:249-271 — title/url/summary/text/source/sample/
# topic/sentiment/locations/organizations/persons/isCleaned), plus the
# deterministic cleaner output (call_to_genai.py:120-138) and per-page
# text-analysis enrichments (newscrawl/extract.py analyze_text).
ARTICLES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("clean_text", T.StringType(), True),
        T.StructField("source", T.StringType(), False),
        T.StructField("wave_id", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("n_chars", T.LongType(), True),
        T.StructField("n_tokens", T.LongType(), True),
        T.StructField("stop_ratio", T.DoubleType(), True),
        T.StructField("lang_pred", T.StringType(), True),
        T.StructField("quality", T.DoubleType(), True),
        T.StructField("fingerprint", T.StringType(), True),
        # classify-stage fields (deterministic stand-ins, extract.py
        # enrichment section; reference classifier.py:232-271)
        T.StructField("summary", T.StringType(), True),
        T.StructField("topic", T.StringType(), True),
        T.StructField("sentiment_label", T.StringType(), True),
        T.StructField("sentiment_score", T.DoubleType(), True),
        T.StructField("locations", T.ArrayType(T.StringType()), True),
        T.StructField("organizations", T.ArrayType(T.StringType()), True),
        T.StructField("persons", T.ArrayType(T.StringType()), True),
        # the per-run metadata id the reference stamps on every article
        # and processed link (classifier.py:192,254; 'sample') — the wave
        # id is its deterministic analog here
        T.StructField("sample", T.StringType(), True),
        T.StructField("is_cleaned", T.BooleanType(), True),  # classifier.py:262
    ]
)

# Per-wave metrics (reference metadata collection, ingest/classifier.py:202-207,308-318).
WAVE_METRICS = T.StructType(
    [
        T.StructField("wave_id", T.StringType(), False),
        T.StructField("n_frontier", T.LongType(), True),
        T.StructField("n_candidates", T.LongType(), True),
        T.StructField("n_yielded", T.LongType(), True),
        T.StructField("n_skipped", T.LongType(), True),
        T.StructField("n_articles", T.LongType(), True),
        T.StructField("n_carry", T.LongType(), True),
        T.StructField("n_new_outlinks", T.LongType(), True),
        T.StructField("source_distribution", T.StringType(), True),  # JSON
        # the reference's per-run distribution metadata
        # (classifier.py:295-318: Counter.most_common -> count-desc with
        # first-seen tie-break, percentage of total classified), JSON
        T.StructField("topic_distribution", T.StringType(), True),
        T.StructField("sentiment_distribution", T.StringType(), True),
    ]
)

# Optional per-wave multimodal sink (multimodal.page_media_features):
# typed features + resize plan over the fetched pages' raw payloads;
# the payload itself is never persisted (same rule as html).
MEDIA_FEATURES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha256_16", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("decode_ok", T.BooleanType(), True),
        T.StructField("target_width", T.IntegerType(), True),
        T.StructField("target_height", T.IntegerType(), True),
        T.StructField("needs_resize", T.BooleanType(), True),
        T.StructField("wave_id", T.StringType(), False),
    ]
)

# Sharded bloom-filter seen-set accelerator (SURVEY.md §4 item 1).
BLOOM_SHARDS = T.StructType(
    [
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("bitmap", T.BinaryType(), False),
        T.StructField("n_items", T.LongType(), False),
    ]
)

# Cuckoo-filter spill tier: the DELETABLE accelerator for the most
# recent SPILL_WAVES waves (north rule: "sharded bloom-filter (plus
# cuckoo-filter spill tier)"). Entries leave with their snapshot on
# rollback instead of poisoning the immutable bloom. The bloom bitmap
# of the same delta rides along so the eventual fold into the merged
# bloom is a driver-side OR, not a Spark job.
CUCKOO_SPILL = T.StructType(
    [
        T.StructField("wave_index", T.IntegerType(), False),
        T.StructField("shard", T.IntegerType(), False),
        T.StructField("bitmap", T.BinaryType(), False),  # cuckoo blob
        T.StructField("bloom_bitmap", T.BinaryType(), False),
        T.StructField("n_items", T.LongType(), False),
    ]
)

# Politeness additions (north rule; reference has none — robots.txt is
# never consulted in the reference tree).
HOST_STATE = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("budget", T.IntegerType(), True),
        T.StructField("news_score", T.DoubleType(), True),
        # last successful fetch per host — recency input to the scaled
        # scheduler (hosts idle longest crawl first within a budget tier)
        T.StructField("last_fetch_ts", T.TimestampType(), True),
    ]
)

# Signed webhook payloads (reference call_to_webhook.py:75-170): two
# rows per classified article — the embedding webhook body and the
# thread-events body — each HMAC-SHA256-signed over its compact JSON.
WEBHOOK_PAYLOADS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # embedding | thread_events
        T.StructField("payload", T.StringType(), False),  # compact JSON
        T.StructField("signature", T.StringType(), False),  # hex HMAC-SHA256
        T.StructField("wave_id", T.StringType(), False),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow", T.ArrayType(T.StringType()), True),
        # RFC 9309 Allow rules; per-url precedence = longest matching
        # prefix wins, Allow wins length ties (politeness.robots_filter)
        T.StructField("allow", T.ArrayType(T.StringType()), True),
    ]
)


# Persistent MinHash-LSH band index for the incremental near-dup gate
# (dedupgate.py): one row per (kept article, band). New waves probe this
# table by (band, key) equality — the index accretes canonical docs only.
MINHASH_BANDS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("band", T.IntegerType(), False),
        T.StructField("key", T.StringType(), False),  # concat of 2 minhashes
        T.StructField("wave_id", T.StringType(), False),
    ]
)

# Near-duplicate decisions per wave: why an article was flagged (and, in
# drop mode, withheld from the articles sink). matched_url = the
# earliest canonical match (min prior url, or the first-seen same-wave
# article under the crawl order).
NEAR_DUP_FLAGS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("matched_url", T.StringType(), True),
        T.StructField("n_band_hits", T.LongType(), True),
        T.StructField("scope", T.StringType(), True),  # prior_wave | same_wave
        T.StructField("wave_id", T.StringType(), False),
    ]
)

# Quality sink gate audit: articles withheld from the articles table by
# run_wave(min_quality=...), with the in-scan quality score that failed.
QUALITY_FLAGS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("quality", T.DoubleType(), True),
        T.StructField("wave_id", T.StringType(), False),
    ]
)
