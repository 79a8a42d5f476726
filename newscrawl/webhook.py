"""Signed webhook payload sink (reference ingest/call_to_webhook.py).

The reference POSTs every freshly classified article to two webhooks —
the embedding ingester and the thread-events stream — each with a
compact-JSON body and an ``X-Signature: sha256=<hex>`` header computed
as HMAC-SHA256 over the exact bytes of that body
(call_to_webhook.py:90-100,155-161; payload fields at :75-89,141-147).

The Spark-native analog is a SINK TABLE, not a per-row HTTP call: the
wave commit writes one ``webhook_payloads`` row per (article, webhook),
carrying the compact JSON body and its signature, produced entirely
inside the wave's DataFrame plan (``F.to_json`` over a struct emits the
reference's ``separators=(",", ":")`` compact form; signing runs in the
same Arrow kernel family as the other enrichments). A downstream
deliverer — a ``foreachBatch`` HTTP poster, a Kafka producer — reads
the committed table and replays it idempotently; signing is decoupled
from delivery exactly so retries never re-sign differently. Under
streaming.stream_crawl each micro-batch wave appends its own payload
rows, which makes this the foreachBatch sink path as well.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .functions import with_hmac_signature

# required_fields of the embedding webhook (call_to_webhook.py:81) and
# the thread-events webhook (call_to_webhook.py:139)
EMBEDDING_FIELDS = (
    "article_id", "url", "title", "text", "topic", "source",
    "sentiment", "scraped_at",
)
THREAD_FIELDS = ("article_id", "source", "scraped_at")


def signed_payloads(articles: DataFrame, key: bytes) -> DataFrame:
    """(url, kind, payload, signature, wave_id) — two signed rows per
    classified article.

    ``article_id`` is the article's url (the deterministic analog of the
    reference's Mongo insert id). The embedding payload carries the
    ``table: news_embeddings`` routing field the reference appends
    before signing (call_to_webhook.py:88).
    """
    scraped_at = F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")
    emb = articles.select(
        "url",
        F.lit("embedding").alias("kind"),
        F.to_json(
            F.struct(
                F.col("url").alias("article_id"),
                F.col("url").alias("url"),
                F.col("title").alias("title"),
                F.col("text").alias("text"),
                F.col("topic").alias("topic"),
                F.col("source").alias("source"),
                F.struct(
                    F.col("sentiment_label").alias("label"),
                    F.col("sentiment_score").alias("score"),
                ).alias("sentiment"),
                scraped_at.alias("scraped_at"),
                F.lit("news_embeddings").alias("table"),
            )
        ).alias("payload"),
        "wave_id",
    )
    thread = articles.select(
        "url",
        F.lit("thread_events").alias("kind"),
        F.to_json(
            F.struct(
                F.col("url").alias("article_id"),
                F.col("source").alias("source"),
                scraped_at.alias("scraped_at"),
            )
        ).alias("payload"),
        "wave_id",
    )
    both = emb.unionByName(thread)
    return with_hmac_signature(both, key, "payload").select(
        "url", "kind", "payload", "signature", "wave_id"
    )
