"""Webhook sink analog (reference call_to_webhook.py:75-170): the wave
commit writes one signed compact-JSON payload row per (article, webhook);
signatures must equal stdlib HMAC-SHA256 over the committed bytes."""

from __future__ import annotations

import hashlib
import hmac
import json

from newscrawl import synth, wave, webhook
from newscrawl.schema import WEBHOOK_PAYLOADS
from newscrawl.storage import ManifestParquetCatalog

KEY = b"test-webhook-signature-key"
CFG = synth.SynthConfig(n_seed=2, n_total=12, n_waves=2)


def _run(spark, tmp_path):
    catalog = ManifestParquetCatalog(str(tmp_path / "cat"))
    wave.run_crawl(spark, catalog, CFG, webhook_key=KEY)
    rows = catalog.read(spark, "webhook_payloads", WEBHOOK_PAYLOADS).collect()
    arts = wave.read_articles(spark, catalog).collect()
    return rows, arts


def test_webhook_payloads_signed_and_complete(spark, tmp_path):
    rows, arts = _run(spark, tmp_path)
    assert rows and arts
    # exactly two payloads (embedding + thread_events) per article
    assert len(rows) == 2 * len(arts)
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r.kind, []).append(r)
    assert set(by_kind) == {"embedding", "thread_events"}

    for r in rows:
        # the signature the reference puts in X-Signature: sha256=<hex>
        # (call_to_webhook.py:94-99) over the exact body bytes
        want = hmac.new(KEY, r.payload.encode("utf-8"), hashlib.sha256).hexdigest()
        assert r.signature == want, r.url
        body = json.loads(r.payload)
        required = (
            webhook.EMBEDDING_FIELDS if r.kind == "embedding" else webhook.THREAD_FIELDS
        )
        # _validate_payload's required_fields (call_to_webhook.py:81,139)
        assert all(body.get(f) is not None for f in required), (r.kind, body)
        assert body["article_id"] == r.url
        if r.kind == "embedding":
            assert body["table"] == "news_embeddings"
            assert set(body["sentiment"]) == {"label", "score"}

    # payload content matches the committed article row
    art = {a.url: a for a in arts}
    for r in by_kind["embedding"]:
        body = json.loads(r.payload)
        a = art[r.url]
        assert body["title"] == a.title
        assert body["topic"] == a.topic
        assert body["sentiment"]["label"] == a.sentiment_label

    # compact-JSON form (separators=(",", ":") — call_to_webhook.py:90-93)
    sample = by_kind["thread_events"][0].payload
    assert ", " not in sample and ": " not in sample


def test_webhook_rows_keyed_per_wave(spark, tmp_path):
    rows, arts = _run(spark, tmp_path)
    per_wave_arts = {}
    for a in arts:
        per_wave_arts[a.wave_id] = per_wave_arts.get(a.wave_id, 0) + 1
    per_wave_rows = {}
    for r in rows:
        per_wave_rows[r.wave_id] = per_wave_rows.get(r.wave_id, 0) + 1
    assert per_wave_rows == {w: 2 * n for w, n in per_wave_arts.items()}
