"""Chunking / entity-list / HMAC functions and multimodal plumbing."""

from __future__ import annotations

import hashlib
import hmac as hmac_mod

import pytest

from newscrawl import functions as fn
from newscrawl import multimodal as mm


def test_chunk_paragraphs_packs_and_hard_splits():
    text = "aaa\n\nbbb\n\n" + "c" * 50
    chunks = fn.chunk_paragraphs(text, max_chars=10)
    assert all(len(c) <= 10 for c in chunks)
    assert "".join(chunks).count("c") == 50
    # packing: small paras merge under the budget
    merged = fn.chunk_paragraphs("aa\n\nbb", max_chars=100)
    assert merged == ["aa\n\nbb"]
    assert fn.chunk_paragraphs("") == []


def test_chunk_sentences_token_budget():
    text = "one two three. four five. six seven eight nine."
    chunks = fn.chunk_sentences(text, max_tokens=5)
    assert len(chunks) >= 2
    assert all(len(c.split()) <= 9 for c in chunks)  # no chunk way over


def test_dedupe_preserve_first_normalized():
    names = ["Biden's", "biden", '"Biden"', "EU", "eu Council"]
    assert fn.dedupe_preserve_first(names) == ["Biden's", "EU", "eu Council"]


def test_drop_contained_names_order_preserved():
    names = ["York", "New York City", "New York", "Paris"]
    assert fn.drop_contained_names(names) == ["New York City", "Paris"]


def test_hmac_matches_stdlib():
    key, payload = b"secret", b'{"a":1}'
    assert fn.hmac_sha256_hex(key, payload) == hmac_mod.new(
        key, payload, hashlib.sha256
    ).hexdigest()


def test_with_chunks_spark(spark):
    df = spark.createDataFrame(
        [(1, "aaa\n\nbbbb"), (2, "x" * 30)], "id long, text string"
    )
    out = {r.id: r.chunks for r in fn.with_chunks(df, max_chars=5).collect()}
    assert out[1] == ["aaa", "bbbb"]
    assert out[2] == ["x" * 5] * 6


def test_with_hmac_signature_spark(spark):
    df = spark.createDataFrame([(1, "payload")], "id long, body string")
    row = fn.with_hmac_signature(df, b"k", "body").collect()[0]
    assert row.signature == hmac_mod.new(b"k", b"payload", hashlib.sha256).hexdigest()


@pytest.fixture()
def media_df(spark):
    rows = [
        (1, b"\x89PNGfakebytes" * 100, "image"),
        (2, b"RIFFfakeaudio" * 50, "audio"),
        (3, None, "image"),
    ]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_media_features_deterministic_fallback(spark, media_df):
    feats = {r.media_id: r for r in mm.media_features(media_df).collect()}
    assert feats[1].n_bytes == len(b"\x89PNGfakebytes" * 100) and feats[1].decode_ok
    assert feats[1].sha256_16 == hashlib.sha256(b"\x89PNGfakebytes" * 100).hexdigest()[:16]
    assert 64 <= feats[1].width < 2048 and 64 <= feats[1].height < 2048
    assert feats[3].n_bytes == 0 and not feats[3].decode_ok
    # payload never in the output schema
    assert "payload" not in mm.media_features(media_df).columns


def test_decode_stubs_raise():
    import pytest as _pt

    with _pt.raises(NotImplementedError):
        mm.decode_image(b"x")
    with _pt.raises(NotImplementedError):
        mm.decode_audio(b"x")


def test_frame_sample_plan(spark, media_df):
    out = mm.frame_sample_plan(media_df, every_n=1).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r.frame_idx)
    # 1300 bytes -> 2 frames at every_n=1
    assert by_id[1] == [0, 1]
    assert by_id[3] == [0]


def test_resize_specs(spark, media_df):
    out = {r.media_id: r for r in mm.resize_specs(media_df, max_side=128).collect()}
    for r in out.values():
        if r.media_id == 3:
            continue  # null payload -> 0x0 pseudo image, no resize
        longest = max(r.width, r.height)
        t_longest = max(r.target_width, r.target_height)
        if longest > 128:
            assert r.needs_resize and t_longest <= 128
            # aspect preserved within integer flooring
            assert abs(
                r.width / r.height - r.target_width / max(r.target_height, 1)
            ) < 0.1
        else:
            assert not r.needs_resize
            assert (r.target_width, r.target_height) == (r.width, r.height)
    assert out[3].target_width == 0 and not out[3].needs_resize
