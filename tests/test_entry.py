"""Driver-contract smoke: entry() returns rows with a stable schema;
queries()/oracle_sql() keys line up; crawl_wave_articles runs."""

from __future__ import annotations

import __spark_entry__ as e


def test_entry_smoke(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["source", "lang", "n", "avg_chars", "pct"]


def test_query_registry_consistent():
    qs = e.queries()
    oracles = e.oracle_sql()
    # EVERY registered query has a DuckDB oracle (crawl_wave_articles
    # via the committed golden fixture)
    assert set(oracles) == set(qs)
    assert "read_parquet" in oracles["crawl_wave_articles"]
    assert len(qs) >= 20


def test_crawl_wave_articles_runs(spark):
    df = e.queries()["crawl_wave_articles"](spark, "/root/testdata/sf0.01")
    rows = df.collect()
    assert len(rows) > 0
    assert {"url", "title", "text", "clean_text", "source", "wave_id"} <= set(df.columns)
    # deterministic across invocations (fresh catalog each time)
    rows2 = e.queries()["crawl_wave_articles"](spark, "/root/testdata/sf0.01").collect()
    assert [(r.url, r.text) for r in rows] == [(r.url, r.text) for r in rows2]


def test_golden_fixture_fresh_and_matches_driver_query(spark):
    """The committed crawl_wave_articles fixture must equal a fresh
    reference-oracle regeneration (staleness guard for synth/extract
    changes) AND the Spark engine output row-for-row in the driver's
    comparator serialization."""
    import pyarrow.parquet as pq

    from newscrawl import reference_oracle as ro, synth

    committed = pq.read_table("tests/golden/crawl_wave_articles.parquet")
    fresh = ro.golden_wave_articles_table(
        synth.SynthConfig(n_seed=2, n_total=12, n_waves=2)
    )
    assert committed.equals(fresh), "run scripts/make_golden.py and commit"

    got = e.queries()["crawl_wave_articles"](spark, "unused").toPandas()
    want = committed.to_pandas()
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        a, b = list(got[c]), list(want[c])
        assert a == b, f"column {c} diverges: {a[:3]} vs {b[:3]}"


def test_corpus_prepare_crawled_runs_and_gates_fire(spark):
    """The crawl -> corpus-prepare composite: quality gate prunes part
    of the crawled corpus (72 of 126 golden articles survive — not
    all-pass, not all-fail) and packing assigns dense pack ids."""
    df = e.queries()["corpus_prepare_crawled"](spark, "/root/testdata/sf0.01")
    rows = df.collect()
    assert df.columns == ["doc_id", "lang", "n_tokens", "pack_id", "offset_in_pack"]
    assert 0 < len(rows) < 126  # the quality gate verifiably fires
    packs = sorted({r.pack_id for r in rows})
    assert packs == list(range(len(packs)))  # dense ids from 0


def test_corpus_prepare_crawled_dedup_leg_is_live(spark):
    """The dedup-keep stage keeps everything on the golden corpus (126
    distinct texts) — prove the leg is LIVE: inject a near-duplicate of
    a surviving article (higher doc_id, same text) and it must be
    pruned while the original survives."""
    import __spark_entry__ as em
    from pyspark.sql import functions as F
    from newscrawl import wave

    SF = "/root/testdata/sf0.01"
    arts = wave.read_articles(spark, em._entry_catalog(spark))
    docs = arts.select(
        F.conv(F.substring(F.md5("url"), 1, 15), 16, 10)
        .cast("long")
        .alias("doc_id"),
        F.col("lang_pred").alias("lang"),
        "text",
        "quality",
        "n_tokens",
    )
    base = {r.doc_id for r in em._prepare_crawled_docs(spark, SF, docs).collect()}
    donor = sorted(base)[0]
    dup = docs.filter(F.col("doc_id") == donor).select(
        (F.col("doc_id") + F.lit(1 << 61)).alias("doc_id"),
        "lang", "text", "quality", "n_tokens",
    )
    out = {
        r.doc_id
        for r in em._prepare_crawled_docs(
            spark, SF, docs.unionByName(dup)
        ).collect()
    }
    assert donor in out  # canonical (smaller doc_id) survives
    assert (donor + (1 << 61)) not in out  # injected near-dup pruned
    assert out == base
