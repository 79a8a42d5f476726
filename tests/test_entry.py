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
