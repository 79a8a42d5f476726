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
    assert set(oracles) <= set(qs)
    # every query except the engine-level one has a SQL oracle
    assert set(qs) - set(oracles) == {"crawl_wave_articles"}
    assert len(qs) >= 20


def test_crawl_wave_articles_runs(spark):
    df = e.queries()["crawl_wave_articles"](spark, "/root/testdata/sf0.01")
    rows = df.collect()
    assert len(rows) > 0
    assert {"url", "title", "text", "clean_text", "source", "wave_id"} <= set(df.columns)
    # deterministic across invocations (fresh catalog each time)
    rows2 = e.queries()["crawl_wave_articles"](spark, "/root/testdata/sf0.01").collect()
    assert [(r.url, r.text) for r in rows] == [(r.url, r.text) for r in rows2]
