"""Mimic the driver's correctness gate: run each queries() entry on
Spark and its oracle_sql() on DuckDB at sf0.01, compare row count,
column names, and order-insensitive values (exact, like a value hash).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from newscrawl.queries import QUERIES

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(val):
    if val is None:
        return "\x00NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        # kill -0.0 vs 0.0 and format stably
        return repr(val + 0.0)
    return repr(val)


def _rows(pdf):
    cols = sorted(pdf.columns)
    recs = [tuple(_canon(v) for v in row) for row in pdf[cols].itertuples(index=False)]
    return sorted(recs), cols


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    fn, sql = QUERIES[name]
    got_pdf = fn(spark, SF_DIR).toPandas()
    want_pdf = duck.execute(sql).df()

    got, got_cols = _rows(got_pdf)
    want, want_cols = _rows(want_pdf)
    assert got_cols == want_cols, f"{name}: column names differ"
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert len(got) > 0, f"{name}: empty result proves nothing"
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    assert not mism, f"{name}: first value mismatches: {mism[:5]}"


def test_gemm_block_count_bounds():
    """B = ceil(n / target) with a floor: per-task GEMM memory is bounded
    by the block target at ANY corpus size."""
    import math

    from newscrawl.queries import (
        GEMM_BLOCK_TARGET_ROWS,
        GEMM_MIN_BLOCKS,
        _gemm_block_count,
    )

    assert _gemm_block_count(0) == GEMM_MIN_BLOCKS
    assert _gemm_block_count(500) == GEMM_MIN_BLOCKS
    for n in (10**5, 10**7, 10**10):
        b = _gemm_block_count(n)
        assert math.ceil(n / b) <= GEMM_BLOCK_TARGET_ROWS
        assert b >= GEMM_MIN_BLOCKS


def test_gemm_group_rows_bounded_sf01(spark):
    """At sf0.1, every (bi,bj) shuffle group of the block-pair GEMM holds
    at most |block_i| + |block_j| rows, and no block exceeds ~4x the
    ideal n/B (hash balance) — the per-task memory bound is real."""
    from pyspark.sql import functions as F

    from newscrawl.queries import _gemm_block_count

    sf = "/root/testdata/sf0.1"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet").select("vec_id")
    n = emb.count()
    b = _gemm_block_count(n)
    sizes = {
        r._blk: r.cnt
        for r in emb.withColumn(
            "_blk", F.pmod(F.xxhash64("vec_id"), F.lit(b)).cast("int")
        )
        .groupBy("_blk")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    assert sum(sizes.values()) == n
    assert max(sizes.values()) <= max(4 * n // b, 64)


def test_bpe_merge_applies_to_fixpoint(spark, tmp_path):
    """Pin the merge-application semantics on the adversarial input
    'abab': with single-pass replace the word ' a b a b ' merges only
    its first pair per iteration (' ab a b '); the spec is fixpoint
    application, so after merging ('a','b') the word is ' ab ab ' and
    the SECOND winning pair must be 'ab ab' — textbook BPE.  Both
    engines must agree row-for-row on the same crafted corpus."""
    import duckdb as ddb

    from newscrawl.queries import SQL_BPE_TRAIN, q_bpe_train

    d = tmp_path / "bpe"
    spark.createDataFrame(
        [(0, "abab abab"), (1, "abab cd")],
        "doc_id bigint, text string",
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))

    got = (
        q_bpe_train(spark, str(d))
        .orderBy("step")
        .collect()
    )
    # step 0 merges the most frequent pair 'a b' (3 'abab' words x 2
    # occurrences each, counted on the unmerged form)
    assert (got[0].pair, got[0].frequency) == ("a b", 6)
    # fixpoint: ' a b a b ' -> ' ab ab ', so step 1's winner is the
    # adjacent merged pair — single-pass semantics would leave
    # ' ab a b ' and pick 'ab a' here instead
    assert got[1].pair == "ab ab"

    con = ddb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d / 'documents.parquet'}/*.parquet')"
    )
    want = con.execute(
        SQL_BPE_TRAIN + " ORDER BY step"
    ).fetchall()
    assert [(r.step, r.pair, r.frequency) for r in got] == [
        (s, p, f) for s, p, f in want
    ]
