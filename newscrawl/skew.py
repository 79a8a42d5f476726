"""Hot-key (skew) handling utilities.

A web corpus is Zipfian by construction: a handful of hosts own a huge
share of the urls (the reference's per-source loops never see this —
single process — but any shuffle keyed by host does, SURVEY.md §2.10).
Spark already covers two of the three skew surfaces:

- keyed AGGREGATIONS of algebraic functions: partial (map-side)
  aggregation flattens hot keys before the shuffle — nothing to do;
- skewed shuffle JOINS: AQE's skew-join splits oversized partitions at
  runtime (``spark.sql.adaptive.skewJoin``) — on by default in our
  sessions.

What neither fixes is the per-KEY group: Window functions partitioned
by host and ``applyInPandas``/``flatMapGroups`` kernels materialize one
key = one task's memory. A 100-TB crawl with a 10^8-url host makes that
task the straggler or an OOM. The helpers here implement the standard
two-stage salted decomposition for exactly those shapes, with the salt
DERIVED (deterministic, data-dependent) rather than random, so results
are replayable.

The engine's own hot path already applies this decomposition:
politeness.budget_gate ranks within (host, salt) and pre-prunes before
the exact per-host re-rank. These helpers generalize that pattern for
ad-hoc per-key top-k and skewed dim joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

DEFAULT_SALTS = 16


def with_salt(df: DataFrame, unique_col: str, n_salt: int = DEFAULT_SALTS) -> DataFrame:
    """Add a deterministic ``_salt`` in [0, n_salt) derived from a
    row-unique column (url): replayable (no rand()), uniform, and
    independent of the grouping key so every hot key spreads across all
    salts."""
    return df.withColumn(
        "_salt", F.pmod(F.xxhash64(unique_col), F.lit(n_salt)).cast("int")
    )


def salted_topk(
    df: DataFrame,
    key: str,
    order_cols: list[str],
    k: int,
    unique_col: str,
    n_salt: int = DEFAULT_SALTS,
) -> DataFrame:
    """Per-key top-k under skew: stage 1 takes top-k within every
    (key, salt) subgroup — each at most ~1/n_salt of the hot key's rows
    — then stage 2 takes top-k of the surviving k*n_salt rows per key.
    Identical rows to the naive single-Window top-k (top-k is
    salt-decomposable: the global top-k is contained in the union of
    per-salt top-ks), but no task ever sorts a whole hot key."""
    ordering = [F.col(c) for c in order_cols]
    w1 = W.partitionBy(key, "_salt").orderBy(*ordering)
    w2 = W.partitionBy(key).orderBy(*ordering)
    return (
        with_salt(df, unique_col, n_salt)
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
        .withColumn("_rn", F.row_number().over(w2))
        .filter(F.col("_rn") <= k)
        .drop("_rn", "_salt")
    )


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    unique_col: str,
    n_salt: int = DEFAULT_SALTS,
) -> DataFrame:
    """Equi-join a skewed fact table against a per-key dim table that is
    too large to broadcast: replicate every dim row across the n_salt
    salts and join on (key, salt), so a hot key's fact rows land in
    n_salt co-partitions instead of one. Row-identical to
    ``facts.join(dim, key)``; the cost is n_salt x the (small) dim
    shuffle. Use when AQE can't see the skew (e.g. the join feeds a
    same-keyed Window, so Spark plans one Exchange for both and AQE
    must keep the partitioning)."""
    salted_facts = with_salt(facts, unique_col, n_salt)
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(n_salt - 1))
    ).alias("_salt")
    salted_dim = dim.select("*", salts)
    return salted_facts.join(salted_dim, [key, "_salt"]).drop("_salt")
