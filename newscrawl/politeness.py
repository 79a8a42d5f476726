"""Per-host politeness budgets, robots gating, skew-defused ranking.

The reference's entire politeness model is one in-flight request
globally with fixed sleeps (SURVEY.md §2.10); robots.txt is never
consulted. These are north-rule *additions*: with ``budget=None`` and an
empty robots table the gate is a no-op and the engine is
reference-equivalent (required for fixture parity).

Skew: a hot host (e.g. hot.example.com in the synthetic corpus) would
put all its candidates in one Window partition. The budget gate is
therefore two-phase salted: rank within (host, salt) keeping only
``budget`` rows per salt — a cheap pre-prune that caps any single
partition at budget*n_salts rows — then re-rank the survivors within
host for the exact top-``budget``. Identical output to a single global
per-host Window, bounded partition sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from .priority import SORT_KEY, with_sort_key

HOST_RE = r"^https?://([^/]+)"
N_SALTS = 16


def with_host(df: DataFrame) -> DataFrame:
    return df.withColumn("host", F.regexp_extract("url", HOST_RE, 1))


def parse_robots(body: str | None, agent: str = "newscrawl") -> list[str]:
    """Minimal deterministic robots.txt parser -> Disallow prefixes.

    Groups are runs of ``User-agent`` lines followed by rules; the
    best-matching group wins (exact agent match beats ``*``; like the
    RFC 9309 longest-match rule collapsed to our two cases). Empty
    ``Disallow:`` means allow-all and contributes nothing. Comments
    (#...) and unknown directives are ignored. Pure function — the
    distributed cache builder and tests share it."""
    if not body:
        return []
    groups: list[tuple[list[str], list[str]]] = []  # (agents, disallows)
    cur_agents: list[str] = []
    cur_rules: list[str] = []
    in_agents = True
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agents:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            in_agents = True
            cur_agents.append(val.lower())
        elif key == "disallow":
            in_agents = False
            if val:
                cur_rules.append(val)
        elif key == "allow":
            in_agents = False  # group boundary tracking only
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    agent = agent.lower()
    exact = [r for agents, rules in groups if agent in agents for r in rules]
    if any(agent in agents for agents, _ in groups):
        return exact
    return [r for agents, rules in groups if "*" in agents for r in rules]


def parse_crawl_delay(body: str | None, agent: str = "newscrawl") -> float | None:
    """Crawl-delay (seconds) from the same group-matching rules as
    parse_robots: exact agent group wins over ``*``; absent -> None."""
    if not body:
        return None
    best: float | None = None
    star: float | None = None
    cur_agents: list[str] = []
    in_agents = True
    agent = agent.lower()
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_agents:
                cur_agents = []
            in_agents = True
            cur_agents.append(val.lower())
        else:
            in_agents = False
            if key == "crawl-delay":
                try:
                    d = float(val)
                except ValueError:
                    continue
                if agent in cur_agents:
                    best = d if best is None else min(best, d)
                elif "*" in cur_agents:
                    star = d if star is None else min(star, d)
    return best if best is not None else star


def host_budgets_from_robots(
    bodies: DataFrame, wave_seconds: float, agent: str = "newscrawl"
) -> DataFrame:
    """Derive HOST_STATE budget seeds from robots Crawl-delay: a host
    asking for one request per D seconds gets budget = floor(wave
    duration / D) fetches per wave (>= 1). Hosts with no delay get no
    row (unseeded = unlimited tier). Feed the result to
    ``wave.init_crawl(host_state_seed=...)`` with the scaled scheduler:
    robots politeness then shapes the priority queue itself, not just
    the allow/deny filter."""
    import math

    import pandas as pd

    def kernel(batch_iter):
        for pdf in batch_iter:
            hosts, budgets = [], []
            for host, body in zip(pdf["host"], pdf["body"]):
                d = parse_crawl_delay(body, agent)
                if d is not None and d > 0:
                    hosts.append(host)
                    budgets.append(max(int(math.floor(wave_seconds / d)), 1))
            yield pd.DataFrame(
                {
                    "host": pd.Series(hosts, dtype="object"),
                    "budget": pd.Series(budgets, dtype="int32"),
                }
            )

    return bodies.select("host", "body").mapInPandas(
        kernel, schema="host string, budget int"
    ).select(
        "host",
        "budget",
        F.lit(None).cast("double").alias("news_score"),
        F.lit(None).cast("timestamp").alias("last_fetch_ts"),
    )


def build_robots_table(bodies: DataFrame, agent: str = "newscrawl") -> DataFrame:
    """(host, body string) -> ROBOTS(host, disallow array<string>): the
    distributed robots cache build. Bodies come from fetching each
    host's /robots.txt (in this engine: rows of the page corpus);
    parsing runs vectorized in one Arrow kernel. The output is
    host-cardinality — small enough to broadcast into robots_filter,
    which is the 'robots.txt caching' of the north rule: fetched once
    per host per crawl epoch, consulted from the broadcast table for
    every candidate."""
    import pandas as pd

    def kernel(batch_iter):
        for pdf in batch_iter:
            out = pd.DataFrame({"host": pdf["host"]})
            out["disallow"] = [parse_robots(b, agent) for b in pdf["body"]]
            yield out

    return bodies.select("host", "body").mapInPandas(
        kernel, schema="host string, disallow array<string>"
    )


def robots_filter(candidates: DataFrame, robots: DataFrame | None) -> DataFrame:
    """Drop candidates whose url path starts with a disallowed prefix for
    its host. ``robots(host, disallow array<string>)`` is broadcast (it is
    host-cardinality, small). Hosts absent from the table are allowed.
    Disallowed urls are dropped permanently (not carried/retried)."""
    if robots is None:
        return candidates
    df = candidates if "host" in candidates.columns else with_host(candidates)
    df = df.withColumn("_path", F.regexp_replace("url", HOST_RE, ""))
    joined = df.join(F.broadcast(robots), "host", "left")
    allowed = joined.filter(
        F.col("disallow").isNull()
        | ~F.exists("disallow", lambda d: F.col("_path").startswith(d))
    )
    return allowed.drop("disallow", "_path")


def budget_gate(
    candidates: DataFrame,
    budget: "int | DataFrame | None",
    n_salts: int = N_SALTS,
) -> tuple[DataFrame, DataFrame]:
    """Top-``budget`` candidates per host by sort_key -> (kept, deferred).

    ``budget`` is a global int cap, or a PER-HOST table
    ``(host, budget int)`` (e.g. host_budgets_from_robots — Crawl-delay
    as an enforced per-wave cap); hosts absent from the table (or with
    null budget) are uncapped. Deferred rows stay in the frontier for
    the next wave (the reference analog: a homepage link not fetched
    this run is fetched on a later run).

    Two-phase ranking defuses host skew: phase 1 ranks within
    (host, salt) and pre-prunes to ``budget`` rows per salt — any row in
    a host's true top-``budget`` is necessarily within its salt's
    top-``budget``, so the prune is lossless for phase 2, which re-ranks
    at most budget*n_salts rows per host for the exact answer. Deferred
    rows are derived IN PLACE from the two rank columns (phase-1
    overflow union phase-2 overflow) — no join and no broadcast of the
    kept set, whose budget*n_hosts size is unbounded in host cardinality
    at web scale.
    """
    if budget is None:
        return candidates, None
    df = candidates if SORT_KEY in candidates.columns else with_sort_key(candidates)
    df = df if "host" in df.columns else with_host(df)

    if isinstance(budget, DataFrame):
        # host-cardinality table -> broadcast; null/absent = uncapped
        df = df.join(
            F.broadcast(
                budget.select("host", F.col("budget").alias("_budget"))
            ),
            "host",
            "left",
        )
        bcol = F.col("_budget")
    else:
        df = df.withColumn("_budget", F.lit(int(budget)))
        bcol = F.col("_budget")
    out_cols = [
        c for c in df.columns if c not in ("host", "_budget", "_rn1", "_rn2")
    ]
    # uncapped hosts bypass the gate entirely — they must not pay (or
    # re-skew) the per-host window; empty when budget is a global int
    free = df.filter(bcol.isNull()).select(*out_cols)
    capped = df.filter(bcol.isNotNull())

    salt = F.pmod(F.xxhash64("url"), F.lit(n_salts))
    w1 = W.partitionBy("host", salt).orderBy(SORT_KEY)
    phase1 = capped.withColumn("_rn1", F.row_number().over(w1))
    w2 = W.partitionBy("host").orderBy(SORT_KEY)
    phase2 = (
        phase1.filter(F.col("_rn1") <= bcol)
        .withColumn("_rn2", F.row_number().over(w2))
    )
    kept = phase2.filter(F.col("_rn2") <= bcol).select(*out_cols).unionByName(free)
    deferred = (
        phase1.filter(F.col("_rn1") > bcol)
        .select(*out_cols)
        .unionByName(phase2.filter(F.col("_rn2") > bcol).select(*out_cols))
    )
    return kept, deferred


def scaled_priority_key(df: DataFrame, host_state: DataFrame | None) -> DataFrame:
    """North-rule scaled scheduler ordering: (host budget, recency,
    news-source score). Used instead of the reference key when
    reference-parity is not required.

    host_state(host, budget, news_score, last_fetch_ts) broadcasts
    (host-cardinality). Recency = how long the host has been idle:
    hosts with the OLDEST last_fetch_ts sort first within a budget tier
    (never-fetched hosts first of all); then news score, then discovery
    depth and the reference ordering as tie-breaks.
    """
    df = df if "host" in df.columns else with_host(df)
    if host_state is not None:
        df = df.join(F.broadcast(host_state), "host", "left")
    else:
        df = (
            df.withColumn("budget", F.lit(None).cast("int"))
            .withColumn("news_score", F.lit(None).cast("double"))
            .withColumn("last_fetch_ts", F.lit(None).cast("timestamp"))
        )
    depth = F.size(F.split(F.col("ord"), r"\.")) - 1
    # every numeric key dimension is CLAMPED to its fixed format width —
    # a value wider than its zero-padded field would sort lexically
    # before narrower values (the same failure class as zfill-vs-lpad
    # truncation on child ords), silently breaking the total order
    budget_key = F.least(
        F.greatest(F.coalesce(F.col("budget"), F.lit(999_999)), F.lit(0)),
        F.lit(999_999),
    )
    score = F.least(
        F.greatest(F.coalesce(F.col("news_score"), F.lit(0.0)), F.lit(0.0)),
        F.lit(1.0),
    )
    # epoch seconds, zero-padded: older (smaller) sorts first; nulls
    # (never fetched) map to 0 = highest recency priority; pre-epoch
    # timestamps clamp to 0 rather than injecting a '-' into the key
    idle_key = F.lpad(
        F.greatest(
            F.coalesce(F.col("last_fetch_ts").cast("long"), F.lit(0)), F.lit(0)
        ).cast("string"),
        12,
        "0",
    )
    return df.withColumn(
        SORT_KEY,
        F.format_string(
            "%06d|%s|%04.0f|%02d|%02d|%s",
            budget_key,
            idle_key,
            (F.lit(1000) - score * 1000),
            depth,
            F.col("source_rank"),
            F.col("ord"),
        ),
    ).drop("budget", "news_score", "last_fetch_ts")
