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


def parse_robots_rules(
    body: str | None, agent: str = "newscrawl"
) -> tuple[list[str], list[str]]:
    """Deterministic robots.txt parser -> (disallow, allow) prefix lists.

    RFC 9309 semantics at group level: groups are runs of ``User-agent``
    lines followed by rules, and ANY non-user-agent line (known or
    unknown directive, e.g. Crawl-delay or Sitemap) ends the agent-run —
    so ``User-agent: a / Crawl-delay: 1 / User-agent: b`` starts a NEW
    group for b rather than merging a and b. The best-matching group
    wins (exact agent match beats ``*``; the RFC's longest-agent-match
    collapsed to our two cases). Empty ``Disallow:``/``Allow:`` values
    contribute nothing. Comments (#...) are stripped. Pure function —
    the distributed cache builder and tests share it. Per-URL precedence
    (longest matching prefix wins, Allow wins length ties) is applied by
    ``robots_filter`` / ``robots_decision``."""
    if not body:
        return [], []
    # (agents, disallows, allows)
    groups: list[tuple[list[str], list[str], list[str]]] = []
    cur_agents: list[str] = []
    cur_dis: list[str] = []
    cur_allow: list[str] = []
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
                groups.append((cur_agents, cur_dis, cur_allow))
                cur_agents, cur_dis, cur_allow = [], [], []
            in_agents = True
            cur_agents.append(val.lower())
        else:
            # RFC 9309: any rule line (recognized or not) ends the
            # agent-run — matches parse_crawl_delay's boundary rule
            in_agents = False
            if key == "disallow" and val:
                cur_dis.append(val)
            elif key == "allow" and val:
                cur_allow.append(val)
    if cur_agents:
        groups.append((cur_agents, cur_dis, cur_allow))
    agent = agent.lower()
    if any(agent in agents for agents, _d, _a in groups):
        pick = [g for g in groups if agent in g[0]]
    else:
        pick = [g for g in groups if "*" in g[0]]
    return (
        [r for _a, dis, _al in pick for r in dis],
        [r for _a, _d, allow in pick for r in allow],
    )


def parse_robots(body: str | None, agent: str = "newscrawl") -> list[str]:
    """Disallow prefixes only (back-compat view of parse_robots_rules)."""
    return parse_robots_rules(body, agent)[0]


def robots_decision(path: str, disallow: list[str], allow: list[str]) -> bool:
    """Pure-Python spec of the per-URL RFC 9309 decision (the Spark
    filter in robots_filter mirrors this exactly; tests diff the two):
    among all matching prefixes, the LONGEST wins; an Allow rule wins a
    length tie; no matching rule -> allowed. An empty path (bare-host
    url) is '/' per RFC 9309."""
    path = path or "/"
    d = max((len(r) for r in disallow if path.startswith(r)), default=-1)
    a = max((len(r) for r in allow if path.startswith(r)), default=-1)
    return d == -1 or a >= d


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
    """(host, body string) -> ROBOTS(host, disallow, allow): the
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
            rules = [parse_robots_rules(b, agent) for b in pdf["body"]]
            out = pd.DataFrame({"host": pdf["host"]})
            out["disallow"] = [d for d, _a in rules]
            out["allow"] = [a for _d, a in rules]
            yield out

    return bodies.select("host", "body").mapInPandas(
        kernel, schema="host string, disallow array<string>, allow array<string>"
    )


def robots_filter(candidates: DataFrame, robots: DataFrame | None) -> DataFrame:
    """RFC 9309 per-url gate: among all rule prefixes matching the url
    path, the LONGEST wins; an ``Allow`` rule wins a length tie; no
    matching rule -> allowed. ``robots(host, disallow, allow)`` is
    broadcast (host-cardinality, small); an ``allow`` column is optional
    for back-compat (absent = no Allow rules). Hosts absent from the
    table are allowed. Disallowed urls are dropped permanently (not
    carried/retried). Entirely JVM-side higher-order functions — no
    Python in the per-candidate path. Spec twin: ``robots_decision``."""
    if robots is None:
        return candidates
    if "allow" not in robots.columns:
        robots = robots.withColumn("allow", F.lit(None).cast("array<string>"))
    df = candidates if "host" in candidates.columns else with_host(candidates)
    # RFC 9309: an absent path means '/' — a bare-host url
    # ('https://h') must match 'Disallow: /' like 'https://h/' does
    df = df.withColumn(
        "_path",
        F.when(
            F.regexp_replace("url", HOST_RE, "") == "", F.lit("/")
        ).otherwise(F.regexp_replace("url", HOST_RE, "")),
    )
    joined = df.join(F.broadcast(robots), "host", "left")

    def longest_match(col: str):
        # max length over matching prefixes; -1 when none match
        return F.coalesce(
            F.array_max(
                F.transform(
                    F.coalesce(F.col(col), F.array()),
                    lambda r: F.when(
                        F.col("_path").startswith(r), F.length(r)
                    ).otherwise(F.lit(-1)),
                )
            ),
            F.lit(-1),
        )

    allowed = joined.filter(
        (longest_match("disallow") == -1)
        | (longest_match("allow") >= longest_match("disallow"))
    )
    return allowed.drop("disallow", "allow", "_path")


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
