"""One crawl wave as a declarative DataFrame plan, plus the multi-wave loop.

Plan per wave (SURVEY.md §3.2 Spark lifecycle), replacing the
reference's sequential scrape loop (/root/reference/ingest/
get_all_articles.py:6-19 + classifier.py:194-320):

    frontier snapshot
      -> sort_key + first-wins dedup           (Window, F2)
      -> bloom-prefiltered exact seen anti-join (J1/F1)
      -> robots filter + per-host budget gate   (north-rule additions;
                                                 no-ops in reference mode)
      -> pages scan ⋈ broadcast(candidates)     (the "fetch"; J4 —
         html never shuffles; pages_table= switches to the bucketed
         co-located zero-Exchange variant, bucketing.py)
      -> mapInPandas extract, html dropped in-scan (S14, P8, F4 +
         per-page text analysis + the classify stage: topic/sentiment/
         summary/entities, reference classifier.py:232-277)
      -> split: articles Δ | seen Δ | carry (fetch-fail or <100 chars,
               retried next wave) | child frontier rows
      -> atomic multi-table commit, output jobs submitted concurrently
         (frontier overwrite, seen/articles/metrics append, bloom
         shards overwrite; delta writes coalesced, zstd)

Crash anywhere before commit leaves state untouched; re-running the wave
is idempotent (the driver loop resumes from the snapshot's wave index).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from . import extract as ex
from . import (
    bucketing,
    canonicalize,
    dedupgate,
    multimodal,
    politeness,
    priority,
    seenset,
    synth,
    webhook,
)
from .reference_oracle import wave_id_for
from .schema import (
    ARTICLES,
    BLOOM_SHARDS,
    CUCKOO_SPILL,
    FRONTIER,
    HOST_STATE,
    MEDIA_FEATURES,
    MINHASH_BANDS,
    NEAR_DUP_FLAGS,
    SEEN,
    WAVE_METRICS,
)
from .storage import ManifestParquetCatalog

FRONTIER_COLS = [f.name for f in FRONTIER.fields]


def _target_file_bytes() -> int:
    """Target parquet file size for wave delta writes (default 128 MiB —
    the standard HDFS-block-aligned choice).  Env-overridable so tests
    can exercise the rows->file-count scaling at tiny corpus sizes."""
    return int(
        float(os.environ.get("NEWSCRAWL_TARGET_FILE_MB", "128")) * (1 << 20)
    )


def init_crawl(
    spark: SparkSession,
    catalog: ManifestParquetCatalog,
    seeds: DataFrame,
    host_state_seed: DataFrame | None = None,
) -> None:
    """Commit the seed frontier as snapshot 0 (wave_index=-1). An
    optional host_state seed carries per-host budgets / news scores for
    the scaled scheduler (recency fills in as waves run)."""
    commit = catalog.begin()
    commit.write("frontier", priority.seed_ord(seeds).select(*FRONTIER_COLS), mode="overwrite")
    if host_state_seed is not None:
        commit.write(
            "host_state",
            host_state_seed.select(*[f.name for f in HOST_STATE.fields]),
            mode="overwrite",
        )
    commit.commit(wave_id="init", wave_index=-1)


def _load_bloom(spark: SparkSession, catalog: ManifestParquetCatalog) -> seenset.BloomShardSet | None:
    # driver-side pyarrow read: the accelerator tables are bounded
    # (shards x window rows) and a Spark collect costs a job per wave
    rows = catalog.read_rows("bloom_shards", ["shard", "bitmap", "n_items"])
    if not rows:
        return None
    return seenset.BloomShardSet.from_rows([(r.shard, r.bitmap, r.n_items) for r in rows])


# Waves covered by the DELETABLE cuckoo tier instead of the immutable
# bloom: a rollback within this window removes those waves' accelerator
# entries with their snapshots (blooms cannot un-merge). The leaving
# wave's delta folds into the bloom via the manifest's per-wave file
# lineage — one bounded delta read, never a seen-table rescan.
SPILL_WAVES = 2


def _load_spill_rows(spark: SparkSession, catalog: ManifestParquetCatalog) -> list:
    """The spill window's raw rows: cuckoo blobs (prefilter tier) plus
    each wave's precomputed bloom bitmaps (the fold input)."""
    return catalog.read_rows(
        "cuckoo_spill",
        ["wave_index", "shard", "bitmap", "bloom_bitmap", "n_items"],
    )


def _load_spill(spark: SparkSession, catalog: ManifestParquetCatalog) -> "seenset.CuckooShardSet | None":
    rows = _load_spill_rows(spark, catalog)
    if not rows:
        return None
    return seenset.CuckooShardSet.from_rows(
        [(r.wave_index, r.shard, r.bitmap, r.n_items) for r in rows]
    )


def run_wave(
    spark: SparkSession,
    catalog: ManifestParquetCatalog,
    pages: DataFrame,
    wave_index: int,
    min_text_chars: int = ex.MIN_TEXT_CHARS,
    budget: int | None = None,
    robots: DataFrame | None = None,
    use_bloom: bool = True,
    webhook_key: bytes | None = None,
    scheduler: str = "reference",
    pages_table: str | None = None,
    fetch_buckets: int = 32,
    enrich_fn=None,
    media_sink: bool = False,
    media_max_side: int = 256,
    dedup_gate: str | None = None,
    min_quality: float | None = None,
    extra_metrics: dict | None = None,
    dedup_captures: bool = False,
) -> dict:
    """One crawl wave. ``enrich_fn`` swaps the deterministic classify
    stand-in for real model inference (see extract.make_extract_kernel).

    ``dedup_captures``: the batch pages input carries a unique-url
    contract (a capture table keyed by url), so the fetch join emits one
    article per candidate with zero dedup cost. Streaming micro-batches
    can break that contract — a cross-lineage restart re-delivers files,
    so one batch may hold several captures of the same url. With
    dedup_captures=True the wave keeps the LATEST capture per url
    (max warc_ts, fingerprint tie-break), applied AFTER extraction so
    the window shuffles only the wave-bounded extracted rows and the
    raw html still never moves.

    ``min_quality`` withholds articles whose in-scan quality score falls
    below the threshold from the articles sink (a ``quality_flags``
    table records them with their scores — the audit trail).  Crawl
    semantics (seen set, frontier, outlinks) are untouched, exactly
    like the dedup gate: these are SINK filters for the training-data
    pipeline, not crawl-scheduling changes.

    ``dedup_gate`` enables the incremental near-dup gate (dedupgate.py —
    a persistent MinHash band index probed per wave): ``"flag"`` records
    near-dup decisions in a ``near_dup_flags`` table; ``"drop"``
    additionally withholds flagged articles from the articles sink.
    Either way the kept articles' band rows append to ``minhash_bands``
    atomically with the wave.

    ``media_sink=True`` adds the wave-level multimodal path: the fetched
    pages' raw payloads run through the typed-feature + resize-plan
    kernel (multimodal.page_media_features) and commit as a
    ``media_features`` table alongside the other state. It costs one
    extra pass over the fetched slice (the extract kernel drops the
    bytes, so media needs its own scan) — payloads are never persisted.
    ``scheduler`` picks the candidate ordering:

    - ``"reference"`` (default): the reference's total order
      (source rank, section rank, ord) — required for fixture parity.
    - ``"scaled"``: the north-rule priority queue (host budget tier,
      host idle time, news score, then the reference order as
      tie-break), driven by the persisted ``host_state`` table whose
      ``last_fetch_ts`` this wave updates at commit — hosts idle
      longest crawl first, never-fetched hosts first of all.

    ``pages_table`` switches the fetch join's physical strategy: when
    set (the name of a url-bucketed pages table, see
    ``bucketing.write_bucketed`` — ``fetch_buckets`` must match its
    spec), the wave's candidates are written bucketed on url and the
    fetch becomes a co-located sort-merge join with NO Exchange on the
    pages side — the 10^10-frontier path where the candidate set is too
    large to broadcast and html bytes still never move. Default (None):
    broadcast the slim candidate metadata into the pages scan.
    """
    wid = wave_id_for(wave_index)
    _timing = bool(os.environ.get("NEWSCRAWL_TIMING"))
    _t = time.perf_counter()

    def tick(label: str) -> None:
        nonlocal _t
        if _timing:
            now = time.perf_counter()
            print(f"[{wid}] {label}: {now - _t:.2f}s", flush=True)
            _t = now

    frontier = catalog.read(spark, "frontier", FRONTIER)
    seen = catalog.read(spark, "seen", SEEN).filter(F.col("is_processed"))

    # frontier row count is free from the snapshot manifest (lineage stats)
    n_frontier = catalog.table_stats("frontier").get("rows", 0)

    if scheduler == "scaled":
        host_state = catalog.read(spark, "host_state", HOST_STATE)
        keyed = politeness.scaled_priority_key(frontier, host_state)
    else:
        host_state = None
        keyed = priority.with_sort_key(frontier)
    cands = priority.first_wins_dedup(keyed)
    # shard/bloom key = hash of the CANONICAL url (equivalent spellings
    # co-locate); membership equality stays exact on the raw url
    cands = cands.withColumn("url_hash", canonicalize.canonical_hash("url"))
    # n_candidates rides the extract job as an observed metric instead
    # of a dedicated count: the count was a standalone job whose fixed
    # scheduling cost got WORSE with more cores (1.61 s @ 8 CPUs ->
    # 2.30 s @ 32 in the r5 scaling residue) while the extract job
    # traverses cands anyway (broadcast build of the kept candidates
    # fills the cache and fires the observation — verified incl. the
    # cached-frame + broadcast-subtree case).
    from pyspark.sql import Observation

    _cand_obs = Observation(f"n_candidates_{wid}")
    cands = cands.observe(_cand_obs, F.count(F.lit(1)).alias("n"))
    cands.persist()
    tick("dedup(plan)")

    def _n_candidates() -> int:
        # the extract materialization has executed the observed node by
        # the time metrics are read; the bounded wait + counted fallback
        # only guards a future re-ordering of the wave's jobs
        import threading

        box = {}

        def _get():
            try:
                box["v"] = _cand_obs.get
            except Exception:
                # metrics can be unavailable or unconvertible (seen:
                # toPyRow assertion on an empty gated wave) — leave the
                # box empty so the counted fallback below answers
                pass

        t = threading.Thread(target=_get, daemon=True)
        t.start()
        t.join(10.0)
        if "v" in box:
            return int(box["v"]["n"])
        return cands.count()

    bloom = _load_bloom(spark, catalog) if use_bloom else None
    spill_rows = _load_spill_rows(spark, catalog) if use_bloom else []
    spill = (
        seenset.CuckooShardSet.from_rows(
            [(r.wave_index, r.shard, r.bitmap, r.n_items) for r in spill_rows]
        )
        if spill_rows
        else None
    )
    tick("bloom_load")
    unseen = seenset.antijoin_unseen(cands, seen, bloom, spill)
    unseen = politeness.robots_filter(unseen, robots)

    kept, deferred = politeness.budget_gate(unseen, budget)
    kept = kept.persist()

    # the "fetch": frontier x pages on raw url. Physical strategy for a
    # page corpus orders of magnitude bigger than the wave's candidates:
    # broadcast the candidate rows into the pages scan (map-side hash
    # join) and extract IMMEDIATELY — html is consumed and dropped
    # inside the scan-side pandas UDF, and the extracted text inherits
    # the frontier metadata in place, so NEITHER the raw bytes NOR the
    # text ever shuffle. One driver-built broadcast per wave is the
    # price; at a frontier too large to broadcast, swap this join for a
    # url_hash-bucketed co-located sort-merge (one localized change).
    # broadcast only the six frontier columns; sort_key and url_hash are
    # deterministic projections, recomputed JVM-side after extraction —
    # ~25% less broadcast payload per wave
    cand_table = None
    if pages_table is not None:
        # bucketed co-located path: shuffle ONLY the slim candidates
        # (one bucketed write per wave); the sort-merge join against the
        # identically-bucketed pages table plans zero Exchange on the
        # pages side, so html never moves even at frontier sizes far
        # beyond any broadcast threshold
        import hashlib as _hl

        cand_table = (
            "newscrawl_cand_"
            + _hl.md5(catalog.root.encode("utf-8")).hexdigest()[:10]
        )
        bucketing.write_bucketed(
            kept.select(*FRONTIER_COLS), cand_table, fetch_buckets
        )
        fetched = spark.table(pages_table).select("url", "warc_ts", "html").join(
            spark.table(cand_table), "url", "inner"
        )
    else:
        fetched = pages.select("url", "warc_ts", "html").join(
            F.broadcast(kept.select(*FRONTIER_COLS)), "url", "inner"
        )
    in_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in fetched.schema.fields
        if f.name != "html"
    )
    kernel = (
        ex.extract_pages if enrich_fn is None else ex.make_extract_kernel(enrich_fn)
    )
    ext_raw = fetched.mapInPandas(kernel, schema=f"{in_ddl}, {ex.EXTRACT_COLUMNS}")
    # re-key with the SAME scheduler that ordered the candidates (the
    # broadcast carries only the six frontier columns; the key is a
    # deterministic projection, so recomputation equals selection)
    if scheduler == "scaled":
        ext_keyed = politeness.scaled_priority_key(ext_raw, host_state).drop("host")
    else:
        ext_keyed = priority.with_sort_key(ext_raw)
    if dedup_captures:
        # latest capture per url wins (see docstring); html is already
        # consumed, so this windows over slim extracted rows only
        from pyspark.sql.window import Window as _W

        _cw = _W.partitionBy("url").orderBy(
            F.col("warc_ts").desc(), F.col("fingerprint")
        )
        ext_keyed = (
            ext_keyed.withColumn("_cap_rn", F.row_number().over(_cw))
            .filter(F.col("_cap_rn") == 1)
            .drop("_cap_rn")
        )
    extracted = ext_keyed.withColumn(
        "url_hash", canonicalize.canonical_hash("url")
    ).withColumn(
        "yielded", F.length(F.coalesce(F.col("text"), F.lit(""))) >= min_text_chars
    )
    extracted.persist()
    # fetch failures: candidates with no page behind them — derived from
    # the (persisted, already-small) extract output, not a second scan
    failed = kept.join(extracted.select("url"), "url", "left_anti").select(
        *FRONTIER_COLS
    )
    try:
        yielded = extracted.filter(F.col("yielded"))

        seen_delta = yielded.select(
            "url",
            "url_hash",
            F.lit(wid).alias("discovered_wave"),
            F.lit(wid).alias("processed_wave"),
            F.lit(True).alias("is_processed"),
            F.col(priority.SORT_KEY).alias("sort_key"),
        )
        # classified articles (reference classifier.py:214-277): the
        # enrichment columns were computed in-scan by the extract kernel;
        # article rows are the post-skip-gate slice. 'sample' = the
        # reference's per-run metadata id stamped on every classified
        # article (classifier.py:192,254) — the wave id is its
        # deterministic analog; isCleaned inserted False verbatim
        # (classifier.py:262).
        classified = yielded.filter(~F.col("skip"))
        articles = classified.select(
            "url",
            "title",
            "text",
            "clean_text",
            "source",
            F.lit(wid).alias("wave_id"),
            "warc_ts",
            F.length("text").cast("long").alias("n_chars"),
            "n_tokens",
            "stop_ratio",
            "lang_pred",
            "quality",
            "fingerprint",
            "summary",
            "topic",
            "sentiment_label",
            "sentiment_score",
            "locations",
            "organizations",
            "persons",
            F.lit(wid).alias("sample"),
            F.lit(False).alias("is_cleaned"),
        )
        # incremental near-dup gate: probe the persistent band index
        # BEFORE this wave's commit (reads the previous snapshot), flag
        # prior-wave and first-wins same-wave near-dups, and in drop
        # mode withhold them from the articles sink. seen/frontier
        # semantics are untouched — a near-dup url is still "seen" and
        # its outlinks still schedule (only the article sink dedups).
        if dedup_gate:
            prior_bands = (
                catalog.read(spark, "minhash_bands", MINHASH_BANDS)
                if catalog.table_stats("minhash_bands")
                else None
            )
            nd_flags, nd_kept_bands, _nd_cached = dedupgate.wave_flags(
                classified.select(
                    "url", "text", F.col(priority.SORT_KEY).alias("sort_key")
                ),
                prior_bands,
            )
            # keep the handle wave_flags persisted: rebinding nd_flags
            # below derives a NEW frame, and unpersisting the derived
            # frame would be a no-op on the parent's cached relation
            # (one leaked persisted DataFrame per gated wave)
            _nd_flags_cached = nd_flags
            nd_flags = nd_flags.withColumn("wave_id", F.lit(wid))
            if dedup_gate == "drop":
                articles = articles.join(
                    nd_flags.select("url"), "url", "left_anti"
                )
        else:
            nd_flags = nd_kept_bands = _nd_cached = _nd_flags_cached = None

        # quality sink gate (audit-trailed): below-threshold articles go
        # to quality_flags instead of the articles table
        if min_quality is not None:
            q_flags = (
                articles.filter(F.col("quality") < F.lit(float(min_quality)))
                .select("url", "quality")
                .withColumn("wave_id", F.lit(wid))
            )
            articles = articles.filter(
                F.col("quality") >= F.lit(float(min_quality))
            )
            if nd_kept_bands is not None:
                # the band index holds canonical SINK articles only — a
                # quality-dropped doc must not become a dedup canonical
                nd_kept_bands = nd_kept_bands.join(
                    q_flags.select("url"), "url", "left_anti"
                )
        else:
            q_flags = None

        # carry = fetch failures (anti-join side) + too-short pages +
        # budget-deferred rows; all retried next wave (reference scrapers
        # never insert_link for these, custom_scrapers.py:96-108,376-378)
        carry = extracted.filter(~F.col("yielded")).select(*FRONTIER_COLS)
        carry = carry.unionByName(failed)
        if deferred is not None:
            carry = carry.unionByName(deferred.select(*FRONTIER_COLS))
        children = priority.child_frontier(yielded).select(*FRONTIER_COLS)
        new_frontier = carry.unionByName(children)

        # In DROP mode the articles sink depends on the flag decisions,
        # so the gate must materialize (extract cache -> bands -> flags)
        # BEFORE any write: two concurrent jobs racing an unfilled cache
        # would each recompute the (md5-heavy) band kernel and the probe
        # joins. In FLAG mode (and ungated) the articles frame does NOT
        # depend on the flags, so the fused write below both fills the
        # extract cache AND overlaps sink IO with extract CPU; the
        # band/flag frames then materialize off the filled cache.
        _gate_pre_fuse = _nd_cached is not None and dedup_gate == "drop"
        if _gate_pre_fuse:
            n_extracted = extracted.count()
            tick("extract(materialize)")
            _nd_cached.count()
            tick("dedup_gate(bands materialize)")
            nd_flags.count()
            tick("dedup_gate(flags materialize)")
        else:
            # the articles WRITE below is the action that materializes
            # the extract cache — extract CPU and sink IO overlap inside
            # one job instead of serializing (a real cluster's sink
            # streams from the extract stage; it never materializes-
            # then-rewrites). n_extracted is read off the filled cache
            # right after.
            n_extracted = -1  # set after the fused write

        # metrics (A1-A3 analogs) in ONE aggregation job over the persisted
        # wave output: per-source yielded counts (count-desc, first-seen
        # tie-break — reference Counter.most_common, classifier.py:295-307),
        # skip counts, and outlink counts.
        def compute_stats():
            return (
                extracted.groupBy("source")
                .agg(
                    F.count(F.when(F.col("yielded"), 1)).alias("n"),
                    F.count(F.when(F.col("yielded") & F.col("skip"), 1)).alias(
                        "n_skip"
                    ),
                    F.sum(
                        F.when(F.col("yielded"), F.size("outlinks")).otherwise(
                            F.lit(0)
                        )
                    ).alias("n_out"),
                    F.count(F.when(~F.col("yielded"), 1)).alias("n_fail"),
                    F.min(F.when(F.col("yielded"), F.col(priority.SORT_KEY))).alias(
                        "first_seen"
                    ),
                )
                .collect()
            )

        # per-wave topic/sentiment distributions (reference
        # classifier.py:295-318) in ONE aggregation job over the enriched
        # articles: both dimensions explode into (kind, label) rows so a
        # single groupBy covers them; min(_sk) is the first-seen
        # tie-break (Counter.most_common ties = insertion order = crawl
        # order of the first article with that label).
        def compute_dims():
            return (
                classified.select(
                    F.col(priority.SORT_KEY).alias("_sk"),
                    F.explode(
                        F.array(
                            F.struct(
                                F.lit("topic").alias("kind"),
                                F.col("topic").alias("label"),
                            ),
                            F.struct(
                                F.lit("sentiment").alias("kind"),
                                F.col("sentiment_label").alias("label"),
                            ),
                        )
                    ).alias("d"),
                )
                .select("d.kind", "d.label", "_sk")
                .groupBy("kind", "label")
                .agg(F.count("*").alias("n"), F.min("_sk").alias("first_seen"))
                .collect()
            )

        # the wave's output jobs are independent of each other — submit
        # them concurrently so the driver doesn't serialize four small
        # writes + an agg behind one another (Spark schedules concurrent
        # jobs across the same executors)
        commit = catalog.begin()
        from concurrent.futures import ThreadPoolExecutor

        # coalesce delta writes: the extract stage runs wide (one partition
        # per scan split), but writing one file per split piles up tiny
        # files wave over wave and every later state read pays for it
        # (the classic small-files problem). Narrow only the write side.
        # Width per table = estimated delta bytes / target file size, with
        # bytes/row taken from the catalog's manifest stats (all waves so
        # far) — so a 10x-bigger wave writes ~10x the files instead of a
        # constant count, and file sizes stay near the target at any wave
        # size. A delta smaller than one target file writes ONE file —
        # the r5 scaling residue showed the frontier write taking 3.09 s
        # at 32 CPUs for a 1.6 MB delta purely from multi-file task
        # scheduling (and getting SLOWER with more cores); KB-to-MB
        # state deltas have nothing to parallelize. First wave (no
        # stats yet) estimates with a conservative bytes/row instead of
        # a core-derived constant, for the same reason.
        _cores = spark.sparkContext.defaultParallelism
        _FALLBACK_BYTES_PER_ROW = 256
        # width derives from the MINIMUM acceptable file size, not the
        # target: the write is zstd-compression-bound, so subject to
        # "no file smaller than ~16 MB" it should use as MANY cores as
        # possible (a 1.27 GB articles delta on 2-10 of 32 cores leaves
        # most compressors idle — measured 25 s vs ~4 s full-width).
        # Files land between 16 MB and ~1 GB; compact() bin-packs them
        # toward the target later. Also the safety margin for the bytes
        # ESTIMATE: bytes/row observed on a tiny seed wave ran 5x under
        # the big-wave reality, and a min-size divisor over-widens
        # gracefully where a target-size divisor serialized the write.
        _MIN_FILE_BYTES = 16 << 20
        # deltas at or below this may SHUFFLE into their write tasks
        # (repartition keeps the upstream derivation wide); anything
        # bigger must coalesce — repartitioning GB-scale article text
        # re-copies the whole data plane (measured: the 32-CPU articles
        # write went 6.9 s -> 40.8 s when it briefly took the
        # repartition path).
        _SMALL_DELTA_BYTES = 64 << 20
        # fused articles write: above this estimated delta the carried
        # extract stage must not collapse to one core (ADVICE r6)
        _FUSED_FLOOR_BYTES = 256 << 10

        def write_plan(table: str, n_rows_est: int) -> tuple:
            st = catalog.table_stats(table)
            rows = st.get("rows", 0)
            nbytes = sum(f.get("bytes", 0) for f in st.get("files", []))
            bpr = (nbytes / rows) if rows and nbytes else _FALLBACK_BYTES_PER_ROW
            est_bytes = n_rows_est * bpr
            import math

            # honor an explicitly-small NEWSCRAWL_TARGET_FILE_MB (tests
            # and tiny-state tables); otherwise divide by the min size
            divisor = min(_target_file_bytes(), _MIN_FILE_BYTES)
            width = min(max(1, math.ceil(est_bytes / divisor)), _cores)
            return width, est_bytes

        def narrowed(
            df: DataFrame, width: int, est_bytes: float | None = None
        ) -> DataFrame:
            # HOW to narrow matters as much as the width: coalesce(w)
            # collapses the whole UPSTREAM computation to w tasks (a
            # 1-file frontier write would derive carry+children on one
            # core — the serialization measured at 1.2-1.6 s/wave),
            # while repartition keeps the derivation wide and shuffles
            # only the KB-to-MB delta into w write tasks. The shuffle is
            # ONLY for provably small deltas: big frames always coalesce
            # (no shuffle of big bytes — the articles write at scale).
            if (
                est_bytes is not None
                and est_bytes <= _SMALL_DELTA_BYTES
                and width < _cores // 2
            ):
                return df.repartition(width)
            return df.coalesce(width)

        def write_narrowed(
            table: str, df: DataFrame, n_rows_est: int
        ) -> DataFrame:
            width, est_bytes = write_plan(table, n_rows_est)
            return narrowed(df, width, est_bytes)

        def timed_write(table: str, df: DataFrame, mode: str) -> int:
            # NEWSCRAWL_TIMING: per-write wall time + bytes, the evidence
            # behind the commit-residue decomposition in BENCH/BASELINE.md
            # (futures run concurrently — the pool's wall time is the MAX
            # of these, not the sum)
            t0 = time.perf_counter()
            rows = commit.write(table, df, mode)
            if _timing:
                nbytes = sum(
                    f["bytes"]
                    for t, _m, fs, _r in commit._writes
                    if t == table
                    for f in fs
                )
                print(
                    f"[{wid}] write:{table}: {time.perf_counter() - t0:.2f}s "
                    f"rows={rows} bytes={nbytes}",
                    flush=True,
                )
            return rows

        def timed_job(label: str, fn):
            t0 = time.perf_counter()
            out = fn()
            if _timing:
                print(
                    f"[{wid}] job:{label}: {time.perf_counter() - t0:.2f}s",
                    flush=True,
                )
            return out

        _fused_articles = n_extracted < 0
        if _fused_articles:
            # THE data-plane fusion: this write traverses (and fills)
            # the extract cache, so extract CPU and articles sink IO
            # run in ONE job — the 10+ s/wave the articles write spent
            # as serial residue now overlaps the extract stage. Width =
            # every core (coalesce must not narrow the extract
            # computation it carries; files stay >= 16 MB whenever the
            # wave has >= 2 min-files of data, and compact() bin-packs
            # later). Never repartition here — that would shuffle the
            # whole data plane.
            _w_plan, _est_art = write_plan("articles", n_frontier)
            # mid-size-wave floor (ADVICE r6): a sub-2-min-file estimate
            # used to coalesce to _w_plan (often 1), collapsing the
            # whole extract computation this write CARRIES onto one
            # core — the upstream-serialization hazard the narrowed()
            # comment warns about. Keep >= half the cores once the
            # estimated delta implies enough pages that single-core
            # extraction would dominate (above ~_FUSED_FLOOR_BYTES);
            # compact() bin-packs the resulting small files. GENUINELY
            # tiny waves (KB deltas — golden/test crawls) keep the
            # 1-file clamp, where multi-file task scheduling costs more
            # than it saves (the r5 inverse-scaling residue).
            if _est_art >= 2 * _MIN_FILE_BYTES:
                _w_art = _cores
            elif _est_art >= _FUSED_FLOOR_BYTES:
                _w_art = max(_w_plan, _cores // 2)
            else:
                _w_art = _w_plan
            timed_write("articles", articles.coalesce(_w_art), "append")
            tick("extract+articles(fused)")
            if _nd_cached is not None:
                # flag-mode gate: bands + flag decisions materialize
                # ONCE off the now-filled extract cache, before the
                # write pool races them (drop mode took the pre-fuse
                # path above instead)
                _nd_cached.count()
                tick("dedup_gate(bands materialize)")
                nd_flags.count()
                tick("dedup_gate(flags materialize)")
            n_extracted = extracted.count()  # cache is filled: cheap

        with ThreadPoolExecutor(max_workers=8) as pool:
            # row estimates: append tables are bounded by this wave's
            # extract output; overwrite tables by their own previous size
            # (manifest stats rows). write_width turns each into a file
            # count via the table's observed bytes/row.
            f_frontier = pool.submit(
                timed_write,
                "frontier",
                write_narrowed(
                    "frontier",
                    new_frontier,
                    catalog.table_stats("frontier").get("rows", 0)
                    or n_extracted,
                ),
                "overwrite",
            )
            f_seen = pool.submit(
                timed_write,
                "seen",
                write_narrowed("seen", seen_delta, n_extracted),
                "append",
            )
            f_articles = (
                pool.submit(
                    timed_write,
                    "articles",
                    write_narrowed("articles", articles, n_extracted),
                    "append",
                )
                if not _fused_articles
                else None
            )
            f_stats = pool.submit(timed_job, "stats", compute_stats)
            f_dims = pool.submit(timed_job, "dims", compute_dims)
            f_webhook = (
                pool.submit(
                    timed_write,
                    "webhook_payloads",
                    write_narrowed(
                        "webhook_payloads",
                        webhook.signed_payloads(articles, webhook_key),
                        n_extracted,
                    ),
                    "append",
                )
                if webhook_key is not None
                else None
            )
            if scheduler == "scaled":
                # recency update: hosts fetched this wave get the wave's
                # logical clock (epoch + wave_index + 1 seconds —
                # deterministic, monotone). greatest() keeps any newer
                # caller-seeded timestamp; budgets/scores carry over.
                # Derived from the FETCHED set (extracted), not the
                # yielded filter: a host whose pages were all too short
                # was still hit this wave and must lose recency priority
                # (the politeness signal the idle key encodes).
                fetched_hosts = (
                    politeness.with_host(extracted.select("url"))
                    .select("host")
                    .distinct()
                    .withColumn(
                        "_fetched_ts",
                        F.lit(wave_index + 1).cast("timestamp"),
                    )
                )
                new_state = (
                    host_state.join(fetched_hosts, "host", "full")
                    .select(
                        "host",
                        "budget",
                        "news_score",
                        F.greatest("last_fetch_ts", "_fetched_ts").alias(
                            "last_fetch_ts"
                        ),
                    )
                )
                f_hosts = pool.submit(
                    timed_write,
                    "host_state",
                    write_narrowed(
                        "host_state",
                        new_state,
                        catalog.table_stats("host_state").get("rows", 0)
                        or n_extracted,
                    ),
                    "overwrite",
                )
            else:
                f_hosts = None
            f_media = (
                pool.submit(
                    timed_write,
                    "media_features",
                    multimodal.page_media_features(fetched, media_max_side)
                    .withColumn("wave_id", F.lit(wid))
                    .transform(
                        lambda d: write_narrowed(
                            "media_features", d, n_extracted
                        )
                    ),
                    "append",
                )
                if media_sink
                else None
            )
            f_nd_flags = (
                pool.submit(
                    timed_write,
                    "near_dup_flags",
                    narrowed(nd_flags, 2),
                    "append",
                )
                if nd_flags is not None
                else None
            )
            f_q_flags = (
                pool.submit(
                    timed_write, "quality_flags", narrowed(q_flags, 2), "append"
                )
                if q_flags is not None
                else None
            )
            f_nd_bands = (
                pool.submit(
                    timed_write,
                    "minhash_bands",
                    nd_kept_bands.select("url", "band", "key")
                    .withColumn("wave_id", F.lit(wid))
                    .transform(
                        lambda d: write_narrowed(
                            "minhash_bands",
                            d,
                            n_extracted
                            * (dedupgate.N_BANDS if dedup_gate else 1),
                        )
                    ),
                    "append",
                )
                if nd_kept_bands is not None
                else None
            )
            # deletable tier: ONE job builds both accelerator artifacts
            # for this wave's delta — the cuckoo blob (serves the spill
            # window now) and the bloom bitmap (the precomputed fold
            # input for when this wave LEAVES the window — the fold is
            # then a driver-side OR, zero Spark jobs, zero re-reads)
            f_accel = (
                pool.submit(
                    timed_job,
                    "accel_build",
                    lambda: seenset.build_accel_rows(seen_delta).collect(),
                )
                if use_bloom
                else None
            )
            n_frontier_next = f_frontier.result()
            f_seen.result()
            if f_articles is not None:
                f_articles.result()
            stat_rows = f_stats.result()
            dim_rows = f_dims.result()
            if f_webhook is not None:
                f_webhook.result()
            if f_hosts is not None:
                f_hosts.result()
            if f_media is not None:
                f_media.result()
            if f_nd_flags is not None:
                f_nd_flags.result()
            if f_nd_bands is not None:
                f_nd_bands.result()
            if f_q_flags is not None:
                f_q_flags.result()
            accel_rows = f_accel.result() if f_accel is not None else None
        if _nd_cached is not None:
            _nd_cached.unpersist()
            _nd_flags_cached.unpersist()
        tick("parallel writes+stats")

        n_yielded = sum(r.n for r in stat_rows)
        n_skipped = sum(r.n_skip for r in stat_rows)
        n_children = int(sum(r.n_out for r in stat_rows))
        n_articles = n_yielded - n_skipped
        dist = [
            {
                "source": r.source,
                "count": r.n,
                "percentage": round(100.0 * r.n / n_yielded, 2) if n_yielded else 0.0,
            }
            for r in sorted(
                (r for r in stat_rows if r.n), key=lambda r: (-r.n, r.first_seen)
            )
        ]

        def dim_dist(kind: str) -> str:
            # percentage of total classified (= n_articles), count-desc
            # with first-seen tie-break — classifier.py:295-307
            rows = [r for r in dim_rows if r.kind == kind]
            return json.dumps(
                [
                    {
                        "label": r.label,
                        "count": r.n,
                        "percentage": round(100.0 * r.n / n_articles, 2)
                        if n_articles
                        else 0.0,
                    }
                    for r in sorted(rows, key=lambda r: (-r.n, r.first_seen))
                ]
            )

        metrics = {
            "wave_id": wid,
            "n_frontier": n_frontier,
            "n_candidates": _n_candidates(),
            "n_yielded": n_yielded,
            "n_skipped": n_skipped,
            "n_articles": n_articles,
            "n_carry": n_frontier_next - n_children,
            "n_new_outlinks": n_children,
            "source_distribution": json.dumps(dist),
            "topic_distribution": dim_dist("topic"),
            "sentiment_distribution": dim_dist("sentiment"),
        }
        if extra_metrics:
            # caller-supplied idempotence markers (e.g. the streaming
            # epoch id) ride the snapshot's metrics dict — committed
            # atomically with the wave, snapshot-only (the wave_metrics
            # TABLE keeps its fixed schema below)
            metrics.update(extra_metrics)
        # driver-resident tables (1 metrics row, K bloom shards) write
        # via pyarrow directly — each Spark job here costs ~0.3-0.5 s of
        # the wave's SERIAL tail for a KB-scale payload
        commit.write_rows(
            "wave_metrics",
            [tuple(metrics[f.name] for f in WAVE_METRICS.fields)],
            WAVE_METRICS,
            mode="append",
        )

        if use_bloom:
            leaving = wave_index - SPILL_WAVES
            fold_rows = [r for r in spill_rows if r.wave_index <= leaving]
            if fold_rows:
                merged = seenset.BloomShardSet.from_rows(
                    [(r.shard, r.bloom_bitmap, r.n_items) for r in fold_rows]
                )
                if bloom is not None:
                    merged.merge(bloom)
                commit.write_rows(
                    "bloom_shards", merged.to_rows(), BLOOM_SHARDS, mode="overwrite"
                )
            # spill window: prior recent-wave rows still inside the
            # window + this wave's rows (the leaving wave's rows drop —
            # their coverage just moved into the bloom)
            new_spill = [
                (r.wave_index, r.shard, bytes(r.bitmap), bytes(r.bloom_bitmap), r.n_items)
                for r in spill_rows
                if r.wave_index > leaving
            ] + [
                (wave_index, r.shard, bytes(r.cuckoo), bytes(r.bloom), r.n_items)
                for r in accel_rows
            ]
            commit.write_rows(
                "cuckoo_spill", new_spill, CUCKOO_SPILL, mode="overwrite"
            )

        tick("bloom_merge+metrics")
        commit.commit(wave_id=wid, wave_index=wave_index, metrics=metrics)
        tick("commit")
        return metrics
    finally:
        extracted.unpersist()
        kept.unpersist()
        cands.unpersist()
        if cand_table is not None:
            spark.sql(f"DROP TABLE IF EXISTS {cand_table}")


def run_crawl(
    spark: SparkSession,
    catalog: ManifestParquetCatalog,
    cfg: synth.SynthConfig,
    n_waves: int | None = None,
    pages: DataFrame | None = None,
    budget: int | None = None,
    robots: DataFrame | None = None,
    use_bloom: bool = True,
    webhook_key: bytes | None = None,
    scheduler: str = "reference",
    host_state_seed: DataFrame | None = None,
    pages_table: str | None = None,
    fetch_buckets: int = 32,
    enrich_fn=None,
    media_sink: bool = False,
    dedup_gate: str | None = None,
    min_quality: float | None = None,
) -> list[dict]:
    """Run (or resume) a crawl. Already-committed waves are skipped —
    replaying is a no-op, which is the resume/idempotence guarantee."""
    n_waves = n_waves if n_waves is not None else cfg.n_waves
    if pages is None and pages_table is None:
        pages = synth.build_pages_df(spark, cfg)
    if catalog.current_snapshot() is None:
        init_crawl(
            spark, catalog, synth.build_seeds_df(spark, cfg), host_state_seed
        )
    out = []
    for w in range(catalog.last_wave_index() + 1, n_waves):
        out.append(
            run_wave(
                spark,
                catalog,
                pages,
                w,
                min_text_chars=cfg.min_text_chars,
                budget=budget,
                robots=robots,
                use_bloom=use_bloom,
                webhook_key=webhook_key,
                scheduler=scheduler,
                pages_table=pages_table,
                fetch_buckets=fetch_buckets,
                enrich_fn=enrich_fn,
                media_sink=media_sink,
                dedup_gate=dedup_gate,
                min_quality=min_quality,
            )
        )
    return out


def read_near_dup_flags(
    spark: SparkSession, catalog: ManifestParquetCatalog
) -> DataFrame:
    return catalog.read(spark, "near_dup_flags", NEAR_DUP_FLAGS)


def read_quality_flags(
    spark: SparkSession, catalog: ManifestParquetCatalog
) -> DataFrame:
    from .schema import QUALITY_FLAGS

    return catalog.read(spark, "quality_flags", QUALITY_FLAGS)


def read_articles(spark: SparkSession, catalog: ManifestParquetCatalog) -> DataFrame:
    return catalog.read(spark, "articles", ARTICLES)


def read_seen(spark: SparkSession, catalog: ManifestParquetCatalog) -> DataFrame:
    return catalog.read(spark, "seen", SEEN)


def read_media(spark: SparkSession, catalog: ManifestParquetCatalog) -> DataFrame:
    return catalog.read(spark, "media_features", MEDIA_FEATURES)


def crawl_order(spark: SparkSession, catalog: ManifestParquetCatalog) -> list[tuple[str, str]]:
    """(wave_id, url) global crawl sequence, reconstructed from the
    persisted per-yield sort keys — the fixture the oracle's
    ``WaveResult.crawl_order`` is diffed against."""
    seen = read_seen(spark, catalog)
    return [
        (r.processed_wave, r.url)
        for r in seen.orderBy("processed_wave", "sort_key").collect()
    ]
