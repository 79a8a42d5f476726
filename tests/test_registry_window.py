"""Registry-order contract: the driver's correctness gate checks exactly the
first 50 entries of ``__spark_entry__.queries()`` in dict insertion order
(observed rounds 1-3).  Any query that has never received a green driver row
— plus anything new this round — must therefore sit inside that window.

This test pins the contract so a future append can't silently push an
unverified query past the cap again (VERDICT.md round 3, "What's wrong" #1).
"""

import __spark_entry__ as entrymod

DRIVER_WINDOW = 50

# Never driver-verified as of CORRECTNESS_r03 (VERDICT.md) — every one of
# these must be inside the driver's window until it has a green row.
TIER_A = [
    "crawl_wave_articles",
    "knn_recall",
    "near_dup_clusters",
    "windowed_counts",
    "asof_join",
    "minhash_jaccard_est",
    "pagerank_sources",
    "decontaminate",
    "repetition_filter",
    "embedding_quantize",
    "knn_quantized",
    "knn_ivf_multiprobe",
]

# Queries first registered in round 4 — also unverified until r04 runs.
TIER_A_R4 = [
    "knn_recall_multiprobe",
    "decontaminate_table",
    "doc_fingerprint",
    "minhash_dedup_keep",
    "quality_prune_pipeline",
    "domain_diversity",
    "ccnet_perplexity_buckets",
    "exact_subseq_dedup",
    "semantic_dedup",
    "dsir_importance",
    "zipf_fit",
    "pq_quantize",
    "knn_pq",
    "sequence_pack",
    "mix_resample",
    "rollup_counts",
    "interval_join",
    "bpe_train",
    "bigram_lm_perplexity",
    "corpus_prepare",
]


def test_tier_a_inside_driver_window():
    names = list(entrymod.queries().keys())
    window = set(names[:DRIVER_WINDOW])
    missing = [n for n in TIER_A + TIER_A_R4 if n in names and n not in window]
    assert not missing, (
        f"driver-unverified queries outside the first {DRIVER_WINDOW} "
        f"registry entries: {missing}"
    )


def test_crawl_wave_articles_is_first():
    assert next(iter(entrymod.queries())) == "crawl_wave_articles"


def test_oracle_coverage_matches_registry():
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    # every oracle key refers to a registered query
    assert set(sqls) <= set(qs)
    # the only rows-check-only entry is the composite engine row
    assert set(qs) - set(sqls) == {"crawl_wave_articles"}
