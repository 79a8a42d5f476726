"""Focused test for the round-7 label-propagation rewrite.

q_near_dup_clusters' convergence check now rides the checkpoint job as
an Observation over ``label != old_label`` instead of a separate
join+count job per round.  This pins the multi-round behavior the sf
corpora barely exercise: a CHAIN of near-duplicates (A~B, B~C, C~D,
with A and D sharing nothing) whose min-label must propagate across
the chain over several rounds before the loop may stop.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from newscrawl.queries import q_minhash_lsh_candidates, q_near_dup_clusters

BASE = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lamda mu nu xi omicron pi rho sigma tau upsilon"
)


def _chain_docs(spark, n=5, overlap=12):
    """Doc i shares a long token run with doc i+1 only (sliding window
    over a long distinct-token street), so LSH links form a path."""
    street = " ".join(f"w{j:03d}" for j in range(200))
    toks = street.split()
    step = overlap  # consecutive docs overlap by (window - step) tokens
    window = 3 * overlap
    rows = []
    for i in range(n):
        seg = toks[i * step : i * step + window]
        rows.append((i + 1, " ".join(seg)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chain_requires_multiple_rounds_and_converges(spark):
    docs = _chain_docs(spark)
    pairs = q_minhash_lsh_candidates(spark, "/nonexistent", docs=docs)
    edge_set = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    # the fixture only means something if LSH actually built a path of
    # length >= 3 (min-label then needs >= 2 propagation rounds)
    assert (1, 2) in edge_set and (2, 3) in edge_set, edge_set
    assert (1, 4) not in edge_set and (1, 5) not in edge_set, edge_set

    out = {
        r.doc_id: (r.cluster, r.is_canonical)
        for r in q_near_dup_clusters(
            spark, "/nonexistent", docs=docs
        ).collect()
    }
    linked = {a for e in edge_set for a in e}
    # every chained doc labels to the chain minimum, exactly one canonical
    assert set(out) == linked
    assert all(c == min(linked) for c, _ in out.values())
    assert [d for d, (_c, canon) in out.items() if canon] == [min(linked)]
