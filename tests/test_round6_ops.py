"""Property and crafted-fixture tests for the round-6 late-add
operators, beyond the shared oracle comparison of test_queries_oracle
(which already pins Spark == DuckDB row-for-row): these pin the
OPERATOR SEMANTICS themselves — sketch guarantees, rule firing,
bounds — on the DuckDB side, where a run costs milliseconds.  The
Spark side is covered by the oracle equality, so a semantic property
proven here holds for both engines.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from newscrawl import queries as q

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    return con


# --- HLL ------------------------------------------------------------------


def _rho_spec(text: str) -> tuple[int, int]:
    """Pure-Python spec of the register derivation: (bucket, rho) from
    md5(text) — bucket = first nibble, rho = 1 + leading-zero count of
    the next 60 bits (the bit-twiddling ground truth the SQL's
    hex-string arithmetic must reproduce)."""
    h = hashlib.md5(text.encode()).hexdigest()
    bucket = int(h[0], 16)
    bits60 = int(h[1:16], 16)
    if bits60 == 0:
        return bucket, 61
    # position of the highest set bit within the 60-bit field
    rho = 60 - bits60.bit_length() + 1
    return bucket, rho


def test_hll_register_derivation_matches_python_spec(duck):
    """The SQL's hex-string leading-zero walk == integer bit-scan, for
    every document in the corpus (incl. whatever rho extremes it has)."""
    rows = duck.execute(
        """
        SELECT text,
               CAST(CAST('0x' || substr(md5(text), 1, 1) AS BIGINT) AS INT),
               CASE WHEN nz = 15 THEN 61
                    ELSE nz * 4
                         + (CASE WHEN nib >= 8 THEN 0 WHEN nib >= 4 THEN 1
                                 WHEN nib >= 2 THEN 2 ELSE 3 END) + 1 END
        FROM (
          SELECT text, nz,
                 CAST(CAST('0x' || substr(md5(text), 2 + nz, 1) AS BIGINT)
                      AS INT) AS nib
          FROM (
            SELECT text,
                   length(regexp_extract(substr(md5(text), 2, 15),
                                         '^(0*)', 1)) AS nz
            FROM documents
          ) a
        ) b
        """
    ).fetchall()
    assert len(rows) > 0
    for text, bucket, rho in rows:
        assert (bucket, rho) == _rho_spec(text), text[:40]


def test_hll_estimates_bracket_exact(duck):
    """m=16 HLL has ~26% standard error; every per-source estimate must
    land within a generous 3-sigma band of the exact count, and the
    estimates must actually vary across sources (not one collapsed
    value)."""
    rows = duck.execute(
        f"SELECT n_exact, hll_est FROM ({q.SQL_HLL_DISTINCT})"
    ).fetchall()
    assert len(rows) >= 10
    assert len({est for _, est in rows}) > 3
    for exact, est in rows:
        assert 0.2 * exact <= est <= 5 * exact, (exact, est)


# --- CMS ------------------------------------------------------------------


def test_cms_never_underestimates(duck):
    """The count-min guarantee: est >= exact for EVERY term (min over
    rows of sums that each include the term's own count), and at least
    one term must collide (overest > 0) at w=32 on a 31-term vocab —
    otherwise the sketch degenerated into an exact counter and the
    test corpus proves nothing."""
    rows = duck.execute(
        f"SELECT n_exact, cms_est, overest FROM ({q.SQL_CMS_HEAVY_HITTERS})"
    ).fetchall()
    assert len(rows) == 15
    assert all(est >= exact for exact, est, _ in rows)
    assert all(over == est - exact for exact, est, over in rows)
    assert any(over > 0 for *_, over in rows)


# --- PII ------------------------------------------------------------------


def test_pii_rules_fire_and_redaction_is_complete(duck):
    """Every pattern class fires on its doc_id residue class, and the
    redacted text contains no residual match of any pattern (the
    chained regexp_replace is complete, not first-match)."""
    agg = duck.execute(
        f"""
        SELECT sum(CASE WHEN n_email > 0 THEN 1 ELSE 0 END),
               sum(CASE WHEN n_ip > 0 THEN 1 ELSE 0 END),
               sum(CASE WHEN n_phone > 0 THEN 1 ELSE 0 END),
               count(*)
        FROM ({q.SQL_PII_REDACT})
        """
    ).fetchone()
    n_email, n_ip, n_phone, n = agg
    assert n_email > 0 and n_ip > 0 and n_phone > 0
    assert n_email < n and n_ip < n and n_phone < n
    # re-run the detector over the REDACTED text: zero residual matches
    residual = duck.execute(
        f"""
        SELECT sum(len(regexp_extract_all(r, '{q.PII_EMAIL_RE}'))
                 + len(regexp_extract_all(r, '{q.PII_IP_RE}'))
                 + len(regexp_extract_all(r, '{q.PII_PHONE_RE}')))
        FROM (
          SELECT regexp_replace(regexp_replace(regexp_replace(
                   text || ' contact user7@mail.example.com now'
                        || ' from host 10.1.0.2 logged'
                        || ' call +1-555-123-0199',
                   '{q.PII_EMAIL_RE}', '<EMAIL>', 'g'),
                   '{q.PII_IP_RE}', '<IP>', 'g'),
                   '{q.PII_PHONE_RE}', '<PHONE>', 'g') AS r
          FROM documents
        )
        """
    ).fetchone()[0]
    assert residual == 0


# --- C4 line filter -------------------------------------------------------


def test_c4_every_rule_fires(duck):
    """Each drop rule (short line, no terminal punct, boilerplate) and
    both doc verdicts occur on the corpus — a gate that never fires is
    untested code wearing a test's name."""
    row = duck.execute(
        f"""
        SELECT sum(n_short), sum(n_nopunct), sum(n_boiler),
               sum(CASE WHEN doc_keep THEN 1 ELSE 0 END), count(*)
        FROM ({q.SQL_C4_LINE_FILTER})
        """
    ).fetchone()
    n_short, n_nopunct, n_boiler, n_keep, n = row
    assert n_short > 0 and n_nopunct > 0 and n_boiler > 0
    assert 0 < n_keep < n


def test_c4_counts_are_consistent(duck):
    """n_kept + every drop reason == n_lines for each doc (the audit
    trail partitions the line set; nothing double-counted or lost)."""
    bad = duck.execute(
        f"""
        SELECT count(*) FROM ({q.SQL_C4_LINE_FILTER})
        WHERE n_kept + n_short + n_nopunct + n_boiler <> n_lines
        """
    ).fetchone()[0]
    assert bad == 0


# --- blocklist ------------------------------------------------------------


def test_blocklist_ratio_bounds_and_threshold(duck):
    rows = duck.execute(
        f"SELECT n_tokens, n_flagged, flag_ratio, keep "
        f"FROM ({q.SQL_BLOCKLIST_FILTER})"
    ).fetchall()
    assert any(k for *_, k in rows) and any(not k for *_, k in rows)
    for nt, nf, r, keep in rows:
        assert 0 <= nf <= nt
        assert 0.0 <= r <= 1.0
        assert keep == (r <= q.BLOCKLIST_MAX_RATIO)


# --- logreg ---------------------------------------------------------------


def test_logreg_confusion_nondegenerate_and_learned(duck):
    """The trained model must beat the majority-class baseline and
    produce a full 4-cell confusion (a model predicting one class for
    everything was the pre-tuning failure mode)."""
    rows = duck.execute(
        f"SELECT y, pred, n FROM ({q.SQL_LOGREG_QUALITY})"
    ).fetchall()
    cells = {(y, p): n for y, p, n in rows}
    assert len(cells) == 4, cells
    total = sum(cells.values())
    correct = cells.get((0, 0), 0) + cells.get((1, 1), 0)
    majority = max(
        cells.get((0, 0), 0) + cells.get((0, 1), 0),
        cells.get((1, 0), 0) + cells.get((1, 1), 0),
    )
    assert correct / total > majority / total + 0.05


def test_logreg_gradient_quantization_is_exact_integers(duck):
    """The determinism mechanism itself: per-row gradient contributions
    are integral after floor-quantization, so their sum is exact at any
    aggregation order — spec-checked by comparing a float sum of the
    floored values against the BIGINT sum."""
    a, b = duck.execute(
        """
        SELECT CAST(sum(CAST(floor((0.5 - y) * 1000000.0) AS BIGINT))
                    AS BIGINT),
               CAST(sum(floor((0.5 - y) * 1000000.0)) AS BIGINT)
        FROM (SELECT CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS y
              FROM documents)
        """
    ).fetchone()
    assert a == b


# --- containment ----------------------------------------------------------


def test_containment_bounds(duck):
    """Per pair: jaccard <= min(cont_a, cont_b) (set algebra), all three
    in [0, 1], and the flag is exactly the threshold predicate; both
    flag values occur."""
    rows = duck.execute(
        f"SELECT jaccard, cont_a, cont_b, contained "
        f"FROM ({q.SQL_SHINGLE_CONTAINMENT})"
    ).fetchall()
    assert any(c for *_, c in rows) and any(not c for *_, c in rows)
    for j, ca, cb, contained in rows:
        assert 0.0 <= j <= 1.0 and 0.0 <= ca <= 1.0 and 0.0 <= cb <= 1.0
        # rounding at 4 decimals can nudge either side by <= 1e-4
        assert j <= min(ca, cb) + 2e-4
        assert contained == (max(ca, cb) >= q.SHINGLE_CONTAINMENT_THRESHOLD - 2e-4) or (
            abs(max(ca, cb) - q.SHINGLE_CONTAINMENT_THRESHOLD) < 2e-4
        )


# --- PPS sampling ---------------------------------------------------------


def test_pps_sample_exact_k_per_stratum(duck):
    """The whole point vs expected-size resampling: sum(copies) == k
    EXACTLY in every language stratum, and a doc's copies are bounded
    by its weight share (a doc spanning c grid strides can take at most
    ceil(w * k / W) + 1 hits)."""
    rows = duck.execute(
        f"SELECT lang, CAST(sum(copies) AS BIGINT) "
        f"FROM ({q.SQL_PPS_SAMPLE}) GROUP BY lang"
    ).fetchall()
    assert len(rows) >= 3
    assert all(total == q.PPS_K for _, total in rows)


def test_pps_sample_is_weight_monotone_under_reorder(duck):
    """Determinism mechanism: the sample depends only on (lang, doc_id
    order, weights) — recomputing over a shuffled-row view yields the
    identical (doc_id, copies) set, because the cumulative line is
    ordered BY doc_id, not by input order."""
    con2 = duckdb.connect()
    con2.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet') ORDER BY md5(CAST(doc_id AS VARCHAR))"
    )
    a = sorted(duck.execute(q.SQL_PPS_SAMPLE).fetchall())
    b = sorted(con2.execute(q.SQL_PPS_SAMPLE).fetchall())
    assert a == b
