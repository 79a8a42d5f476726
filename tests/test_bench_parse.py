"""bench.py timing-parser unit tests (pure Python, no Spark)."""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from bench import parse_wave_timing

WARMUP = """[w0000] dedup+count: 9.05s
[w0000] extract(materialize): 2.62s
[w0000] write:articles: 0.33s rows=120 bytes=94961
[w0000] parallel writes+stats: 0.60s
[w0000] commit: 0.00s
"""
REP = """[w0000] dedup+count: 1.45s
[w0000] bloom_load: 0.10s
[w0000] extract(materialize): 124.13s
[w0000] write:articles: 22.79s rows=580098 bytes=1276097063
[w0000] job:accel_build: 2.68s
[w0000] parallel writes+stats: 22.81s
[w0000] bloom_merge+metrics: 0.02s
[w0000] commit: 0.00s
"""
REP2 = REP.replace("124.13", "150.00").replace("22.79", "30.00")


def test_warmup_block_dropped_positionally():
    """A warmup slowed by disk interference must never be selected as
    the rep decomposition (magnitude heuristics misfire on it)."""
    best = parse_wave_timing(WARMUP + REP + REP2)
    assert best["extract(materialize)"] == 124.13  # the fastest REAL rep
    assert best["writes"]["articles"]["bytes"] == 1276097063
    assert best["data_plane_sec"] == 124.13
    # residue = everything else (incl. the pool phase with its space label)
    assert abs(best["residue_sec"] - (1.45 + 0.10 + 22.81 + 0.02)) < 0.01


def test_single_block_kept():
    assert parse_wave_timing(REP)["extract(materialize)"] == 124.13


def test_no_blocks():
    assert parse_wave_timing("noise\n") is None
