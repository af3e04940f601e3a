"""Shortened CI version of the serving soak (tools/serve_soak.py).

Event-level serving behavior is covered in tests/test_serve.py; this
adds the time axis — a closed-loop multi-client TCP load sustained long
enough that fd leaks, queue growth, or per-chunk latency drift would
show, with the same pass criteria as the full 10-minute chip soak
recorded in BENCH_NOTES.md.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))


@pytest.mark.slow
def test_serve_soak_short():
    from serve_soak import run_soak

    import json

    out = run_soak(minutes=0.75, streams=6, seconds=1.0, tiny=True,
                   sample_every_s=2.0, verbose=False)
    json.dumps(out)   # the report must be JSON-clean (no numpy scalars)
    assert not out["errors"], out["errors"]
    assert out["completions"] > 0
    assert out["fd_growth"] <= 4, out
    assert out["rss_growth_mib"] < 64.0, out
    assert out["chunk_latency_drift"] < 1.5, out
    assert out["pending_final"] <= 6
    assert out["ok"], out
