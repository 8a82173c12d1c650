"""Off-gate scale rehearsal wrapper (VERDICT r4 item 5): drives
tools/scale_rehearsal.py — the three bench-dominating similarity
pipelines at 1x and 10x the sf0.1 documents corpus — in its own JVM
(6g driver; the 10x checkpoint blocks + AQE broadcast builds don't
fit the default 1g test heap) and asserts near-linear growth plus
exact 10x pair replication.

Skipped in the default suite (needs ~3-5 min of quiet machine):

    SCALE_REHEARSAL=1 python -m pytest tests/test_scale_rehearsal.py -q

Last recorded ratios: SCALE_REHEARSAL_r05.json.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.skipif(
    not os.environ.get("SCALE_REHEARSAL"),
    reason="off-gate scale rehearsal; set SCALE_REHEARSAL=1")

#: generous bound for 10x data (ideal linear = 10x) — headroom for
#: fixed per-job overhead and shared-machine noise, far below the
#: >=100x a quadratic stage would show.
MAX_GROWTH = 12.0


def test_similarity_pipelines_scale_linearly():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "scale_rehearsal.py")],
        capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    p = out["pipelines"]
    for name, r in p.items():
        assert r["growth"] <= MAX_GROWTH, (name, r)
    # structure replication: exact for set-overlap pipelines...
    jc = p["ngram_jaccard"]
    assert jc["pairs_10x"] == 10 * jc["pairs_1x"], jc
    mh = p["minhash_lsh"]  # + rare extra band-hash collisions
    assert 10 * mh["pairs_1x"] <= mh["pairs_10x"] \
        <= int(10 * mh["pairs_1x"] * 1.01) + 10, mh
    # ...order-of-magnitude for simhash (hash-sensitive borderline
    # pairs re-tokenized per replica — see tools/scale_rehearsal.py)
    sh = p["simhash_dup"]
    assert 3 * sh["pairs_1x"] <= sh["pairs_10x"] <= 30 * sh["pairs_1x"], sh


def test_100x_curve_subquadratic():
    """tools/scale_rehearsal_100x.py: minhash at 100x data must stay
    far under quadratic (linear = 100x; a quadratic stage would show
    >= 1000x), and the Catalyst TPC-H path near-linear at 10x. The
    corpus queries are measured verbatim via cache-injected
    replicated frames."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable,
         os.path.join(root, "tools", "scale_rehearsal_100x.py")],
        capture_output=True, text=True, timeout=1800)
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    mh = out["pipelines"]["minhash_lsh"]
    assert mh["growth_100x"] <= 120.0, mh
    assert 100 * mh["pairs_1x"] <= mh["pairs_100x"] \
        <= int(100 * mh["pairs_1x"] * 1.02) + 100, mh
    for q in ("tpch_q1", "tpch_q3"):
        assert out["pipelines"][q]["growth_10x"] <= 12.0, out["pipelines"][q]
