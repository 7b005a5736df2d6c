"""Measured pairs/per-query dispatch gate (ops/pairs_gate.py)."""

import numpy as np

from duckdb_faiss_ext_tpu.ops.pairs_gate import (MEASURED,
                                                 pairs_preferred,
                                                 pairs_speedup_estimate)


def test_estimate_reproduces_measurements():
    # At a measured point the IDW estimate is (almost exactly) the
    # measurement: the 1e-6 regulariser shares O(1e-6) weight with the
    # other rows.
    for work, nq, d, ratio in MEASURED:
        est, dist = pairs_speedup_estimate(work, nq, d)
        assert dist == 0.0
        assert abs(est - ratio) / ratio < 0.05


def test_gate_decides_inside_hull():
    # The marco shape (pairs measured winning) gates on; the validator
    # shape (pairs measured losing) gates off.
    win = max(MEASURED, key=lambda r: r[3])
    lose = min(MEASURED, key=lambda r: r[3])
    if win[3] >= 1.05:
        assert pairs_preferred(win[0], win[1], win[2])
    if lose[3] < 1.0:
        assert not pairs_preferred(lose[0], lose[1], lose[2])


def test_static_rule_outside_hull():
    # Far outside the measured hull the caller's static rule decides.
    far = max(w for w, _, _, _ in MEASURED) * 1024
    assert pairs_preferred(far, 1 << 20, static_ok=True)
    assert not pairs_preferred(far, 1 << 20, static_ok=False)


def test_floors_bind():
    assert not pairs_preferred(1 << 30, 8)        # nq floor
    assert not pairs_preferred(1 << 10, 4096)     # work floor


def test_measured_surface_shape():
    # The measured surface's two anchors: at the marco serving shape
    # (big work, big batch) pairs win decisively; at the smallest work
    # the paths are a wash — the gate must reflect both.
    est_marco, d1 = pairs_speedup_estimate(2048 * 1536, 1024, 1536)
    est_small, d2 = pairs_speedup_estimate(512 * 128, 1024, 128)
    assert d1 < 0.5 and d2 < 0.5          # inside the measured hull
    assert est_marco > 1.5
    assert est_small < 1.1
