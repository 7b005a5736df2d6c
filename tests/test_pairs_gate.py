"""Measured pairs/per-query dispatch gate (ops/pairs_gate.py)."""

import numpy as np

from duckdb_faiss_ext_tpu.ops.pairs_gate import (MEASURED,
                                                 pairs_preferred,
                                                 pairs_speedup_estimate)


def test_estimate_reproduces_measurements():
    # At a measured point the IDW estimate is (almost exactly) the
    # measurement: the 1e-6 regulariser shares O(1e-6) weight with the
    # other rows.
    for work, nq, ratio in MEASURED:
        est, dist = pairs_speedup_estimate(work, nq)
        assert dist == 0.0
        assert abs(est - ratio) / ratio < 0.05


def test_gate_decides_inside_hull():
    # The marco shape (pairs measured winning) gates on; the validator
    # shape (pairs measured losing) gates off.
    win = max(MEASURED, key=lambda r: r[2])
    lose = min(MEASURED, key=lambda r: r[2])
    if win[2] >= 1.05:
        assert pairs_preferred(win[0], win[1])
    if lose[2] < 1.0:
        assert not pairs_preferred(lose[0], lose[1])


def test_static_rule_outside_hull():
    # Far outside the measured hull the caller's static rule decides.
    far = max(w for w, _, _ in MEASURED) * 1024
    assert pairs_preferred(far, 1 << 20, static_ok=True)
    assert not pairs_preferred(far, 1 << 20, static_ok=False)


def test_floors_bind():
    assert not pairs_preferred(1 << 30, 8)        # nq floor
    assert not pairs_preferred(1 << 10, 4096)     # work floor


def test_interpolation_monotone_between_points():
    # Between a losing small shape and a winning big shape the estimate
    # grows with work (log-space IDW of two points is monotone on the
    # segment between them).
    lo = min(MEASURED, key=lambda r: r[0])
    hi = max(MEASURED, key=lambda r: r[0])
    works = np.geomspace(lo[0], hi[0], 8).astype(int)
    ests = [pairs_speedup_estimate(int(w), hi[1])[0] for w in works]
    assert ests[-1] >= ests[0]
