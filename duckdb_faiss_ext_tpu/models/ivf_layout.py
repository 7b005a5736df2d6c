"""IVF storage layouts and device builds (split from models/ivf.py).

Everything that turns the host-side (codes/xb, ids, assign) state into the
device layouts the scans consume: the Pallas padded-list plan (full /
spill-capped), the sorted+gather layout, selector masks aligned with each
layout, and the per-version device caches.  Methods attach to IVFIndex;
models/ivf.py holds the index lifecycle, models/ivf_serve.py the dispatch.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from .. import errors
from ..ops.pallas_ivf import choose_lmax
from ..utils.config import (config, next_capacity, next_pow2, on_tpu,
                            pad_rows)
from .ivf import IVFIndex

def _sq_codes_dev(self):
    """Device upload of the sorted uint8 SQ codes for the decode path,
    cached per version (the int8 path never touches it)."""
    cached = getattr(self, "_sq_dev_cache", None)
    if cached is not None and cached[0] == self._version:
        return cached[1]
    storage, _, _, _ = self._build_device()
    dev = jnp.asarray(storage[0])
    self._sq_dev_cache = (self._version, dev)
    return dev

def _ivf_sq_row_extras(self):
    """Per-sorted-row (Σ(scale·c)², Σc) fp32 (cap,) pair for the int8 IVF
    scan (ops/ivf_scan.py::ivf_sq_int8_search), which reads the SAME
    packed device code buffer as the decode path — this is its only extra
    state.  Cached per version, aligned with _build_device's order."""
    cached = getattr(self, "_int8_cache", None)
    if cached is not None and cached[0] == self._version:
        return cached[1]
    from ..ops.sq import sq_row_norms, sq_row_sums

    storage, _, _, order = self._build_device()
    cap = storage[0].shape[0]
    n = self._nstored
    codes = self._codes[order] if n else self._codes   # (n, w) packed
    rn = sq_row_norms(codes, self._sq_scale, self.d, self.sq_type)
    rs = sq_row_sums(codes, self.d, self.sq_type)
    state = (jnp.asarray(pad_rows(rn, cap)), jnp.asarray(pad_rows(rs, cap)))
    self._int8_cache = (self._version, state)
    return state


# --- Pallas list-scan layout (padded 3-D lists) ------------------------
#: HBM budget for the padded (nlist, lmax, d) list layout; beyond this
#: the pad-to-max waste is not worth the DMA-friendly shape and the
#: sorted+gather layout is used instead (raw-sized + an int32 table).
#: Measured at 10M×96/nlist=4096: the full padded layout is 6.4 GB
#: (pad ratio 1.68× raw) and fits v5e's 16 GB HBM with ample headroom,
#: taking b48 search from 120 qps (sorted+gather) to the DMA kernel
#: path.  2 GB (the old budget) silently forced gather at exactly the
#: scale the kernel matters.
PALLAS_LAYOUT_BUDGET_BYTES = 7 << 30

#: scalar-prefetch budget for the probe table (SMEM is 1 MB/core; leave
#: headroom for the grid scalars).
PALLAS_SMEM_PROBE_INTS = 96 * 1024

#: spill-region cap: beyond this fraction of rows overflowing the capped
#: layout, the dense spill scan would dominate and the sorted+gather
#: layout wins instead.  20% of the corpus as one dense MXU tile costs
#: about a fifth of a flat scan — still far cheaper than the gather
#: path it replaces.
SPILL_FRACTION_MAX = 0.2

def _counts(self) -> np.ndarray:
    cache = getattr(self, "_counts_cache", None)
    if cache is not None and cache[0] == self._version:
        return cache[1]
    c = (np.bincount(self._assign, minlength=self.nlist)
         if self.ntotal else np.zeros((self.nlist,), np.int64))
    self._counts_cache = (self._version, c)
    return c

def _counts_max(self) -> int:
    return int(self._counts().max()) if self.ntotal else 1

def _pallas_plan(self):
    """Layout plan for the Pallas list-scan kernel:
    None           — pallas unusable (metric/mode/memory);
    ("full", None) — padded (nlist, lmax, w) fits the HBM budget;
    ("spill", L)   — lists capped at L, overflow rows in a flat spill
                     region scanned densely and merged (bounds memory at
                     high skew while keeping the DMA kernel layout)."""
    from ..utils.config import config

    if self._dr is not None:
        # Device-resident layout (models/ivf_device.py): the padded
        # lists already live in HBM with a fixed lmax — the list-scan
        # kernel (or its interpreter off-TPU) is the only serving path.
        return ("device", self._dr.lmax)
    if self.metric.name not in ("L2", "INNER_PRODUCT"):
        return None
    if self.sq_type is not None:
        # SQ8/SQ4/SQ6 have the fused int8 DMA kernel (SQ4 scores its two
        # nibble planes in-kernel, SQ6 its four 6-bit planes from the
        # plane-major payload; + SQ-aware spill scan for capped layouts).
        # Float SQ codecs run the XLA decode+gather scan.
        from ..utils.config import sq_int8_active

        if self.sq_type not in ("sq8", "sq4", "sq6") or \
                not sq_int8_active():
            return None
    mode = config.kernel_mode
    if not (mode == "pallas" or (mode == "auto" and on_tpu())):
        return None
    cache = getattr(self, "_pallas_plan_cache", None)
    if cache is not None and cache[0] == self._version:
        return cache[1]
    if self.pq_m is not None:
        width = self.pq_m
    elif self.sq_type is not None:
        width = self._codes.shape[1]
    else:
        width = self.d * 4
    full = choose_lmax(self._counts_max())
    if self.nlist * full * width <= self.PALLAS_LAYOUT_BUDGET_BYTES:
        plan = ("full", None)
    else:
        budget_lmax = self.PALLAS_LAYOUT_BUDGET_BYTES // \
            max(self.nlist * width, 1)
        lmax = 128
        while lmax * 2 <= budget_lmax:
            lmax *= 2
        if budget_lmax < 128:
            plan = None
        else:
            counts = self._counts()
            nspill = int(np.maximum(counts - lmax, 0).sum())
            plan = (("spill", lmax)
                    if nspill <= self.SPILL_FRACTION_MAX * self._nstored
                    else None)
    self._pallas_plan_cache = (self._version, plan)
    return plan

def _use_pallas_scan(self) -> bool:
    return self._pallas_plan() is not None

def _build_list_layout(self, lmax_cap: int | None = None):
    """Host-side padded list layout: (payload (nlist, lmax, w), counts
    (nlist,), row_pos (nlist, lmax), spill) — payload is byte codes for
    PQ storage, raw fp32 rows otherwise.  Single source for the pallas
    and device-sharded layouts.

    With ``lmax_cap``, lists longer than the cap keep their first cap
    members in the padded layout; the overflow rows come back in
    ``spill`` = (payload (s, w), assign (s,), pos (s,) original-row
    positions), unpadded.  spill is None otherwise."""
    n = self._nstored
    counts = self._counts()
    if lmax_cap is None and n and \
            counts.max() > max(32 * n / self.nlist, 4096):
        import sys

        print(f"duckdb_faiss_ext_tpu: IVF list skew is extreme "
              f"(max {counts.max()} vs avg {n / self.nlist:.0f}); the "
              f"padded layout will be memory-heavy — consider retraining "
              f"(kmeans_balance) or fewer lists", file=sys.stderr)
    lmax = choose_lmax(max(1, int(counts.max()) if n else 1))
    if lmax_cap is not None:
        lmax = min(lmax, lmax_cap)
    kept = np.minimum(counts, lmax)
    row_pos = np.full((self.nlist, lmax), -1, np.int32)
    order = np.argsort(self._assign, kind="stable")
    offsets = np.concatenate([[0], np.cumsum(counts)])
    raw = self._codes if self._codes is not None else self._xb
    w = raw.shape[1] if self._codes is not None else self.d
    payload = np.zeros((self.nlist, lmax, w), raw.dtype)
    spill = None
    if n:
        # Vectorized scatter (a Python loop over nlist was the build
        # bottleneck at 16k lists): rank of each sorted row within its
        # list decides padded slot vs spill.
        sorted_assign = self._assign[order]
        ranks = np.arange(n, dtype=np.int64) - offsets[sorted_assign]
        keep = ranks < lmax
        flat = sorted_assign[keep].astype(np.int64) * lmax + ranks[keep]
        payload.reshape(-1, w)[flat] = raw[order[keep]]
        row_pos.reshape(-1)[flat] = order[keep]
        if not keep.all():
            sp = order[~keep]
            spill = (raw[sp], self._assign[sp], sp.astype(np.int32))
    return payload, kept.astype(np.int32), row_pos, spill

def _build_device_pallas(self):
    if getattr(self, "_device_pallas", None) is not None:
        return self._device_pallas
    if self._dr is not None:
        return self._dr_build_device_pallas()
    plan = self._pallas_plan()
    lmax_cap = plan[1] if plan is not None else None
    payload, counts, row_pos, spill = self._build_list_layout(lmax_cap)
    if self.pq_m is not None:
        extra = (jnp.asarray(self._pq_codebooks),)
    elif self.sq_type is not None:
        # Int8 SQ8 kernel extras: Σ(scale·c)² scattered into the padded
        # (nlist, lmax) layout via row_pos, plus the decode ranges.
        from ..ops.sq import sq_row_norms

        from ..ops.sq import sq_row_sums

        rn = sq_row_norms(self._codes, self._sq_scale, self.d,
                          self.sq_type)
        rs = sq_row_sums(self._codes, self.d, self.sq_type)
        sq_rn_full, sq_rs_full = rn, rs
        rn_layout = np.zeros(row_pos.shape, np.float32)
        rs_layout = np.zeros(row_pos.shape, np.float32)
        valid = row_pos >= 0
        rn_layout[valid] = rn[row_pos[valid]]
        rs_layout[valid] = rs[row_pos[valid]]
        vmin, scale = self._sq_ranges()
        extra = (jnp.asarray(rn_layout), jnp.asarray(rs_layout), vmin,
                 scale)
        if self.sq_type == "sq6":
            # Plane-major payload for the SQ6 kernel: byte b of every
            # 3-byte group in rows [b*lmax, (b+1)*lmax) — (nlist,
            # 3*lmax, ceil(d/4)), the plane axis FOLDED into the sublane
            # axis so the operand is (8,128)-tileable as stored
            # (ops/pallas_ivf.py::_sq_scan_kernel sq6 branch; a 4-D
            # layout cost a 15 G Mosaic relayout copy at marco).
            nlist, lmax, w = payload.shape
            payload = np.ascontiguousarray(
                payload.reshape(nlist, lmax, w // 3, 3)
                .transpose(0, 3, 1, 2)).reshape(nlist, 3 * lmax, w // 3)
    else:
        extra = ()
        sq_rn_full = sq_rs_full = None
    self._device_pallas = (
        jnp.asarray(payload),
        jnp.asarray(counts),
        jnp.asarray(row_pos),
        jnp.asarray(self._centroids),
    ) + extra
    if spill is None:
        self._device_spill = None
    else:
        sp_payload, sp_assign, sp_pos = spill
        s_pad = max(128, next_pow2(sp_pos.shape[0]))
        if sq_rn_full is not None and self.sq_type in ("sq8", "sq4",
                                                       "sq6"):
            sp_rn = jnp.asarray(pad_rows(sq_rn_full[sp_pos], s_pad))
            sp_rs = jnp.asarray(pad_rows(sq_rs_full[sp_pos], s_pad))
        else:
            sp_rn = sp_rs = None
        self._device_spill = (
            jnp.asarray(pad_rows(sp_payload, s_pad)),
            jnp.asarray(pad_rows(sp_assign, s_pad).astype(np.int32)),
            jnp.asarray(pad_rows(sp_pos, s_pad, fill=-1)
                        .astype(np.int32)),
            int(sp_pos.shape[0]),
            sp_rn, sp_rs,
        )
    return self._device_pallas

def _mask_labels_dev(self):
    """Per-version cached labels_for_device_mask resolution (uploading
    the 8.8M-row int64 label table per filtered call would cost more
    than the host path it replaces)."""
    from ..ops.selectors import labels_for_device_mask

    hit = getattr(self, "_mask_ids_dev", None)
    if hit is not None and hit[0] == self._version:
        return hit[1]
    val = labels_for_device_mask(self._ids)
    self._mask_ids_dev = (self._version, val)
    return val

def _spill_mask(self, selector):
    key = ("spill", selector.cache_key(), self._version)
    hit = self._mask_cache.get(key)
    if hit is not None:
        return hit
    from ..ops.selectors import device_row_mask

    dev = device_row_mask(selector, self._device_spill[2],
                          _mask_labels_dev(self))
    if dev is None:                     # host fallback (odd selectors)
        sp_pos = np.asarray(self._device_spill[2])
        passing = selector.contains(self._ids)
        mask = np.zeros(sp_pos.shape, bool)
        valid = sp_pos >= 0
        mask[valid] = passing[sp_pos[valid]]
        dev = jnp.asarray(mask)
    self._mask_cache[key] = dev
    return dev

def _pallas_mask(self, selector):
    key = ("pallas", selector.cache_key(), self._version)
    hit = self._mask_cache.get(key)
    if hit is not None:
        return hit
    # Device-side build: gather+bit-test over the device-resident
    # row_pos from the ~n/8-byte packed bitmap (or sorted id set) —
    # replaces the O(n) host unpack + O(nlist*lmax) scatter + ~10 MB
    # mask upload that cost ~75 ms/call at the marco shape.
    from ..ops.selectors import device_row_mask

    dev = device_row_mask(selector, self._build_device_pallas()[2],
                          _mask_labels_dev(self))
    if dev is None:                     # host fallback (odd selectors)
        if self._dr is not None:
            rp = self._dr.row_pos      # host copy, no device fetch
        else:
            rp = np.asarray(self._build_device_pallas()[2])
        passing = selector.contains(self._ids)
        mask = np.zeros(rp.shape, np.int8)
        valid = rp >= 0
        mask[valid] = passing[rp[valid]]
        dev = jnp.asarray(mask)
    self._mask_cache = {key: dev}
    return dev

# --- device build ----------------------------------------------------
def _build_device(self):
    if self._dr is not None:
        raise errors.InvalidInputError(
            "this device-resident index serves only through the "
            "list-scan kernel (range search and nprobe beyond the "
            "SMEM probe budget need a host-path index)")
    if self._device is not None:
        return self._device
    n = self._nstored
    order = np.argsort(self._assign, kind="stable")
    sorted_assign = self._assign[order]
    counts = np.bincount(sorted_assign, minlength=self.nlist)
    # Scan window length: the longest list, pow2-bucketed so adds don't
    # re-jit every time the max grows.  Lists are CONTIGUOUS blocks of
    # the sorted buffer — the scans slice (lmax, w) windows per probe
    # (ops/ivf_scan.slice_probed_lists); no (nlist, lmax) index table.
    lmax = max(1, int(counts.max()) if n else 1)
    lmax = max(128, next_pow2(lmax))

    # capacity bucketing: padding rows past n are never inside a probed
    # window (offsets/counts bound every list's rows).
    cap = max(config.min_capacity, next_capacity(n + 1))

    if self.pq_m is not None:
        codes_sorted = pad_rows(self._codes[order] if n else self._codes,
                                cap)
        assign_sorted = pad_rows(sorted_assign, cap).astype(np.int32)
        self._device = (
            (jnp.asarray(codes_sorted), jnp.asarray(assign_sorted),
             jnp.asarray(self._pq_codebooks)),
            lmax,
            jnp.asarray(self._centroids),
            order.astype(np.int64),
        )
    elif self.sq_type is not None:
        # Codes stay HOST-side here: the int8 fast path and the uint8
        # decode path each upload their own representation lazily
        # (_ivf_int8_state / _sq_codes_dev) — uploading both would
        # double corpus HBM (13.6 GB × 2 at the MARCO scale).
        codes_sorted = pad_rows(self._codes[order] if n else self._codes,
                                cap)
        vmin, scale = self._sq_ranges()
        self._device = (
            (codes_sorted, vmin, scale),
            lmax,
            jnp.asarray(self._centroids),
            order.astype(np.int64),
        )
    else:
        xb_sorted = pad_rows(self._xb[order] if n else self._xb, cap)
        self._device = (
            jnp.asarray(xb_sorted),
            lmax,
            jnp.asarray(self._centroids),
            order.astype(np.int64),
        )
    return self._device

# --- selector --------------------------------------------------------
def row_labels(self) -> np.ndarray:
    return self._ids

def _selector_mask(self, selector, order):
    key = (selector.cache_key(), self._version)
    hit = self._mask_cache.get(key)
    if hit is not None:
        return hit
    rows = selector.contains(self._ids[order])  # sorted order
    storage = self._device[0]
    cap = (storage[0] if isinstance(storage, tuple) else storage).shape[0]
    mask = jnp.asarray(pad_rows(rows, cap, fill=False))
    self._mask_cache = {key: mask}
    return mask


def _sorted_list_meta(self):
    """(offsets, counts) int32 device arrays describing the sorted
    layout's contiguous list blocks (for slice_probed_lists); cached
    per version."""
    cached = getattr(self, "_list_meta_cache", None)
    if cached is not None and cached[0] == self._version:
        return cached[1]
    c = self._counts().astype(np.int64)
    off = np.concatenate([[0], np.cumsum(c[:-1])]) if c.size else c
    meta = (jnp.asarray(off.astype(np.int32)),
            jnp.asarray(c.astype(np.int32)))
    self._list_meta_cache = (self._version, meta)
    return meta

def _sorted_srcrow(self, order) -> np.ndarray:
    """_srcrow permuted into sorted layout, cached per build like
    _sorted_ids (same O(_nstored)-per-dispatch concern)."""
    cached = getattr(self, "_srcrow_sorted", None)
    if cached is None or cached[0] is not order:
        cached = (order, self._srcrow[order])
        self._srcrow_sorted = cached
    return cached[1]

def _sorted_ids(self, order) -> np.ndarray:
    """ids permuted into the sorted storage layout, cached per layout
    build — the batched serving tier holds one dispatch tuple per batch,
    so materializing an O(ntotal) copy per dispatch (80 MB at the 10M
    scale) is both a host hot-path gather and a memory multiplier.
    Keyed on the identity of the layout's ``order`` array: a rebuild
    (any add) produces a fresh order object, invalidating the cache."""
    cached = self._ids_sorted
    if cached is None or cached[0] is not order:
        cached = (order, self._ids[order] if self.ntotal else self._ids)
        self._ids_sorted = cached
    return cached[1]



IVFIndex.PALLAS_LAYOUT_BUDGET_BYTES = PALLAS_LAYOUT_BUDGET_BYTES
IVFIndex.PALLAS_SMEM_PROBE_INTS = PALLAS_SMEM_PROBE_INTS
#: batch size from which the pair-tile MXU-batched SQ scan takes over
#: (ops/pallas_ivf_pairs.py); below it the per-query DMA kernel wins
#: (tile-table padding overhead dominates at small nq).
IVFIndex.PAIRS_MIN_BATCH = 256
#: minimum lmax*d for the pair-tile path (below it the per-tile
#: extraction passes outweigh the MXU dot win — measured 0.7x at
#: 512*128 vs the per-query kernel, 2026-08-19).
IVFIndex.PAIRS_MIN_WORK = 1 << 19
#: scoped-VMEM budget for the pairs kernel's double-buffered list block
#: + score tile (16 MB total scoped; ~3 MB reserved for unpack scratch,
#: query operands, and Mosaic temporaries).
IVFIndex.PAIRS_VMEM_BUDGET = 13 << 20
IVFIndex.SPILL_FRACTION_MAX = SPILL_FRACTION_MAX
IVFIndex._sq_codes_dev = _sq_codes_dev
IVFIndex._ivf_sq_row_extras = _ivf_sq_row_extras
IVFIndex._counts = _counts
IVFIndex._counts_max = _counts_max
IVFIndex._pallas_plan = _pallas_plan
IVFIndex._use_pallas_scan = _use_pallas_scan
IVFIndex._build_list_layout = _build_list_layout
IVFIndex._build_device_pallas = _build_device_pallas
IVFIndex._spill_mask = _spill_mask
IVFIndex._pallas_mask = _pallas_mask
IVFIndex._build_device = _build_device
IVFIndex.row_labels = row_labels
IVFIndex._selector_mask = _selector_mask
IVFIndex._sorted_list_meta = _sorted_list_meta
IVFIndex._sorted_srcrow = _sorted_srcrow
IVFIndex._sorted_ids = _sorted_ids
