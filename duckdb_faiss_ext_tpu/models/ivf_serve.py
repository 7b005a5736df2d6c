"""IVF search dispatch and range search (split from models/ivf.py).

The serving tier: parameter resolution (nprobe + quantiser.-scoped
recursion, src/faiss_extension.cpp:675-689), path selection (device-sharded
/ Pallas list-scan / sorted+gather), the SOAR 2k-dedup wrapper, and range
search.  Methods attach to IVFIndex; layouts live in models/ivf_layout.py.
"""

from __future__ import annotations

import functools as _functools

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.flat_search import SIMILARITY_METRICS, finalize_scores
from ..ops.ivf_scan import choose_q_chunk, ivf_pq_search, ivf_search
from ..ops.pallas_ivf import pallas_ivf_search
from ..params import EMPTY
from ..utils.config import (config, next_pow2, on_tpu, pad_rows,
                            sq_int8_active)
from ..utils.transfer import upload_queries
from .base import SearchResult, as_matrix
from .base import dedup_by_key as _dedup_by_key
from .ivf import IVFIndex

_jax = jax


def _sq_kscan(self, k: int, cap: int) -> int:
    """Rerank-pool width for int8-scored SQ scans.  The in-kernel digit
    dots rank by QUANTIZED distance; true neighbours missed there are
    unrecoverable by the exact rerank, so the coarser the codec the wider
    the pool: sq4 (16 levels) widens 2x more than sq8/sq6."""
    f, add = (8, 96) if self.sq_type == "sq4" else (4, 32)
    return min(cap, max(f * k, k + add))


# --- search ----------------------------------------------------------
def search(self, xq, k, params=EMPTY, selector=None) -> SearchResult:
    return self._finish_dispatch(
        self.search_dispatch(xq, k, params, selector), xq, k)

def search_dispatch(self, xq, k, params=EMPTY, selector=None):
    """Raw device dispatch for the single-fetch serving tier
    (api.faiss_search_batched): (dist_dev, pos_dev, nq, k_eff,
    positions→labels fn[, host postprocess]) or None when no device
    work applies.

    With SOAR enabled every datapoint is stored twice (two lists), so
    the kernel fetches 2k candidates and a host postprocess drops the
    same-SOURCE-row duplicates (labels_fn.src_of maps kernel positions
    to logical datapoints — genuinely duplicated user labels are NOT
    collapsed) before padding back to k."""
    if getattr(self, "soar_lambda", 0.0) > 0.0 and int(k) > 0:
        disp = self._dispatch_inner(xq, 2 * int(k), params, selector)
        if disp is None:
            return None
        dist, pos, nq, _, labels_fn = disp
        sim = self.metric.name in SIMILARITY_METRICS
        sentinel = float("-inf") if sim else float("inf")
        src_of = getattr(labels_fn, "src_of", None)

        def post(d, lab, pos_host, k=int(k), sentinel=sentinel,
                 src_of=src_of):
            keys = src_of(pos_host) if src_of is not None else lab
            return _dedup_by_key(d, lab, keys, k, sentinel)

        return dist, pos, nq, int(k), labels_fn, post
    return self._dispatch_inner(xq, k, params, selector)

def _dispatch_inner(self, xq, k, params=EMPTY, selector=None):
    self._require_trained()
    xq = as_matrix(xq, self.d)
    nq = xq.shape[0]
    k = int(k)
    if nq == 0 or k <= 0 or self.ntotal == 0:
        return None

    # SearchParametersIVF: nprobe plus quantiser.-scoped recursion
    # (src/faiss_extension.cpp:675-689).  Our coarse assignment is an
    # exact fused tile, so quantiser.* params parse but cannot change
    # results; they are accepted for surface parity.
    nprobe = params.get_int("nprobe", self.nprobe_default)
    _ = params.scoped("quantiser.")

    nprobe_eff = max(1, min(int(nprobe), self.nlist))
    nq_pad = max(config.min_query_bucket, next_pow2(nq))
    xq_pad = upload_queries(
        pad_rows(xq, nq_pad),
        lossy_ok=(self.sq_type in ("sq8", "sq4", "sq6")
                  or self.pq_m is not None))

    def ids_labels(pos, ids=self._ids):
        return np.where(pos >= 0, ids[np.clip(pos, 0, None)]
                        if ids.size else pos, -1)

    if self._srcrow is not None:
        # Storage-row positions → logical datapoint (SOAR dedup key).
        ids_labels.src_of = (
            lambda pos, src=self._srcrow:
            np.where(pos >= 0, src[np.clip(pos, 0, None)], -1))

    if getattr(self, "_shard_mesh", None) is not None:
        # Device-sharded placement (faiss_to_device): lists partitioned
        # over the mesh, all-gather top-k merge.
        lmax_s = self._ivf_sharded_lmax()
        k_eff = min(k, nprobe_eff * lmax_s)
        dist, pos = self._search_sharded(xq_pad, k_eff, nprobe_eff,
                                         selector)
        return dist, pos, nq, k_eff, ids_labels

    # Pallas list-scan path; skipped when even the minimum 64-query
    # block would overflow the SMEM probe-table budget (qb bottoms out
    # at 64 below — very high nprobe goes through the gather scan).
    if self._use_pallas_scan() and \
            64 * nprobe_eff <= self.PALLAS_SMEM_PROBE_INTS:
        dev = self._build_device_pallas()
        payload, counts, row_pos, cents_dev = dev[:4]
        # sq6 payloads are plane-major (nlist, 3*lmax, d4); others
        # (nlist, lmax, w).
        lmax = (payload.shape[1] // 3 if self.sq_type == "sq6"
                else payload.shape[1])
        spill = getattr(self, "_device_spill", None)
        # Spill rows are extra candidates beyond the capped padded
        # layout: k_eff must count them or k > nprobe·lmax truncates
        # valid neighbors to the padded slots.
        n_spill = spill[2].shape[0] if spill is not None else 0
        k_kernel = min(k, nprobe_eff * lmax)
        k_eff = min(k, nprobe_eff * lmax + n_spill)
        mask = (self._pallas_mask(selector)
                if selector is not None else None)
        probe_ids = _coarse_topk(
            xq_pad, cents_dev,
            jnp.asarray(self.metric_arg, jnp.float32),
            nprobe=nprobe_eff, metric=self.metric.name,
            precision=config.precision)
        # The probe table is scalar-prefetched into SMEM (1 MB/core):
        # block the kernel over queries so nq_block·nprobe ints stay
        # within budget (1024×256 probes hit the 1 MB wall — measured).
        qb = xq_pad.shape[0]
        while qb * nprobe_eff > self.PALLAS_SMEM_PROBE_INTS and qb > 64:
            qb //= 2
        self._last_scan_path = "per-query"   # overwritten by pairs below

        def run_block(xq_b, probe_b, mask_b=mask):
            if self.pq_m is not None:
                from ..ops.pallas_ivf import pallas_ivf_pq_search

                qc = max(1, min(8, xq_b.shape[0]))
                return pallas_ivf_pq_search(
                    payload, counts, row_pos, dev[4], cents_dev,
                    probe_b, xq_b, mask_b,
                    k=k_kernel, nprobe=nprobe_eff,
                    metric=self.metric.name,
                    q_chunk=qc, precision=config.precision,
                    interpret=not on_tpu(), codec=self.pq_codec)
            if self.sq_type is not None:
                from ..ops.pallas_ivf import pallas_ivf_sq_search

                rn_layout, rs_layout, vmin, scale = dev[4:8]
                k_scan = _sq_kscan(self, k_kernel, nprobe_eff * lmax)
                return pallas_ivf_sq_search(
                    payload, rn_layout, rs_layout, counts, row_pos, vmin,
                    scale,
                    probe_b, xq_b, mask_b,
                    k=k_kernel, k_scan=k_scan, nprobe=nprobe_eff,
                    metric=self.metric.name, codec=self.sq_type,
                    interpret=not on_tpu(),
                    digit_dtype=config.sq_digit_dtype)
            return pallas_ivf_search(
                payload, counts, row_pos, probe_b, xq_b, mask_b,
                k=k_kernel, nprobe=nprobe_eff, metric=self.metric.name,
                interpret=not on_tpu())

        # The pair-tile kernels pay off when the per-query kernel is
        # genuinely compute-bound, i.e. the per-pair dot work (lmax·d)
        # is large: on-chip A/B 2026-08-19 — 0.7x at 512·128 (validator
        # shape), the win case is the 8.8M×1536 regime (lmax·d ≈ 3-4M).
        row_bytes = payload.nbytes // max(payload.shape[0] * lmax, 1)
        # HBM temporaries scale with nq·nprobe·lmax; if even a minimum
        # batch would exceed the ~0.75 GB budget, the per-query kernels
        # are the safer path (huge-nprobe regimes).
        pairs_fit = max(1, (768 << 20) // max(nprobe_eff * lmax * 9, 1))
        nq_b = xq_pad.shape[0]
        work = lmax * self.d
        if self.PAIRS_MIN_BATCH > (1 << 20):
            # tools force the per-query path with PAIRS_MIN_BATCH=10**9
            want_pairs = False
        elif self.PAIRS_MIN_WORK == 0:
            # tests force the pairs path at tiny shapes with MIN_WORK=0
            want_pairs = nq_b >= self.PAIRS_MIN_BATCH
        else:
            # measured-crossover gate (ops/pairs_gate.py): on-chip
            # speedup table interpolated in (log lmax*d, log nq); the
            # static class attrs only decide outside the measured hull.
            from ..ops.pairs_gate import pairs_preferred

            want_pairs = pairs_preferred(
                work, nq_b, self.d,
                static_ok=(nq_b >= self.PAIRS_MIN_BATCH
                           and work >= self.PAIRS_MIN_WORK))
        pairs_ok = (want_pairs
                    and pairs_fit >= min(nq_b, self.PAIRS_MIN_BATCH)
                    # double-buffered list block + unpack scratch + the
                    # raw score tile must fit scoped VMEM (16 MB)
                    and 2 * lmax * row_bytes + lmax * 8 * 4 * 2
                    <= self.PAIRS_VMEM_BUDGET)
        if pairs_ok and (self.pq_m is None and self.sq_type is None
                         or self.sq_type in ("sq8", "sq4", "sq6")):
            # Pair-tile MXU-batched scan: big batches are compute-bound
            # on the per-query kernel's batch-1 (VPU) dots; inverting the
            # probe map into per-list query tiles puts the dots on the
            # MXU and dedups hot-list DMA (ops/pallas_ivf_pairs.py).
            # HBM temporaries (raw score tiles + gathered operands) scale
            # with nq·nprobe·lmax — block queries so a batch never holds
            # more than ~0.75 GB of them next to the payload (b1024
            # nprobe=128 at the 8.8M×1536 shape OOMed unblocked).
            qb_pairs = min(xq_pad.shape[0],
                           1 << (pairs_fit.bit_length() - 1))

            def run_pairs(xq_b, probe_b):
                if self.sq_type is not None:
                    from ..ops.pallas_ivf_pairs import                         pallas_ivf_sq_pairs_search

                    self._last_scan_path = "pairs-" + self.sq_type
                    rn_layout, rs_layout, vmin, scale = dev[4:8]
                    k_scan = _sq_kscan(self, k_kernel, nprobe_eff * lmax)
                    return pallas_ivf_sq_pairs_search(
                        payload, rn_layout, rs_layout, counts, row_pos,
                        vmin, scale, probe_b, xq_b, mask,
                        k=k_kernel, k_scan=k_scan, nprobe=nprobe_eff,
                        metric=self.metric.name, codec=self.sq_type,
                        interpret=not on_tpu(),
                        digit_dtype=config.sq_digit_dtype,
                        mega=config.pairs_impl == "mega")
                from ..ops.pallas_ivf_pairs import pallas_ivf_pairs_search

                self._last_scan_path = "pairs-flat"
                k_scan = min(nprobe_eff * lmax,
                             max(4 * k_kernel, k_kernel + 32))
                return pallas_ivf_pairs_search(
                    payload, counts, row_pos, probe_b, xq_b, mask,
                    k=k_kernel, k_scan=k_scan, nprobe=nprobe_eff,
                    metric=self.metric.name, interpret=not on_tpu(),
                    mega=config.pairs_impl == "mega")

            if (qb_pairs >= xq_pad.shape[0]
                    and self.sq_type in ("sq8", "sq4", "sq6")
                    and config.fused_dispatch != "off"):
                # Single-jit serve: coarse+pairs+spill+merge+finalize in
                # one XLA program (the common marco path; the eager
                # probe_ids above is recomputed inside — ~0.5 ms device
                # work, no host sync).
                self._last_scan_path = "fused-pairs-" + self.sq_type
                k_scan = _sq_kscan(self, k_kernel, nprobe_eff * lmax)
                return self._serve_fused(
                    dev, spill, mask, selector, xq_pad, marg=jnp.asarray(
                        self.metric_arg, jnp.float32),
                    k_kernel=k_kernel, k_eff=k_eff, k_scan=k_scan,
                    nprobe=nprobe_eff) + (nq, k_eff, ids_labels)
            if qb_pairs >= xq_pad.shape[0]:
                scores, pos = run_pairs(xq_pad, probe_ids)
            else:
                parts = [run_pairs(xq_pad[i:i + qb_pairs],
                                   probe_ids[i:i + qb_pairs])
                         for i in range(0, xq_pad.shape[0], qb_pairs)]
                scores = jnp.concatenate([p[0] for p in parts], axis=0)
                pos = jnp.concatenate([p[1] for p in parts], axis=0)
        elif (qb == xq_pad.shape[0]
                and self.sq_type in ("sq8", "sq4", "sq6")
                and self.pq_m is None
                and config.fused_dispatch != "off"):
            # Per-query DMA kernel, fused single-jit flavour (the b48 /
            # high-nprobe regimes; same statics as run_block's sq path).
            self._last_scan_path = "fused-perquery-" + self.sq_type
            k_scan = _sq_kscan(self, k_kernel, nprobe_eff * lmax)
            return self._serve_fused(
                dev, spill, mask, selector, xq_pad,
                marg=jnp.asarray(self.metric_arg, jnp.float32),
                k_kernel=k_kernel, k_eff=k_eff, k_scan=k_scan,
                nprobe=nprobe_eff, pairs=False) + (nq, k_eff, ids_labels)
        elif qb == xq_pad.shape[0]:
            scores, pos = run_block(xq_pad, probe_ids)
        else:
            parts = [run_block(xq_pad[i:i + qb], probe_ids[i:i + qb])
                     for i in range(0, xq_pad.shape[0], qb)]
            scores = jnp.concatenate([p[0] for p in parts], axis=0)
            pos = jnp.concatenate([p[1] for p in parts], axis=0)
        if spill is not None:
            # Overflow rows of capped lists: dense scan masked to each
            # query's probe set, merged with the padded-layout top-k.
            from ..ops.ivf_scan import ivf_spill_scan, merge_topk

            sp_payload, sp_assign, sp_pos = spill[:3]
            sp_used = spill[3] if len(spill) > 3 else None
            sp_mask = (self._spill_mask(selector)
                       if selector is not None else None)
            sq_kw = {}
            if self.sq_type is not None:
                sq_kw = dict(sq=self.sq_type, sq_vmin=dev[6],
                             sq_scale=dev[7])
                if len(spill) > 4 and spill[4] is not None:
                    sq_kw.update(
                        spill_rn=spill[4], spill_rs=spill[5],
                        int8_dot=(self.d >= 16 and sq_int8_active()),
                        int8_via=config.spill_int8_via)
            # On-chip label-agreement 1.0000 recorded 2026-08-20 (the
            # exact full-window rerank, tools/spill_profile.py), so
            # "auto" engages the Pallas scan for large sq8/sq4 spills
            # (2.8x the XLA scan at the marco shape).
            sp_rows = (sp_pos.shape[0] if sp_used is None
                       else int(sp_used))
            use_pallas_spill = (
                self.sq_type in ("sq8", "sq4")
                and len(spill) > 4 and spill[4] is not None
                and sq_int8_active() and self.pq_m is None
                and self.d >= 16 and sp_rows > 0
                # huge-k requests (the filtered bench's binomial k')
                # make the exact full-window rerank decode k*128 rows
                # per query — the XLA scan is the better exact path
                and k_eff <= 128
                and config.spill_impl != "xla"
                and (config.spill_impl == "pallas"
                     or sp_rows >= config.spill_pallas_min))
            if use_pallas_spill:
                from ..ops.pallas_spill import spill_chunk_ok

                # odd capacities chunk below Mosaic's 8-sublane output
                # floor — keep those on the XLA scan
                use_pallas_spill = spill_chunk_ok(sp_pos.shape[0],
                                                  xq_pad.shape[0])
            if use_pallas_spill:
                from ..ops.pallas_spill import pallas_spill_search

                sp_scores, sp_positions = pallas_spill_search(
                    sp_payload, sp_assign, sp_pos, probe_ids, xq_pad,
                    sp_mask, k=min(k_eff, sp_pos.shape[0]),
                    metric=self.metric.name, sq=self.sq_type,
                    sq_vmin=dev[6], sq_scale=dev[7],
                    spill_rn=spill[4], spill_rs=spill[5],
                    n_used=sp_used, interpret=not on_tpu(),
                    digit_dtype=config.sq_digit_dtype)
                scores, pos = merge_topk(scores, pos, sp_scores,
                                         sp_positions, k_eff)
                dist, pos = finalize_scores(scores, pos,
                                            self.metric.name)
                return dist, pos, nq, k_eff, ids_labels
            sp_scores, sp_positions = ivf_spill_scan(
                sp_payload, sp_assign, sp_pos, cents_dev,
                dev[4] if self.pq_m is not None else None,
                probe_ids, xq_pad, sp_mask,
                jnp.asarray(self.metric_arg, jnp.float32),
                k=min(k_eff, sp_pos.shape[0]), metric=self.metric.name,
                precision=config.precision, pq=self.pq_m is not None,
                codec=self.pq_codec, n_used=sp_used, **sq_kw)
            scores, pos = merge_topk(scores, pos, sp_scores,
                                     sp_positions, k_eff)
        dist, pos = finalize_scores(scores, pos, self.metric.name)
        return dist, pos, nq, k_eff, ids_labels

    storage, lmax, centroids, order = self._build_device()
    k_eff = min(k, nprobe_eff * lmax)
    offs, cnts = self._sorted_list_meta()
    mask = (self._selector_mask(selector, order)
            if selector is not None else None)
    q_chunk = choose_q_chunk(nq_pad, nprobe_eff * lmax, self.d)

    if self.pq_m is not None:
        codes_sorted, assign_sorted, codebooks = storage
        scores, pos = ivf_pq_search(
            codes_sorted, codebooks,
            offs, cnts, centroids,
            xq_pad, mask, jnp.asarray(self.metric_arg, jnp.float32),
            k=k_eff, nprobe=nprobe_eff, metric=self.metric.name,
            q_chunk=q_chunk, precision=config.precision,
            codec=self.pq_codec, lmax=lmax)
    elif self.sq_type is not None:

        _, vmin, scale = storage
        if (self.sq_type in ("sq8", "sq4", "sq6")
                and self.metric.name in ("L2", "INNER_PRODUCT")
                and self.d >= 16     # tiny-d margins sit at the int8 noise floor
                and sq_int8_active()):
            from ..ops.ivf_scan import ivf_sq_int8_search

            rn, rs = self._ivf_sq_row_extras()
            k_scan = _sq_kscan(self, k_eff, nprobe_eff * lmax)
            scores, pos = ivf_sq_int8_search(
                self._sq_codes_dev(), rn, rs, offs, cnts,
                centroids, vmin, scale, xq_pad, mask,
                jnp.asarray(self.metric_arg, jnp.float32),
                k=k_eff, k_scan=k_scan, nprobe=nprobe_eff,
                metric=self.metric.name, q_chunk=q_chunk,
                precision=config.precision, codec=self.sq_type,
                lmax=lmax)
        else:
            from ..ops.ivf_scan import ivf_sq_search

            scores, pos = ivf_sq_search(
                self._sq_codes_dev(), vmin, scale,
                offs, cnts, centroids,
                xq_pad, mask,
                jnp.asarray(self.metric_arg, jnp.float32),
                k=k_eff, nprobe=nprobe_eff, metric=self.metric.name,
                q_chunk=q_chunk, precision=config.precision,
                codec=self.sq_type, lmax=lmax)
    else:
        scores, pos = ivf_search(
            storage, offs, cnts, centroids,
            xq_pad, mask, jnp.asarray(self.metric_arg, jnp.float32),
            k=k_eff, nprobe=nprobe_eff, metric=self.metric.name,
            q_chunk=q_chunk, precision=config.precision, lmax=lmax)
    dist, pos = finalize_scores(scores, pos, self.metric.name)

    def sorted_labels(pos_host, ids_sorted=self._sorted_ids(order)):
        return np.where(pos_host >= 0,
                        ids_sorted[np.clip(pos_host, 0, None)]
                        if ids_sorted.size else pos_host, -1)

    if self._srcrow is not None:
        sorted_labels.src_of = (
            lambda pos, src=self._sorted_srcrow(order):
            np.where(pos >= 0, src[np.clip(pos, 0, None)], -1))

    return dist, pos, nq, k_eff, sorted_labels


def _serve_fused(self, dev, spill, mask, selector, xq_pad, *, marg,
                 k_kernel, k_eff, k_scan, nprobe, pairs=True):
    """Build the argument set for _fused_sq_pairs_serve, replicating the
    staged path's spill-plan gating exactly (Pallas-vs-XLA spill, int8
    dot, n_used bound)."""
    payload, counts, row_pos, cents_dev = dev[:4]
    rn_layout, rs_layout, vmin, scale = dev[4:8]
    codec = self.sq_type
    sp_payload = sp_assign = sp_pos = sp_rn = sp_rs = sp_mask = None
    pallas_spill = False
    n_used = None
    int8_dot = False
    if spill is not None:
        sp_payload, sp_assign, sp_pos = spill[:3]
        n_used_raw = spill[3] if len(spill) > 3 else None
        n_used = int(n_used_raw) if n_used_raw is not None else None
        sp_mask = (self._spill_mask(selector)
                   if selector is not None else None)
        has_rn = len(spill) > 4 and spill[4] is not None
        sp_rn = spill[4] if has_rn else None
        sp_rs = spill[5] if has_rn else None
        int8_dot = bool(has_rn and self.d >= 16 and sq_int8_active())
        sp_rows = sp_pos.shape[0] if n_used is None else n_used
        pallas_spill = (
            codec in ("sq8", "sq4") and has_rn and sq_int8_active()
            and self.pq_m is None and self.d >= 16 and sp_rows > 0
            and k_eff <= 128 and config.spill_impl != "xla"
            and (config.spill_impl == "pallas"
                 or sp_rows >= config.spill_pallas_min))
        if pallas_spill:
            from ..ops.pallas_spill import spill_chunk_ok

            pallas_spill = spill_chunk_ok(sp_pos.shape[0],
                                          xq_pad.shape[0])
    return _fused_sq_pairs_serve(
        payload, rn_layout, rs_layout, counts, row_pos, vmin, scale,
        cents_dev, xq_pad, mask, marg,
        sp_payload, sp_assign, sp_pos, sp_rn, sp_rs, sp_mask,
        k_kernel=k_kernel, k_eff=k_eff, k_scan=k_scan, nprobe=nprobe,
        metric=self.metric.name, codec=codec,
        digit_dtype=config.sq_digit_dtype,
        mega=config.pairs_impl == "mega", interpret=not on_tpu(),
        precision=config.precision, pallas_spill=pallas_spill,
        n_used=n_used, int8_dot=int8_dot,
        int8_via=config.spill_int8_via, pq_codec=self.pq_codec,
        pairs=pairs)


IVFIndex._serve_fused = _serve_fused


@_functools.partial(_jax.jit, static_argnames=(
    "k_kernel", "k_eff", "k_scan", "nprobe", "metric", "codec",
    "digit_dtype", "mega", "interpret", "precision", "pallas_spill",
    "n_used", "int8_dot", "int8_via", "pq_codec", "pairs"))
def _fused_sq_pairs_serve(payload, rn_layout, rs_layout, counts, row_pos,
                          vmin, scale, cents_dev, xq_pad, mask, marg,
                          sp_payload, sp_assign, sp_pos, sp_rn, sp_rs,
                          sp_mask, *, k_kernel, k_eff, k_scan, nprobe,
                          metric, codec, digit_dtype, mega, interpret,
                          precision, pallas_spill, n_used, int8_dot,
                          int8_via, pq_codec, pairs=True):
    """ONE XLA program for the device-resident SQ serving batch:
    coarse top-k → list scan (pair-tile for large batches, per-query DMA
    otherwise; + epilogue) → spill scan → merge → finalize.  The staged
    path dispatches these as 5-6 separate programs; each inter-program
    boundary through the tunneled runtime costs a dispatch gap and an
    HBM round-trip of the intermediates (epilogue decomposition,
    BASELINE r5).  Statics mirror the staged calls exactly, so results
    are bitwise-identical."""
    from ..ops.ivf_scan import ivf_spill_scan, merge_topk

    probe_ids = _coarse_topk(xq_pad, cents_dev, marg, nprobe=nprobe,
                             metric=metric, precision=precision)
    if pairs:
        from ..ops.pallas_ivf_pairs import pallas_ivf_sq_pairs_search

        scores, pos = pallas_ivf_sq_pairs_search(
            payload, rn_layout, rs_layout, counts, row_pos, vmin, scale,
            probe_ids, xq_pad, mask, k=k_kernel, k_scan=k_scan,
            nprobe=nprobe, metric=metric, codec=codec,
            interpret=interpret, digit_dtype=digit_dtype, mega=mega)
    else:
        from ..ops.pallas_ivf import pallas_ivf_sq_search

        scores, pos = pallas_ivf_sq_search(
            payload, rn_layout, rs_layout, counts, row_pos, vmin, scale,
            probe_ids, xq_pad, mask, k=k_kernel, k_scan=k_scan,
            nprobe=nprobe, metric=metric, codec=codec,
            interpret=interpret, digit_dtype=digit_dtype)
    if sp_pos is not None:
        if pallas_spill:
            from ..ops.pallas_spill import pallas_spill_search

            sp_s, sp_p = pallas_spill_search(
                sp_payload, sp_assign, sp_pos, probe_ids, xq_pad,
                sp_mask, k=min(k_eff, sp_pos.shape[0]), metric=metric,
                sq=codec, sq_vmin=vmin, sq_scale=scale, spill_rn=sp_rn,
                spill_rs=sp_rs, n_used=n_used, interpret=interpret,
                digit_dtype=digit_dtype)
        else:
            sp_s, sp_p = ivf_spill_scan(
                sp_payload, sp_assign, sp_pos, cents_dev, None,
                probe_ids, xq_pad, sp_mask, marg,
                k=min(k_eff, sp_pos.shape[0]), metric=metric,
                precision=precision, pq=False, codec=pq_codec,
                n_used=n_used, sq=codec, sq_vmin=vmin, sq_scale=scale,
                spill_rn=sp_rn, spill_rs=sp_rs, int8_dot=int8_dot,
                int8_via=int8_via)
        scores, pos = merge_topk(scores, pos, sp_s, sp_p, k_eff)
    return finalize_scores(scores, pos, metric)


@_functools.partial(_jax.jit,
                    static_argnames=("nprobe", "metric", "precision"))
def _coarse_topk(xq, centroids, metric_arg, *, nprobe, metric, precision):
    """Coarse-quantizer assignment: top-nprobe list ids per query (MXU tile
    + one small top_k) — feeds the Pallas list-scan kernel."""
    from ..ops.distance import pairwise_tile
    from ..ops.flat_search import SIMILARITY_METRICS as _SIM

    cdist = pairwise_tile(xq, centroids, metric, metric_arg, precision)
    cscore = cdist if metric in _SIM else -cdist
    _, ids = _jax.lax.top_k(cscore, nprobe)
    return ids.astype(_jax.numpy.int32)


def _ivf_range_search(self, xq, radius, params=EMPTY, selector=None):
    """Range search over the probed lists (faiss::IndexIVF::range_search
    contract: exact within the nprobe-selected lists)."""
    from ..ops.range import _ivf_range_chunk, empty_range_result
    from ..ops.range import RangeSearchResult

    self._require_trained()
    xq = as_matrix(xq, self.d)
    nq = xq.shape[0]
    if nq == 0 or self.ntotal == 0:
        return empty_range_result(nq)
    nprobe = params.get_int("nprobe", self.nprobe_default)
    nprobe_eff = max(1, min(int(nprobe), self.nlist))

    storage, lmax, centroids, order = self._build_device()
    offs, cnts = self._sorted_list_meta()
    xb_sorted = storage[0] if isinstance(storage, tuple) else storage
    if self.pq_m is not None:
        # Decode-on-the-fly for PQ storage: reconstruct candidates from
        # codes inside the chunk fn is not wired here; decode the probed
        # candidates via the dense sorted codes path instead.
        codes_sorted, assign_sorted, codebooks = storage
        from ..ops.pq import codec_decode

        # Materialize decoded rows chunk-wise would defeat compression;
        # for range search (non-hot path) decode the full sorted corpus
        # once on device.
        resid = codec_decode(codes_sorted, codebooks, self.pq_codec)
        xb_sorted = resid + centroids[assign_sorted]
    elif self.sq_type is not None:
        from ..ops.sq import sq_decode

        _, vmin, scale = storage
        xb_sorted = sq_decode(self._sq_codes_dev(), vmin, scale,
                              self.sq_type)
    nq_pad = max(config.min_query_bucket, next_pow2(nq))
    xq_pad = jnp.asarray(pad_rows(xq, nq_pad))
    probe_ids = _coarse_topk(xq_pad, centroids,
                             jnp.asarray(self.metric_arg, jnp.float32),
                             nprobe=nprobe_eff, metric=self.metric.name,
                             precision=config.precision)
    sim = self.metric.name in SIMILARITY_METRICS
    labels_sorted = self._sorted_ids(order)
    passing = (selector.contains(labels_sorted)
               if selector is not None else None)
    # Power-of-two chunk so it divides nq_pad (slices never shift).
    budget = max(1, (1 << 22) // max(nprobe_eff * lmax, 1))
    qc = 1
    while qc * 2 <= min(budget, int(nq_pad)):
        qc *= 2
    marg = jnp.asarray(self.metric_arg, jnp.float32)
    per_q_rows = [[] for _ in range(nq)]
    per_q_dist = [[] for _ in range(nq)]
    for q0 in range(0, nq, qc):
        xq_c = jax.lax.dynamic_slice(
            xq_pad, (min(q0, nq_pad - qc), 0), (qc, self.d))
        pr_c = jax.lax.dynamic_slice(
            probe_ids, (min(q0, nq_pad - qc), 0), (qc, nprobe_eff))
        dist, cand = _ivf_range_chunk(
            xb_sorted, offs, cnts, pr_c, xq_c,
            marg, metric=self.metric.name, precision=config.precision,
            lmax=lmax)
        dist = np.asarray(dist)
        cand = np.asarray(cand)
        hit = (dist > radius) if sim else (dist < radius)
        if passing is not None:
            hit &= passing[np.clip(cand, 0, len(passing) - 1)] & \
                (cand < len(passing))
        for qi in range(min(qc, nq - q0)):
            sel_idx = np.nonzero(hit[qi])[0]
            if sel_idx.size:
                rows = cand[qi, sel_idx]
                per_q_rows[q0 + qi].append(labels_sorted[rows])
                per_q_dist[q0 + qi].append(dist[qi, sel_idx])
    lims = np.zeros((nq + 1,), np.int64)
    lparts, dparts = [], []
    for q in range(nq):
        rows = (np.concatenate(per_q_rows[q]) if per_q_rows[q]
                else np.empty((0,), np.int64))
        ds = (np.concatenate(per_q_dist[q]) if per_q_dist[q]
              else np.empty((0,), np.float32))
        lims[q + 1] = lims[q] + rows.size
        lparts.append(rows.astype(np.int64))
        dparts.append(ds.astype(np.float32))
    return RangeSearchResult(
        lims,
        np.concatenate(lparts) if lparts else np.empty((0,), np.int64),
        np.concatenate(dparts) if dparts else np.empty((0,), np.float32))


import jax  # noqa: E402

def _ivf_range_search_outer(self, xq, radius, params=EMPTY, selector=None):
    res = _ivf_range_search(self, xq, radius, params, selector)
    if getattr(self, "soar_lambda", 0.0) <= 0.0:
        return res
    # SOAR duplicates rows across two lists: a label can appear twice in a
    # query's CSR segment when both its lists were probed.  Keep the BEST
    # duplicate (codec storages encode the two copies against different
    # centroids, so their decoded distances differ).  One vectorized
    # lexsort over the whole CSR; result order within a segment is
    # unspecified, matching faiss::RangeSearchResult.
    from ..ops.range import RangeSearchResult

    nq = res.lims.shape[0] - 1
    nres = res.labels.shape[0]
    if nres == 0:
        return res
    qid = np.repeat(np.arange(nq, dtype=np.int64), np.diff(res.lims))
    sim = self.metric.name in SIMILARITY_METRICS
    dkey = -res.distances if sim else res.distances
    order = np.lexsort((dkey, res.labels, qid))
    q_s, l_s = qid[order], res.labels[order]
    first = np.ones((nres,), bool)
    first[1:] = (q_s[1:] != q_s[:-1]) | (l_s[1:] != l_s[:-1])
    keep = order[first]
    keep.sort()  # restore per-query grouping
    counts = np.bincount(qid[keep], minlength=nq)
    lims = np.zeros((nq + 1,), np.int64)
    np.cumsum(counts, out=lims[1:])
    return RangeSearchResult(lims, res.labels[keep], res.distances[keep])


IVFIndex.range_search = _ivf_range_search_outer


IVFIndex.search = search
IVFIndex.search_dispatch = search_dispatch
IVFIndex._dispatch_inner = _dispatch_inner
# `search` is declared abstract on the Index base; attaching it after class
# creation satisfies the contract but abc caches abstractness at creation —
# clear it now that every abstract method is implemented.
IVFIndex.__abstractmethods__ = frozenset()
