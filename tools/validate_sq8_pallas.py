"""On-chip Mosaic validation + A/B for the fused int8 Pallas IVF,SQ* scans
and the LSH int8 code corpus.

The kernels (ops/pallas_ivf.py::pallas_ivf_sq_search) pass interpret-mode
parity tests; this script validates the real Mosaic lowerings on the live
chip (uint8 XOR + bitcast→int8 s8×s8 dot for SQ8; nibble-plane mask/shift
bitcasts + two s8 dots for SQ4) and measures them against the XLA
decode+gather scan on the same index.  The LSH section validates the exact
±1 int8 MXU dot (FlatIndex pm1_i8 storage) against a numpy Hamming oracle.

Usage:
    env PYTHONPATH=/root/repo:/root/.axon_site python tools/validate_sq8_pallas.py
"""

from __future__ import annotations

import time

import numpy as np

import duckdb_faiss_ext_tpu as dfx
from duckdb_faiss_ext_tpu.utils.config import set_kernel_mode, set_precision


def timed(fn, *a, reps=3, **kw):
    fn(*a, **kw)                      # warm (compile)
    best = float("inf")
    for _ in range(reps):
        t = time.time()
        r = fn(*a, **kw)
        # result is already host numpy (faiss_search fetches)
        best = min(best, time.time() - t)
    return best, r


def validate_sq(codec: str) -> None:
    rng = np.random.default_rng(7)
    n, d, nlist, nprobe, k = 200_000, 128, 1024, 16, 10
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((256, d)).astype(np.float32)

    for metric in ("L2", "INNER_PRODUCT"):
        name = f"v{codec}_{metric}"
        dfx.faiss_create(name, d, f"IVF{nlist},{codec.upper()}",
                         metric_type=metric)
        dfx.faiss_manual_train(xb[:100_000], name)
        dfx.faiss_add(xb, name)

        # Global config must be restored even when an assert below fires —
        # otherwise every later validator section runs in pallas/fast mode.
        try:
            set_precision("fast")   # engages the int8 path (sq_int8_active)
            params = {"nprobe": str(nprobe)}

            # XLA gather scan (reference path)
            set_kernel_mode("xla")
            t_xla, r_xla = timed(dfx.faiss_search, name, k, xq,
                                 parameters=params)

            # Pallas DMA kernel (Mosaic lowering under test); pin the
            # per-query kernel — b256 would otherwise take the pair-tile
            # path (validated separately by validate_pairs).
            from duckdb_faiss_ext_tpu.models.ivf import IVFIndex
            set_kernel_mode("pallas")
            saved_min = IVFIndex.PAIRS_MIN_BATCH
            IVFIndex.PAIRS_MIN_BATCH = 10 ** 9
            try:
                t_pal, r_pal = timed(dfx.faiss_search, name, k, xq,
                                     parameters=params)
            finally:
                IVFIndex.PAIRS_MIN_BATCH = saved_min

            agree = float(np.mean([
                len(set(a[a >= 0]) & set(b[b >= 0])) / max(1, (a >= 0).sum())
                for a, b in zip(r_pal["label"], r_xla["label"])]))
            print(f"[{codec} {metric}] pallas {t_pal*1e3:7.1f} ms  "
                  f"xla {t_xla*1e3:7.1f} ms ({t_xla/t_pal:4.1f}x)  "
                  f"label-agree {agree:.4f}  b{len(xq)} nprobe={nprobe}")
            assert agree > 0.97, f"label agreement too low: {agree}"
            # Both paths end in the same fp32 decode-rerank: distances of
            # agreed labels must match closely.
            same = r_pal["label"] == r_xla["label"]
            dd = np.abs(r_pal["distance"] - r_xla["distance"])[same]
            assert dd.size and float(dd.max()) < 1e-2, float(dd.max())
        finally:
            set_kernel_mode("auto")
            set_precision("parity")
        dfx.faiss_destroy(name)

    print(f"{codec.upper()} PALLAS VALIDATION OK")


def validate_lsh() -> None:
    """±1 int8 code corpus: on-chip results must equal the exact Hamming
    oracle (the int8 dot is exact — no tolerance)."""
    rng = np.random.default_rng(11)
    n, d, nbits, k = 200_000, 96, 256, 10
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((64, d)).astype(np.float32)

    name = "vlsh"
    dfx.faiss_create(name, d, f"LSH{nbits}r")
    dfx.faiss_add(xb, name)
    t, r = timed(dfx.faiss_search, name, k, xq)

    from duckdb_faiss_ext_tpu.catalog import GLOBAL_CATALOG

    idx = GLOBAL_CATALOG.get(name).index
    codes = idx._codes._xb.astype(np.float32)            # (n, nbits) ±1
    qc = idx._encode(xq).astype(np.float32)              # (64, nbits) ±1
    ham = (nbits - qc @ codes.T) / 2.0                   # exact fp oracle
    order = np.argsort(ham, axis=1, kind="stable")[:, :k]
    oracle_d = np.take_along_axis(ham, order, axis=1).astype(np.float32)
    # Hamming ties are plentiful: compare the distance multiset, and check
    # every returned label's distance equals the oracle distance at its rank.
    # No label may occupy two tied rank slots of the same query.
    assert all(len(set(row)) == k for row in r["label"]), "duplicate labels"
    np.testing.assert_array_equal(np.sort(r["distance"], axis=1),
                                  np.sort(oracle_d, axis=1))
    got_d = (nbits - np.einsum("qb,qkb->qk", qc, codes[r["label"]])) / 2.0
    np.testing.assert_array_equal(got_d, r["distance"])
    print(f"[LSH{nbits}r int8] {t*1e3:7.1f} ms b{len(xq)}  "
          f"exact-Hamming OK ({len(xq)/t:.0f} qps)")
    dfx.faiss_destroy(name)
    print("LSH INT8 VALIDATION OK")


def validate_pairs(codec: str) -> None:
    """A/B the pair-tile MXU-batched scan (ops/pallas_ivf_pairs.py)
    against the per-query DMA kernel and the XLA gather scan at serving
    batch sizes."""
    from duckdb_faiss_ext_tpu.models.ivf import IVFIndex

    rng = np.random.default_rng(17)
    n, d, nlist, nprobe, k = 200_000, 128, 1024, 16, 10
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((1024, d)).astype(np.float32)

    for metric in ("L2", "INNER_PRODUCT"):
        name = f"vp{codec}_{metric}"
        dfx.faiss_create(name, d, f"IVF{nlist},{codec.upper()}",
                         metric_type=metric)
        dfx.faiss_manual_train(xb[:100_000], name)
        dfx.faiss_add(xb, name)
        saved_min = IVFIndex.PAIRS_MIN_BATCH
        try:
            set_precision("fast")
            params = {"nprobe": str(nprobe)}
            set_kernel_mode("xla")
            t_xla, r_xla = timed(dfx.faiss_search, name, k, xq,
                                 parameters=params)
            set_kernel_mode("pallas")
            IVFIndex.PAIRS_MIN_BATCH = 10 ** 9      # force per-query kernel
            t_pq, r_pq = timed(dfx.faiss_search, name, k, xq,
                               parameters=params)
            IVFIndex.PAIRS_MIN_BATCH = 256          # pair-tile kernel
            saved_work = IVFIndex.PAIRS_MIN_WORK
            IVFIndex.PAIRS_MIN_WORK = 0     # small shape: force the path
            try:
                t_pr, r_pr = timed(dfx.faiss_search, name, k, xq,
                                   parameters=params)
            finally:
                IVFIndex.PAIRS_MIN_WORK = saved_work
            agree = float(np.mean([
                len(set(a[a >= 0]) & set(b[b >= 0])) / max(1, (a >= 0).sum())
                for a, b in zip(r_pr["label"], r_xla["label"])]))
            print(f"[pairs {codec} {metric}] pairs {t_pr*1e3:7.1f} ms  "
                  f"per-query {t_pq*1e3:7.1f} ms ({t_pq/t_pr:4.1f}x)  "
                  f"xla {t_xla*1e3:7.1f} ms ({t_xla/t_pr:4.1f}x)  "
                  f"label-agree {agree:.4f}  b{len(xq)} nprobe={nprobe}")
            assert agree > 0.97, f"label agreement too low: {agree}"
        finally:
            IVFIndex.PAIRS_MIN_BATCH = saved_min
            set_kernel_mode("auto")
            set_precision("parity")
        dfx.faiss_destroy(name)
    print(f"{codec.upper()} PAIRS VALIDATION OK")


def validate_pairs_flat() -> None:
    from duckdb_faiss_ext_tpu.models.ivf import IVFIndex

    rng = np.random.default_rng(19)
    n, d, nlist, nprobe, k = 200_000, 128, 1024, 16, 10
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((1024, d)).astype(np.float32)
    name = "vpflat"
    dfx.faiss_create(name, d, f"IVF{nlist},Flat", metric_type="L2")
    dfx.faiss_manual_train(xb[:100_000], name)
    dfx.faiss_add(xb, name)
    saved_min = IVFIndex.PAIRS_MIN_BATCH
    try:
        set_precision("fast")
        params = {"nprobe": str(nprobe)}
        set_kernel_mode("xla")
        t_xla, r_xla = timed(dfx.faiss_search, name, k, xq,
                             parameters=params)
        set_kernel_mode("pallas")
        IVFIndex.PAIRS_MIN_BATCH = 10 ** 9
        t_pq, _ = timed(dfx.faiss_search, name, k, xq, parameters=params)
        IVFIndex.PAIRS_MIN_BATCH = 256
        saved_work = IVFIndex.PAIRS_MIN_WORK
        IVFIndex.PAIRS_MIN_WORK = 0         # small shape: force the path
        try:
            t_pr, r_pr = timed(dfx.faiss_search, name, k, xq,
                               parameters=params)
        finally:
            IVFIndex.PAIRS_MIN_WORK = saved_work
        agree = float(np.mean([
            len(set(a[a >= 0]) & set(b[b >= 0])) / max(1, (a >= 0).sum())
            for a, b in zip(r_pr["label"], r_xla["label"])]))
        print(f"[pairs flat L2] pairs {t_pr*1e3:7.1f} ms  "
              f"per-query {t_pq*1e3:7.1f} ms ({t_pq/t_pr:4.1f}x)  "
              f"xla {t_xla*1e3:7.1f} ms ({t_xla/t_pr:4.1f}x)  "
              f"label-agree {agree:.4f}")
        assert agree > 0.97, agree
    finally:
        IVFIndex.PAIRS_MIN_BATCH = saved_min
        set_kernel_mode("auto")
        set_precision("parity")
    dfx.faiss_destroy(name)
    print("FLAT PAIRS VALIDATION OK")


def main() -> None:
    validate_sq("sq8")
    validate_sq("sq4")
    validate_sq("sq6")
    validate_lsh()
    validate_pairs("sq8")
    validate_pairs("sq4")
    validate_pairs("sq6")
    validate_pairs_flat()


if __name__ == "__main__":
    main()
