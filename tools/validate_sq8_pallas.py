"""On-chip Mosaic validation + A/B for the fused int8 Pallas IVF,SQ8 scan.

The kernel (ops/pallas_ivf.py::pallas_ivf_sq8_search) passes interpret-mode
parity tests; this script validates the real Mosaic lowering on the live
chip (uint8 XOR + bitcast→int8, s8×s8 dot_general) and measures it against
the XLA decode+gather scan on the same index.

Usage:
    env PYTHONPATH=/root/repo:/root/.axon_site python tools/validate_sq8_pallas.py
"""

from __future__ import annotations

import time

import numpy as np

import duckdb_faiss_ext_tpu as dfx
from duckdb_faiss_ext_tpu.utils.config import (config, set_kernel_mode,
                                               set_precision, set_sq_dot)


def timed(fn, *a, reps=3, **kw):
    fn(*a, **kw)                      # warm (compile)
    best = float("inf")
    for _ in range(reps):
        t = time.time()
        r = fn(*a, **kw)
        # result is already host numpy (faiss_search fetches)
        best = min(best, time.time() - t)
    return best, r


def main() -> None:
    rng = np.random.default_rng(7)
    n, d, nlist, nprobe, k = 200_000, 128, 1024, 16, 10
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((256, d)).astype(np.float32)

    for metric in ("L2", "INNER_PRODUCT"):
        name = f"vsq8_{metric}"
        dfx.faiss_create(name, d, f"IVF{nlist},SQ8", metric_type=metric)
        dfx.faiss_manual_train(xb[:100_000], name)
        dfx.faiss_add(xb, name)

        set_precision("fast")       # engages the int8 path (sq_int8_active)
        params = {"nprobe": str(nprobe)}

        # XLA gather scan (reference path)
        set_kernel_mode("xla")
        t_xla, r_xla = timed(dfx.faiss_search, name, k, xq, parameters=params)

        # Pallas DMA kernel (Mosaic lowering under test)
        set_kernel_mode("pallas")
        t_pal, r_pal = timed(dfx.faiss_search, name, k, xq, parameters=params)
        set_kernel_mode("auto")
        set_precision("parity")

        agree = float(np.mean([
            len(set(a[a >= 0]) & set(b[b >= 0])) / max(1, (a >= 0).sum())
            for a, b in zip(r_pal["label"], r_xla["label"])]))
        dmax = float(np.max(np.abs(r_pal["distance"] - r_xla["distance"])))
        print(f"[{metric}] pallas {t_pal*1e3:7.1f} ms  xla {t_xla*1e3:7.1f} ms "
              f"({t_xla/t_pal:4.1f}x)  label-agree {agree:.4f}  "
              f"max|Δdist| {dmax:.3e}  b{len(xq)} nprobe={nprobe}")
        assert agree > 0.97, f"label agreement too low: {agree}"
        # Both paths end in the same fp32 decode-rerank: distances of agreed
        # labels must match closely.
        same = r_pal["label"] == r_xla["label"]
        dd = np.abs(r_pal["distance"] - r_xla["distance"])[same]
        assert dd.size and float(dd.max()) < 1e-2, float(dd.max())
        dfx.faiss_destroy(name)

    print("SQ8 PALLAS VALIDATION OK")


if __name__ == "__main__":
    main()
