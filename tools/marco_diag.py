"""Decompose the 8.8M x 1536 SQ8 serving time on-chip.

Builds the marco SQ8 IP index (device ingest, cached pass A) and times
b1024 nprobe=16 four ways: pairs / per-query / pairs without the spill
region / spill region alone — pinpointing where the ~700 ms/batch goes.

Usage: env PYTHONPATH=/root/repo:/root/.axon_site python tools/marco_diag.py
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    sys.argv = ["marco_device.py", "--storage", "SQ8", "--metric", "IP",
                "--unit-norm", "--assign-topk", "4", "--budget-gb", "14.0",
                "--nprobes", "16", "--batches", "1024", "--skip-gt"]
    # Reuse marco_device's build by importing its flow up to the sweep:
    # simplest robust path — run its main with a tiny sweep, then take
    # the built index from the global catalog for the diagnostics.
    import runpy

    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.catalog import GLOBAL_CATALOG
    from duckdb_faiss_ext_tpu.models.ivf import IVFIndex

    runpy.run_path("tools/marco_device.py", run_name="__main__")
    idx = GLOBAL_CATALOG.get("marco").index

    rng = np.random.default_rng(3)
    xq = rng.standard_normal((1024, 1536)).astype(np.float32)
    xq /= np.linalg.norm(xq, axis=1, keepdims=True)
    params = {"nprobe": "16"}

    def timed(label):
        dfx.faiss_search("marco", 10, xq, params)
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            dfx.faiss_search("marco", 10, xq, params)
            best = min(best, time.time() - t0)
        print(f"  {label:26s}: {best*1e3:7.1f} ms ({1024/best:6.0f} qps) "
              f"path={getattr(idx, '_last_scan_path', '?')}", flush=True)
        return best

    from duckdb_faiss_ext_tpu.utils.config import config

    dfx.set_precision("fast")
    dfx.set_kernel_mode("pallas")
    saved = (IVFIndex.PAIRS_MIN_BATCH, IVFIndex.PAIRS_MIN_WORK)
    spill = idx._device_spill
    try:
        t_full = timed("pairs + spill (full)")   # spill_impl auto→pallas
        config.spill_impl = "xla"
        t_full_xla = timed("pairs + spill (XLA spill)")
        config.spill_impl = "auto"
        idx._device_spill = None
        t_pad = timed("pairs, no spill")
        t_mega = t_mega_full = float("nan")
        try:
            config.pairs_impl = "mega"
            t_mega = timed("pairs MEGA, no spill")
            idx._device_spill = spill
            t_mega_full = timed("pairs MEGA + spill (full)")
            idx._device_spill = None
        except Exception as e:  # noqa: BLE001 — keep the rest of the diag
            print(f"  pairs MEGA FAILED: {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
        config.pairs_impl = "grid"
        IVFIndex.PAIRS_MIN_BATCH = 10 ** 9
        t_pq = timed("per-query + spill")
        idx._device_spill = None
        t_pq_pad = timed("per-query, no spill")
    finally:
        idx._device_spill = spill
        (IVFIndex.PAIRS_MIN_BATCH, IVFIndex.PAIRS_MIN_WORK) = saved
        config.pairs_impl = "grid"
        config.spill_impl = "auto"
        dfx.set_kernel_mode("auto")
    print(f"spill-scan share: pallas {(t_full - t_pad)*1e3:.1f} ms / "
          f"xla {(t_full_xla - t_pad)*1e3:.1f} ms; "
          f"padded pairs {t_pad*1e3:.1f} ms (mega {t_mega*1e3:.1f} ms, "
          f"mega full {t_mega_full*1e3:.1f} ms) vs per-query "
          f"{t_pq_pad*1e3:.1f} ms ({t_pq_pad/t_pad:.2f}x)", flush=True)
    print("MARCO-DIAG COMPLETE", flush=True)


if __name__ == "__main__":
    main()
