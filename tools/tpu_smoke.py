"""Real-TPU end-to-end smoke: every index family through the full surface.

The fast hardware sanity pass (~4-5 min through the tunneled chip — most of
it remote compiles).  Covers: golden Flat parity, every factory family
(create → add → search), the batched single-fetch serving path vs
sequential, filtered search (bitmap + id-set), save/load with the
loaded⇒immutable rule, destroy, and the reference's error probes.

Usage:
    env PYTHONPATH=/root/repo:/root/.axon_site python tools/tpu_smoke.py
"""

from __future__ import annotations

import os
import tempfile
import time

import numpy as np

import duckdb_faiss_ext_tpu as dfx
from duckdb_faiss_ext_tpu import errors


def main() -> None:
    t0 = time.time()
    rng = np.random.default_rng(42)

    # 1. Golden Flat parity (the reference's numeric target shape:
    #    test/sql/faiss.test — here vs a numpy L2 oracle).
    dfx.faiss_create("g", 8, "Flat", metric_type="L2")
    xb8 = rng.standard_normal((1000, 8)).astype(np.float32)
    dfx.faiss_add(xb8, "g")
    res = dfx.faiss_search("g", 2, xb8[:3])
    ref = np.sum((xb8[:3, None, :] - xb8[None, :, :]) ** 2, -1)
    idx = np.argsort(ref, 1, kind="stable")[:, :2]
    np.testing.assert_array_equal(res["label"], idx)
    np.testing.assert_allclose(res["distance"],
                               np.take_along_axis(ref, idx, 1),
                               rtol=2e-5, atol=1e-5)
    dfx.faiss_destroy("g")
    print("golden flat parity OK", flush=True)

    # 2. Every family: sequential vs batched single-fetch agreement.
    xb = rng.standard_normal((600, 16)).astype(np.float32)
    ids = np.arange(1000, 1600, dtype=np.int64)
    families = ["Flat", "IVF8,Flat", "IVF8,PQ4", "IVF8,SQ8", "PQ4", "SQ8",
                "SQ4", "SQfp16", "LSH", "LSHrt", "PCA8,Flat", "L2norm,SQ8",
                "HNSW16", "PQ4,RFlat", "IDMap,Flat", "IDMap,IVF8,Flat",
                "IDMap2,PQ4", "IVF8(IVF4,Flat)", "SQbf16", "IVF8,SQbf16",
                "RR,Flat", "ITQ,LSH16", "NSG16", "IMI2x2,Flat", "RQ2x4",
                "IVF8,RQ2x4",
                "IMI2x2,PQ4"]
    for desc in families:
        dfx.faiss_create("f", 16, desc, metric_type="L2")
        data = (ids, xb) if desc.startswith("IDMap") else xb
        dfx.faiss_add(data, "f")
        a = dfx.faiss_search("f", 4, xb[:6], {"nprobe": "8"})
        b = dfx.faiss_search_batched("f", 4, xb[:6], {"nprobe": "8"},
                                     batch_size=2)
        np.testing.assert_array_equal(a["label"], b["label"], err_msg=desc)
        np.testing.assert_allclose(a["distance"], b["distance"],
                                   rtol=1e-5, atol=1e-6, err_msg=desc)
        dfx.faiss_destroy("f")
        print(f"family {desc} OK", flush=True)

    # 3. Filtered search, both selector forms.
    dfx.faiss_create("flt", 16, "IDMap,Flat", metric_type="L2")
    dfx.faiss_add((ids, xb), "flt")
    dfx.register_table("t", {"id": ids})
    r_sel = dfx.faiss_search_filter("flt", 4, xb[:5], "id % 2 == 0",
                                    "id", "t")
    r_set = dfx.faiss_search_filter_set("flt", 4, xb[:5], "id % 2 == 0",
                                        "id", "t")
    assert (r_sel["label"] % 2 == 0).all() and (r_set["label"] % 2 == 0).all()
    np.testing.assert_array_equal(r_sel["label"], r_set["label"])
    dfx.faiss_destroy("flt")
    print("filtered search (bitmap + id-set) OK", flush=True)

    # 4. Save/load + loaded-index immutability + error probes.
    dfx.faiss_create("p", 16, "SQ8", metric_type="L2")
    dfx.faiss_add(xb, "p")
    path = os.path.join(tempfile.mkdtemp(), "p.dfx")
    dfx.faiss_save("p", path)
    dfx.faiss_load("p2", path)
    np.testing.assert_array_equal(
        dfx.faiss_search("p", 3, xb[:4])["label"],
        dfx.faiss_search("p2", 3, xb[:4])["label"])
    for probe, exc in [
        (lambda: dfx.faiss_add(xb, "p2"), errors.InvalidInputError),
        (lambda: dfx.faiss_create("p", 16, "Flat"), errors.InvalidInputError),
        (lambda: dfx.faiss_search("missing", 3, xb[:1]),
         errors.InvalidInputError),
        (lambda: dfx.faiss_create("bad", 16, "NOPE?"),
         errors.InvalidInputError),
    ]:
        try:
            probe()
        except exc:
            pass
        else:
            raise AssertionError(f"probe did not raise: {probe}")
    dfx.faiss_destroy("p")
    dfx.faiss_destroy("p2")
    print("save/load + error probes OK", flush=True)

    # Int8-native SQ8 scan (fast mode): validates the int8 MXU dot +
    # decode-rerank on real hardware (standalone and IVF,SQ8) before the
    # corpus-scale runs rely on it.
    rng8 = np.random.default_rng(21)
    c8 = rng8.standard_normal((32, 32)).astype(np.float32) * 3
    x8 = (c8[rng8.integers(0, 32, 4000)]
          + rng8.standard_normal((4000, 32)).astype(np.float32) * 0.3)
    for desc8 in ("SQ8", "IVF32,SQ8"):
        dfx.faiss_create("i8", 32, desc8, metric_type="L2")
        dfx.faiss_add(x8, "i8")
        p8 = {"nprobe": "32"} if "IVF" in desc8 else None
        ref8 = dfx.faiss_search("i8", 5, x8[:16], p8)
        dfx.set_precision("fast")
        try:
            fast8 = dfx.faiss_search("i8", 5, x8[:16], p8)
        finally:
            dfx.set_precision("parity")
        hits = np.mean([len(set(ref8["label"][q]) & set(fast8["label"][q]))
                        for q in range(16)]) / 5
        assert hits >= 0.95, f"{desc8} int8 path agreement {hits}"
        dfx.faiss_destroy("i8")
    print("int8 SQ8 scan (standalone + IVF) OK", flush=True)

    # HNSW graph regime (CAGRA walk): forced below its normal threshold so
    # the build + packed walk + batched dispatch compile and run on-chip.
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((64, 32)).astype(np.float32) * 4
    gxb = (centers[rng.integers(0, 64, 4000)]
           + rng.standard_normal((4000, 32)).astype(np.float32) * 0.3)
    dfx.faiss_create("gw", 32, "HNSW32", metric_type="L2")
    from duckdb_faiss_ext_tpu.catalog import GLOBAL_CATALOG

    gidx = GLOBAL_CATALOG.get("gw").index
    gidx.ann_threshold = 1000
    dfx.faiss_add(gxb, "gw")
    gres = dfx.faiss_search("gw", 5, gxb[:16], {"efSearch": "64"})
    assert gidx._graph is not None, "graph regime did not engage"
    assert np.all(gres["label"][:, 0] == np.arange(16))
    gbat = dfx.faiss_search_batched("gw", 5, gxb[:16], {"efSearch": "64"},
                                    batch_size=8)
    np.testing.assert_array_equal(gbat["label"], gres["label"])
    dfx.faiss_destroy("gw")
    print("HNSW graph walk (build + packed walk + batched dispatch) OK",
          flush=True)

    print(f"TPU SMOKE PASSED in {time.time() - t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
