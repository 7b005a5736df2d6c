"""Pallas fused top-k kernel vs the XLA scan path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from duckdb_faiss_ext_tpu.ops.flat_search import flat_search
from duckdb_faiss_ext_tpu.ops.pallas_topk import pallas_flat_search

RNG = np.random.default_rng(21)


@pytest.mark.parametrize("metric", ["L2", "INNER_PRODUCT"])
@pytest.mark.parametrize("nq,cap,n,k", [
    (8, 512, 400, 10),
    (16, 1024, 1024, 3),
    (8, 256, 100, 130),   # k > 128 → two lane groups
])
def test_pallas_matches_xla(metric, nq, cap, n, k):
    d = 128
    xb = np.zeros((cap, d), np.float32)
    xb[:n] = RNG.standard_normal((n, d)).astype(np.float32)
    xq = RNG.standard_normal((nq, d)).astype(np.float32)
    k_eff = min(k, cap)

    d_ref, p_ref = flat_search(jnp.asarray(xb), n, jnp.asarray(xq), k_eff,
                               metric)
    d_pal, p_pal = pallas_flat_search(jnp.asarray(xb), n, jnp.asarray(xq),
                                      k_eff, metric, interpret=True)
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-5)
    # Positions agree wherever scores are distinct (ties may reorder).
    dr = np.asarray(d_ref)
    ties = np.zeros(dr.shape, bool)
    ties[:, 1:] |= dr[:, 1:] == dr[:, :-1]
    ties[:, :-1] |= ties[:, 1:]
    np.testing.assert_array_equal(np.asarray(p_pal)[~ties],
                                  np.asarray(p_ref)[~ties])


def test_pallas_with_mask():
    d, cap, n, nq, k = 128, 512, 500, 8, 5
    xb = np.zeros((cap, d), np.float32)
    xb[:n] = RNG.standard_normal((n, d)).astype(np.float32)
    xq = RNG.standard_normal((nq, d)).astype(np.float32)
    mask = np.zeros((cap,), bool)
    mask[::3] = True

    d_ref, p_ref = flat_search(jnp.asarray(xb), n, jnp.asarray(xq), k,
                               "L2", mask=jnp.asarray(mask))
    d_pal, p_pal = pallas_flat_search(jnp.asarray(xb), n, jnp.asarray(xq),
                                      k, "L2", mask=jnp.asarray(mask),
                                      interpret=True)
    np.testing.assert_allclose(np.asarray(d_pal), np.asarray(d_ref),
                               rtol=1e-5, atol=1e-5)
    assert (np.asarray(p_pal) % 3 == 0).all()


def test_pallas_fewer_than_k():
    d, cap, n, nq, k = 128, 256, 4, 8, 10
    xb = np.zeros((cap, d), np.float32)
    xb[:n] = RNG.standard_normal((n, d)).astype(np.float32)
    xq = RNG.standard_normal((nq, d)).astype(np.float32)
    d_pal, p_pal = pallas_flat_search(jnp.asarray(xb), n, jnp.asarray(xq),
                                      k, "L2", interpret=True)
    p = np.asarray(p_pal)
    assert (p[:, :n] >= 0).all()
    assert (p[:, n:] == -1).all()
    assert np.isinf(np.asarray(d_pal)[:, n:]).all()


def test_api_with_forced_pallas_kernel(catalog):
    """Full API path through the Pallas kernel (interpreter on CPU)."""
    import duckdb_faiss_ext_tpu as dfx

    dfx.set_kernel_mode("pallas")
    try:
        xb = RNG.standard_normal((300, 128)).astype(np.float32)
        dfx.faiss_create("pk", 128, "Flat", metric_type="L2",
                         catalog=catalog)
        dfx.faiss_add(xb, "pk", catalog=catalog)
        res = dfx.faiss_search("pk", 3, xb[:4], catalog=catalog)
        np.testing.assert_array_equal(res["label"][:, 0], np.arange(4))
        np.testing.assert_allclose(res["distance"][:, 0], 0.0, atol=1e-4)
    finally:
        dfx.set_kernel_mode("auto")


def test_pallas_ivf_sq8_kernel_interpret(catalog):
    """Fused int8 SQ8 list-scan kernel (interpret mode): agrees with the
    parity decode path; selector fused; full-pad plans only."""
    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.ops.selectors import BitmapSelector

    rng = np.random.default_rng(17)
    centers = rng.standard_normal((16, 32)).astype(np.float32) * 3
    xb = (centers[rng.integers(0, 16, 4000)]
          + rng.standard_normal((4000, 32)).astype(np.float32) * 0.3)
    xq = xb[:16]
    dfx.faiss_create("p8", 32, "IVF16,SQ8", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add(xb, "p8", catalog=catalog)
    ref = dfx.faiss_search("p8", 10, xq, {"nprobe": "16"}, catalog=catalog)
    flags = np.zeros(4000, bool)
    flags[::2] = True
    dfx.set_precision("fast")
    dfx.set_kernel_mode("pallas")
    try:
        idx = catalog.get("p8").index
        assert idx._pallas_plan() == ("full", None)
        fast = dfx.faiss_search("p8", 10, xq, {"nprobe": "16"},
                                catalog=catalog)
        fsel = dfx.faiss_search("p8", 10, xq, {"nprobe": "16"},
                                catalog=catalog,
                                selector=BitmapSelector.from_bool(flags))
    finally:
        dfx.set_kernel_mode("auto")
        dfx.set_precision("parity")
    np.testing.assert_array_equal(ref["label"], fast["label"])
    got = fsel["label"][fsel["label"] >= 0]
    assert np.all(flags[got])


def test_spill_chunk_ok_gates_odd_capacities():
    """Mosaic's 8-sublane output floor: capacities whose largest pow2
    chunk divisor is 512 or 256 would lower a (C/128, qb) block below 8
    sublanes — the gate must keep them on the XLA scan (filtered 8.8M
    lowering failure, 2026-08-20).  Single-chunk capacities are legal by
    the block==array escape."""
    from duckdb_faiss_ext_tpu.ops.pallas_spill import spill_chunk_ok

    assert spill_chunk_ok(2048) and spill_chunk_ok(4096)
    assert spill_chunk_ok(289 * 2048)     # the 2048-granular trim shape
    # Single-chunk escape is legal ONLY when the query axis is unblocked
    # (qb == nq) — ADVICE r4: nq > 256 with 128 | nq splits queries, so
    # a sub-8-sublane block is no longer the whole array.
    assert spill_chunk_ok(128, 256) and spill_chunk_ok(512, 64)
    assert spill_chunk_ok(512, 129)       # odd nq: qb == nq, unblocked
    assert not spill_chunk_ok(512, 512)   # qb 256 < nq -> blocked
    assert not spill_chunk_ok(512)        # unknown nq: conservative
    assert not spill_chunk_ok(88576)      # 512-odd multiple -> C=512
    assert not spill_chunk_ok(591360)     # the failing filtered capacity


def test_pallas_ivf_sq8_spill_plan(catalog):
    """Capped SQ8 layouts: the int8 kernel scans the padded lists and the
    SQ-aware spill scan covers the overflow; merged results match the
    parity decode path."""
    import duckdb_faiss_ext_tpu as dfx

    rng = np.random.default_rng(19)
    xb = np.concatenate([
        rng.standard_normal((3000, 32)).astype(np.float32),       # big list
        rng.standard_normal((2000, 32)).astype(np.float32) + 8.0,
    ])
    dfx.faiss_create("sk8", 32, "IVF16,SQ8", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add(xb, "sk8", catalog=catalog)
    idx = catalog.get("sk8").index
    idx.PALLAS_LAYOUT_BUDGET_BYTES = 16 * 256 * 32   # force a capped plan
    idx.SPILL_FRACTION_MAX = 0.9
    idx._pallas_plan_cache = None
    ref = dfx.faiss_search("sk8", 10, xb[:16], {"nprobe": "16"},
                           catalog=catalog)
    dfx.set_precision("fast")
    dfx.set_kernel_mode("pallas")
    try:
        idx._pallas_plan_cache = None
        assert idx._pallas_plan() == ("spill", 256)
        fast = dfx.faiss_search("sk8", 10, xb[:16], {"nprobe": "16"},
                                catalog=catalog)
    finally:
        dfx.set_kernel_mode("auto")
        dfx.set_precision("parity")
    np.testing.assert_array_equal(ref["label"], fast["label"])


@pytest.mark.parametrize("metric", ["L2", "INNER_PRODUCT"])
@pytest.mark.parametrize("d", [32, 33])
def test_pallas_ivf_sq4_kernel_interpret(catalog, metric, d):
    """SQ4 nibble-plane kernel (interpret mode): agrees with the parity
    decode path; odd d exercises the pad nibble in the last byte."""
    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.ops.selectors import BitmapSelector

    rng = np.random.default_rng(23)
    centers = rng.standard_normal((16, d)).astype(np.float32) * 3
    xb = (centers[rng.integers(0, 16, 4000)]
          + rng.standard_normal((4000, d)).astype(np.float32) * 0.3)
    xq = xb[:16]
    name = f"p4_{metric}_{d}"
    dfx.faiss_create(name, d, "IVF16,SQ4", metric_type=metric,
                     catalog=catalog)
    dfx.faiss_add(xb, name, catalog=catalog)
    ref = dfx.faiss_search(name, 10, xq, {"nprobe": "16"}, catalog=catalog)
    flags = np.zeros(4000, bool)
    flags[::2] = True
    dfx.set_precision("fast")
    dfx.set_kernel_mode("pallas")
    try:
        idx = catalog.get(name).index
        assert idx._pallas_plan() == ("full", None)
        fast = dfx.faiss_search(name, 10, xq, {"nprobe": "16"},
                                catalog=catalog)
        fsel = dfx.faiss_search(name, 10, xq, {"nprobe": "16"},
                                catalog=catalog,
                                selector=BitmapSelector.from_bool(flags))
    finally:
        dfx.set_kernel_mode("auto")
        dfx.set_precision("parity")
    np.testing.assert_array_equal(ref["label"], fast["label"])
    got = fsel["label"][fsel["label"] >= 0]
    assert np.all(flags[got])
