"""RefineFlat (RFlat factory suffix) and range-search tests."""
import numpy as np
import pytest

import duckdb_faiss_ext_tpu as dfx


def _oracle_l2(xq, xb):
    return ((xq[:, None, :] - xb[None, :, :]) ** 2).sum(-1)


def test_rflat_exact_rerank(catalog):
    """PQ base + RFlat with a generous k_factor returns exact top-k
    distances (re-scored on raw vectors)."""
    rng = np.random.default_rng(1)
    d, n, k = 16, 2000, 5
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((8, d)).astype(np.float32)
    dfx.faiss_create("rf", d, "PQ4,RFlat", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "rf", catalog=catalog)
    res = dfx.faiss_search("rf", k, xq, {"k_factor": "40"}, catalog=catalog)
    oracle = _oracle_l2(xq, xb)
    best = np.sort(oracle, axis=1)[:, :k]
    # k_factor=40 → 200 candidates of 2000: near-exact recall expected; the
    # distances of returned labels must be the exact raw-vector distances.
    got_exact = np.take_along_axis(oracle, res["label"], axis=1)
    np.testing.assert_allclose(res["distance"], got_exact, rtol=1e-4,
                               atol=1e-4)
    assert np.mean(np.isclose(res["distance"], best, rtol=1e-3,
                              atol=1e-3)) > 0.9


def test_rflat_over_ivfpq(catalog):
    """IVFPQ base + RFlat: re-rank fixes PQ quantization error."""
    rng = np.random.default_rng(2)
    d, n, k = 16, 3000, 5
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = xb[:6]
    dfx.faiss_create("rfivf", d, "IVF8,PQ4,RFlat", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add(xb, "rfivf", catalog=catalog)
    res = dfx.faiss_search("rfivf", k, xq,
                           {"nprobe": "8", "k_factor": "8"}, catalog=catalog)
    # self-hit with exact zero distance after refine
    assert np.all(res["label"][:, 0] == np.arange(6))
    assert np.all(res["distance"][:, 0] < 1e-4)


def test_rflat_save_load_roundtrip(catalog, tmp_path):
    rng = np.random.default_rng(3)
    d, n = 8, 500
    xb = rng.standard_normal((n, d)).astype(np.float32)
    dfx.faiss_create("rfs", d, "PQ2,RFlat", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "rfs", catalog=catalog)
    before = dfx.faiss_search("rfs", 4, xb[:5], {"k_factor": "16"},
                              catalog=catalog)
    path = str(tmp_path / "rf.idx")
    dfx.faiss_save("rfs", path, catalog=catalog)
    dfx.faiss_load("rfl", path, catalog=catalog)
    after = dfx.faiss_search("rfl", 4, xb[:5], {"k_factor": "16"},
                             catalog=catalog)
    np.testing.assert_array_equal(before["label"], after["label"])
    np.testing.assert_allclose(before["distance"], after["distance"])


def test_rflat_k_factor_validation(catalog):
    dfx.faiss_create("rfv", 8, "PQ2,RFlat", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add(np.random.default_rng(0).standard_normal(
        (400, 8)).astype(np.float32), "rfv", catalog=catalog)
    with pytest.raises(dfx.InvalidInputError, match="k_factor"):
        dfx.faiss_search("rfv", 3, np.zeros((1, 8), np.float32),
                         {"k_factor": "0.5"}, catalog=catalog)


def _csr_to_sets(res):
    out = []
    lims = res["lims"]
    for q in range(len(lims) - 1):
        seg = slice(lims[q], lims[q + 1])
        out.append(dict(zip(res["label"][seg].tolist(),
                            res["distance"][seg].tolist())))
    return out


def test_range_search_flat_l2(catalog):
    rng = np.random.default_rng(4)
    d, n = 12, 1500
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((5, d)).astype(np.float32)
    dfx.faiss_create("rgf", d, "Flat", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "rgf", catalog=catalog)
    radius = 18.0
    res = dfx.faiss_range_search("rgf", radius, xq, catalog=catalog)
    oracle = _oracle_l2(xq, xb)
    got = _csr_to_sets(res)
    for q in range(5):
        expect = set(np.nonzero(oracle[q] < radius)[0].tolist())
        assert set(got[q].keys()) == expect
        for lbl, dist in got[q].items():
            np.testing.assert_allclose(dist, oracle[q, lbl], rtol=1e-4,
                                       atol=1e-4)


def test_range_search_flat_ip_and_selector(catalog):
    rng = np.random.default_rng(5)
    d, n = 12, 1000
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((4, d)).astype(np.float32)
    dfx.faiss_create("rgi", d, "Flat", metric_type="INNER_PRODUCT",
                     catalog=catalog)
    dfx.faiss_add(xb, "rgi", catalog=catalog)
    radius = 5.0
    sel = dfx.SetSelector(np.arange(0, n, 2, dtype=np.int64))
    res = dfx.faiss_range_search("rgi", radius, xq, catalog=catalog,
                                 selector=sel)
    oracle = xq @ xb.T
    got = _csr_to_sets(res)
    for q in range(4):
        expect = {int(i) for i in np.nonzero(oracle[q] > radius)[0]
                  if i % 2 == 0}
        assert set(got[q].keys()) == expect


def test_range_search_idmap_labels(catalog):
    rng = np.random.default_rng(6)
    d, n = 8, 600
    xb = rng.standard_normal((n, d)).astype(np.float32)
    ids = np.arange(n, dtype=np.int64) * 10 + 7
    dfx.faiss_create("rgm", d, "IDMap,Flat", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add((ids, xb), "rgm", catalog=catalog)
    res = dfx.faiss_range_search("rgm", 14.0, xb[:3], catalog=catalog)
    assert res["lims"][-1] > 0
    assert np.all(res["label"] % 10 == 7)
    # each query finds itself at distance ~0
    got = _csr_to_sets(res)
    for q in range(3):
        assert ids[q] in got[q]


def test_range_search_ivf_full_probe_matches_flat(catalog):
    rng = np.random.default_rng(7)
    d, n = 12, 2000
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((4, d)).astype(np.float32)
    dfx.faiss_create("rgv", d, "IVF8,Flat", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add(xb, "rgv", catalog=catalog)
    radius = 16.0
    res = dfx.faiss_range_search("rgv", radius, xq, {"nprobe": "8"},
                                 catalog=catalog)
    oracle = _oracle_l2(xq, xb)
    got = _csr_to_sets(res)
    for q in range(4):
        expect = set(np.nonzero(oracle[q] < radius)[0].tolist())
        assert set(got[q].keys()) == expect


def test_range_search_sq8(catalog):
    rng = np.random.default_rng(8)
    d, n = 8, 800
    xb = rng.standard_normal((n, d)).astype(np.float32)
    dfx.faiss_create("rgs", d, "SQ8", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "rgs", catalog=catalog)
    res = dfx.faiss_range_search("rgs", 10.0, xb[:3], catalog=catalog)
    got = _csr_to_sets(res)
    for q in range(3):
        assert q in got[q]          # self-hit within radius
        assert got[q][q] < 0.1      # small quantization error


def test_range_search_hnsw_exact_scan(catalog):
    """HNSW is exact-scan in this engine (documented deviation), so it
    inherits Flat's exact range search — every index family answers."""
    rng = np.random.default_rng(9)
    xb = rng.standard_normal((500, 8)).astype(np.float32)
    dfx.faiss_create("rgh", 8, "HNSW16", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "rgh", catalog=catalog)
    res = dfx.faiss_range_search("rgh", 8.0, xb[:2], catalog=catalog)
    got = _csr_to_sets(res)
    oracle = _oracle_l2(xb[:2], xb)
    for q in range(2):
        assert set(got[q].keys()) == \
            set(np.nonzero(oracle[q] < 8.0)[0].tolist())


# --- SQ4 / SQ6 ------------------------------------------------------------

def test_sq_pack_roundtrip():
    from duckdb_faiss_ext_tpu.ops.sq import (sq4_decode, sq4_pack,
                                             sq6_decode, sq6_pack)
    import jax.numpy as jnp

    rng = np.random.default_rng(10)
    for d in (8, 9, 13, 96):
        q4 = rng.integers(0, 16, (50, d)).astype(np.uint8)
        vmin = jnp.zeros((d,), jnp.float32)
        scale = jnp.ones((d,), jnp.float32)
        dec = np.asarray(sq4_decode(jnp.asarray(sq4_pack(q4)), vmin, scale))
        np.testing.assert_array_equal(dec, q4.astype(np.float32))
        q6 = rng.integers(0, 64, (50, d)).astype(np.uint8)
        dec = np.asarray(sq6_decode(jnp.asarray(sq6_pack(q6)), vmin, scale))
        np.testing.assert_array_equal(dec, q6.astype(np.float32))


@pytest.mark.parametrize("qtype,err", [("SQ4", 1.0), ("SQ6", 0.1)])
def test_sq46_index_end_to_end(catalog, qtype, err):
    rng = np.random.default_rng(11)
    d, n, k = 16, 1200, 5
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = xb[:6]
    dfx.faiss_create("sqx" + qtype, d, qtype, metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add(xb, "sqx" + qtype, catalog=catalog)
    res = dfx.faiss_search("sqx" + qtype, k, xq, catalog=catalog)
    # self-hit with small quantization error
    assert np.all(res["label"][:, 0] == np.arange(6))
    assert np.all(res["distance"][:, 0] < err)
    # memory profile: packed storage
    entry = catalog.get("sqx" + qtype)
    w = entry.index._codes.shape[1]
    assert w == (8 if qtype == "SQ4" else 12)


def test_sq46_save_load(catalog, tmp_path):
    rng = np.random.default_rng(12)
    xb = rng.standard_normal((400, 9)).astype(np.float32)  # odd dim
    dfx.faiss_create("sqs", 9, "SQ4", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "sqs", catalog=catalog)
    before = dfx.faiss_search("sqs", 3, xb[:4], catalog=catalog)
    path = str(tmp_path / "sq4.idx")
    dfx.faiss_save("sqs", path, catalog=catalog)
    dfx.faiss_load("sql", path, catalog=catalog)
    after = dfx.faiss_search("sql", 3, xb[:4], catalog=catalog)
    np.testing.assert_array_equal(before["label"], after["label"])
    np.testing.assert_allclose(before["distance"], after["distance"])
