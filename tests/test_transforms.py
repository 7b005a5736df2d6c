"""Vector-transform (PCA/OPQ/L2norm prefix) tests."""
import numpy as np
import pytest

import duckdb_faiss_ext_tpu as dfx


def _data(n, d, seed=0):
    rng = np.random.default_rng(seed)
    # Anisotropic data so PCA has structure to find.
    scales = np.linspace(3.0, 0.1, d).astype(np.float32)
    return rng.standard_normal((n, d)).astype(np.float32) * scales[None, :]


def test_pca_flat_end_to_end(catalog):
    d, n = 16, 2000
    xb = _data(n, d)
    dfx.faiss_create("pca", d, "PCA8,Flat", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add(xb, "pca", catalog=catalog)   # deferred train + add
    res = dfx.faiss_search("pca", 5, xb[:6], catalog=catalog)
    # PCA to half dims on anisotropic data: self-hit survives
    assert np.all(res["label"][:, 0] == np.arange(6))
    assert np.all(res["distance"][:, 0] < 1e-3)


def test_pca_orthonormal_and_variance_order():
    from duckdb_faiss_ext_tpu.transforms import PCAMatrix

    x = _data(3000, 12, seed=1)
    t = PCAMatrix(12, 6)
    t.train(x)
    ata = t.A.T @ t.A
    np.testing.assert_allclose(ata, np.eye(6), atol=1e-4)
    y = t.apply(x)
    var = y.var(axis=0)
    assert np.all(np.diff(var) <= 1e-3)  # decreasing component variance


def test_pca_whiten_unit_variance():
    from duckdb_faiss_ext_tpu.transforms import PCAMatrix

    x = _data(5000, 10, seed=2)
    t = PCAMatrix(10, 4, whiten=True)
    t.train(x)
    y = t.apply(x)
    np.testing.assert_allclose(y.var(axis=0), np.ones(4), rtol=0.1)


def test_l2norm_flat_ip(catalog):
    d, n = 8, 500
    xb = _data(n, d, seed=3)
    dfx.faiss_create("l2n", d, "L2norm,Flat", metric_type="INNER_PRODUCT",
                     catalog=catalog)
    dfx.faiss_add(xb, "l2n", catalog=catalog)
    res = dfx.faiss_search("l2n", 3, xb[:4], catalog=catalog)
    # normalized IP of self = 1
    assert np.all(res["label"][:, 0] == np.arange(4))
    np.testing.assert_allclose(res["distance"][:, 0], 1.0, atol=1e-4)


def test_opq_improves_pq_recall(catalog):
    """OPQ rotation before PQ beats plain PQ on anisotropic data."""
    d, n, k = 16, 3000, 10
    xb = _data(n, d, seed=4)
    xq = _data(50, d, seed=5)
    oracle = np.argsort(((xq[:, None, :] - xb[None, :, :]) ** 2).sum(-1),
                        axis=1)[:, :k]

    def recall(name, params=None):
        res = dfx.faiss_search(name, k, xq, params, catalog=catalog)
        hits = 0
        for q in range(len(xq)):
            hits += len(set(res["label"][q]) & set(oracle[q]))
        return hits / oracle.size

    dfx.faiss_create("plainpq", d, "PQ8", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "plainpq", catalog=catalog)
    dfx.faiss_create("opqpq", d, "OPQ8,PQ8", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add(xb, "opqpq", catalog=catalog)
    r_plain, r_opq = recall("plainpq"), recall("opqpq")
    assert r_opq >= r_plain - 0.02   # OPQ at least matches plain PQ
    assert r_opq > 0.5


def test_opq_ivfpq_save_load(catalog, tmp_path):
    d, n = 16, 2500
    xb = _data(n, d, seed=6)
    dfx.faiss_create("oivf", d, "OPQ4_8,IVF8,PQ4", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add(xb, "oivf", catalog=catalog)
    before = dfx.faiss_search("oivf", 5, xb[:5], {"nprobe": "8"},
                              catalog=catalog)
    path = str(tmp_path / "oivf.idx")
    dfx.faiss_save("oivf", path, catalog=catalog)
    dfx.faiss_load("oivfl", path, catalog=catalog)
    after = dfx.faiss_search("oivfl", 5, xb[:5], {"nprobe": "8"},
                             catalog=catalog)
    np.testing.assert_array_equal(before["label"], after["label"])
    np.testing.assert_allclose(before["distance"], after["distance"])


def test_transform_dim_validation():
    with pytest.raises(dfx.InvalidInputError, match="exceeds"):
        dfx.build_index(8, "PCA16,Flat", dfx.resolve_metric("L2"))
    with pytest.raises(dfx.InvalidInputError, match="multiple"):
        dfx.build_index(8, "OPQ3_8,Flat", dfx.resolve_metric("L2"))


def test_pretransform_range_search(catalog):
    d, n = 12, 800
    xb = _data(n, d, seed=7)
    dfx.faiss_create("ptr", d, "L2norm,Flat", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add(xb, "ptr", catalog=catalog)
    res = dfx.faiss_range_search("ptr", 0.5, xb[:3], catalog=catalog)
    # self-hit at distance 0 present for each query
    for q in range(3):
        seg = res["label"][res["lims"][q]:res["lims"][q + 1]]
        assert q in seg


def test_pcaw_reverse_roundtrip():
    """Regression (code review): reverse must use the pseudo-inverse —
    whitened PCA columns are not orthonormal, so A.T mis-scales."""
    from duckdb_faiss_ext_tpu.transforms import PCAMatrix

    x = _data(4000, 10, seed=8)
    t = PCAMatrix(10, 10, whiten=True)
    t.train(x)
    y = t.apply(x[:50])
    back = t.reverse(y)
    np.testing.assert_allclose(back, x[:50], rtol=1e-2, atol=1e-3)
