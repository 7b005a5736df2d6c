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


def test_rr_preserves_l2_distances(catalog):
    """RR (d_out = d_in) is orthogonal: search distances equal the plain
    Flat index's bit-for-bit up to fp accumulation."""
    d, n = 16, 800
    xb = _data(n, d, seed=4)
    dfx.faiss_create("rrflat", d, "RR,Flat", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_create("plain", d, "Flat", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "rrflat", catalog=catalog)
    dfx.faiss_add(xb, "plain", catalog=catalog)
    a = dfx.faiss_search("rrflat", 5, xb[:8], catalog=catalog)
    b = dfx.faiss_search("plain", 5, xb[:8], catalog=catalog)
    np.testing.assert_array_equal(a["label"], b["label"])
    np.testing.assert_allclose(a["distance"], b["distance"],
                               rtol=1e-4, atol=1e-4)


def test_rr_dim_expand_and_reduce():
    from duckdb_faiss_ext_tpu.transforms import RandomRotationMatrix

    x = _data(200, 12, seed=5)
    up = RandomRotationMatrix(12, 24)
    y = up.apply(x)
    assert y.shape == (200, 24)
    # Rows of A orthonormal → norms preserved on expansion.
    np.testing.assert_allclose(np.linalg.norm(y, axis=1),
                               np.linalg.norm(x, axis=1), rtol=1e-4)
    down = RandomRotationMatrix(12, 6)
    assert down.apply(x).shape == (200, 6)


def test_itq_preserves_l2_distances(catalog):
    """ITQ with d_out = d_in is centering + orthogonal rotation: pairwise
    L2 distances are unchanged, so search matches plain Flat."""
    d, n = 12, 600
    xb = _data(n, d, seed=6)
    dfx.faiss_create("itqf", d, "ITQ,Flat", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_create("plain2", d, "Flat", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "itqf", catalog=catalog)
    dfx.faiss_add(xb, "plain2", catalog=catalog)
    a = dfx.faiss_search("itqf", 5, xb[:8], catalog=catalog)
    b = dfx.faiss_search("plain2", 5, xb[:8], catalog=catalog)
    np.testing.assert_array_equal(a["label"], b["label"])
    np.testing.assert_allclose(a["distance"], b["distance"],
                               rtol=1e-4, atol=1e-4)


def test_itq_lsh_recall_beats_plain_lsh(catalog):
    """The point of ITQ: rotating to minimize binarization error improves
    Hamming-space recall vs the same LSH without the learned rotation."""
    rng = np.random.default_rng(7)
    d, n = 32, 4000
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xb *= np.linspace(4.0, 0.25, d).astype(np.float32)[None, :]
    xq = xb[:64] + rng.standard_normal((64, d)).astype(np.float32) * 0.05
    # Exact oracle
    dfx.faiss_create("oracle", d, "Flat", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "oracle", catalog=catalog)
    truth = dfx.faiss_search("oracle", 10, xq, catalog=catalog)["label"]

    def recall(name, desc):
        dfx.faiss_create(name, d, desc, metric_type="L2", catalog=catalog)
        dfx.faiss_add(xb, name, catalog=catalog)
        got = dfx.faiss_search(name, 10, xq, catalog=catalog)["label"]
        hits = sum(len(set(g) & set(t)) for g, t in zip(got, truth))
        return hits / truth.size

    r_itq = recall("itqlsh", "ITQ,LSH32")
    r_lsh = recall("lshp", "LSH32")
    assert r_itq >= r_lsh - 0.02, (r_itq, r_lsh)
    assert r_itq > 0.15, r_itq  # well above chance (10/4000)


def test_rr_itq_save_load_roundtrip(catalog, tmp_path):
    d, n = 16, 500
    xb = _data(n, d, seed=8)
    for name, desc in [("rrsv", "RR8,Flat"), ("itqsv", "ITQ8,LSH16")]:
        dfx.faiss_create(name, d, desc, metric_type="L2", catalog=catalog)
        dfx.faiss_add(xb, name, catalog=catalog)
        before = dfx.faiss_search(name, 4, xb[:5], catalog=catalog)
        path = str(tmp_path / f"{name}.idx")
        dfx.faiss_save(name, path, catalog=catalog)
        dfx.faiss_load(name + "2", path, catalog=catalog)
        after = dfx.faiss_search(name + "2", 4, xb[:5], catalog=catalog)
        np.testing.assert_array_equal(before["label"], after["label"])
        np.testing.assert_allclose(before["distance"], after["distance"],
                                   rtol=1e-5, atol=1e-5)


def test_pad_transform(catalog):
    """Padn (RemapDimensionsTransform): zero-pad to d_out; distances exact
    vs unpadded Flat; enables PQ on non-divisible dims."""
    d, n = 10, 400
    xb = _data(n, d, seed=9)
    dfx.faiss_create("padf", d, "Pad16,Flat", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_create("plain3", d, "Flat", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "padf", catalog=catalog)
    dfx.faiss_add(xb, "plain3", catalog=catalog)
    a = dfx.faiss_search("padf", 5, xb[:6], catalog=catalog)
    b = dfx.faiss_search("plain3", 5, xb[:6], catalog=catalog)
    np.testing.assert_array_equal(a["label"], b["label"])
    np.testing.assert_allclose(a["distance"], b["distance"],
                               rtol=1e-5, atol=1e-5)
    # PQ needs d % m == 0: Pad makes d=10 usable with m=4.
    dfx.faiss_create("padpq", d, "Pad16,PQ4", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add(xb, "padpq", catalog=catalog)
    res = dfx.faiss_search("padpq", 3, xb[:5], catalog=catalog)
    assert (res["label"][:, 0] == np.arange(5)).sum() >= 4
    with pytest.raises(dfx.errors.InvalidInputError, match="below input"):
        dfx.faiss_create("padbad", d, "Pad8,Flat", catalog=catalog)
