

def test_spherical_kmeans_unit_centroids():
    """spherical=True (the IP-metric coarse-training rule, faiss
    Level1Quantizer parity) keeps every non-empty centroid unit-norm and
    improves IP probe selection on unit-norm corpora."""
    import numpy as np

    from duckdb_faiss_ext_tpu.ops.kmeans import kmeans_fit

    rng = np.random.default_rng(4)
    x = rng.standard_normal((2000, 24)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    cents, labels = kmeans_fit(x, 16, niter=10, spherical=True)
    cents = np.asarray(cents)
    norms = np.linalg.norm(cents, axis=1)
    used = np.isin(np.arange(16), np.asarray(labels))
    np.testing.assert_allclose(norms[used], 1.0, rtol=1e-5)


def test_ip_ivf_trains_spherically():
    import numpy as np

    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.catalog import Catalog

    cat = Catalog()
    rng = np.random.default_rng(5)
    xb = rng.standard_normal((3000, 16)).astype(np.float32)
    xb /= np.linalg.norm(xb, axis=1, keepdims=True)
    dfx.faiss_create("sph", 16, "IVF16,Flat",
                     metric_type="INNER_PRODUCT", catalog=cat)
    dfx.faiss_add(xb, "sph", catalog=cat)
    cents = cat.get("sph").index._centroids
    norms = np.linalg.norm(cents, axis=1)
    np.testing.assert_allclose(norms[norms > 1e-6], 1.0, rtol=1e-5)
    r = dfx.faiss_search("sph", 5, xb[:16], {"nprobe": "16"}, catalog=cat)
    assert (r["label"][:, 0] == np.arange(16)).all()
