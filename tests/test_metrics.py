"""All nine metrics vs a numpy brute-force oracle (the rebuild's tier-2
conformance strategy, SURVEY.md §4)."""

import numpy as np
import pytest

import duckdb_faiss_ext_tpu as dfx
from duckdb_faiss_ext_tpu.metrics import metric_names, resolve_metric

RNG = np.random.default_rng(1234)


def oracle_distance(x, y, metric, metric_arg=0.0):
    """Scalar reference distance (independent numpy implementation of the
    FAISS metric definitions)."""
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    if metric == "INNER_PRODUCT":
        return float(np.dot(x, y))
    if metric == "L2":
        return float(np.sum((x - y) ** 2))
    if metric == "L1":
        return float(np.sum(np.abs(x - y)))
    if metric == "Linf":
        return float(np.max(np.abs(x - y)))
    if metric == "Lp":
        return float(np.sum(np.abs(x - y) ** metric_arg))
    if metric == "Canberra":
        den = np.abs(x) + np.abs(y)
        terms = np.where(den > 0, np.abs(x - y) / np.where(den > 0, den, 1), 0)
        return float(np.sum(terms))
    if metric == "BrayCurtis":
        den = np.sum(np.abs(x + y))
        return float(np.sum(np.abs(x - y)) / den) if den > 0 else 0.0
    if metric == "JensenShannon":
        m = (x + y) / 2
        t1 = np.where(x > 0, x * np.log(np.where(x > 0, x, 1) /
                                        np.where(m > 0, m, 1)), 0)
        t2 = np.where(y > 0, y * np.log(np.where(y > 0, y, 1) /
                                        np.where(m > 0, m, 1)), 0)
        return float(0.5 * (np.sum(t1) + np.sum(t2)))
    if metric == "Jaccard":
        den = np.sum(np.maximum(x, y))
        return float(np.sum(np.minimum(x, y)) / den) if den > 0 else 0.0
    raise ValueError(metric)


@pytest.mark.parametrize("metric", metric_names())
def test_metric_against_oracle(metric, catalog):
    d, n, nq, k = 16, 200, 5, 4
    xb = RNG.random((n, d)).astype(np.float32) + 0.01  # positive for JS
    xq = RNG.random((nq, d)).astype(np.float32) + 0.01
    metric_arg = 2.5 if metric == "Lp" else 0.0

    dfx.faiss_create_params("m", d, "Flat", {"metric_arg": str(metric_arg)},
                            metric_type=metric, catalog=catalog)
    dfx.faiss_add(xb, "m", catalog=catalog)
    res = dfx.faiss_search("m", k, xq, catalog=catalog)

    sim = resolve_metric(metric).is_similarity
    for q in range(nq):
        all_d = np.array([oracle_distance(xq[q], xb[i], metric, metric_arg)
                          for i in range(n)])
        order = np.argsort(-all_d if sim else all_d, kind="stable")
        expect_ids = order[:k]
        got_ids = res["label"][q]
        got_d = res["distance"][q]
        # Compare distances (ids may differ on near-ties).
        np.testing.assert_allclose(got_d, all_d[expect_ids], rtol=1e-4,
                                   atol=1e-5)
        assert set(got_ids) == set(expect_ids) or np.allclose(
            got_d, all_d[got_ids], rtol=1e-4, atol=1e-5)


def test_k_larger_than_n(catalog):
    xb = RNG.random((3, 4)).astype(np.float32)
    dfx.faiss_create("small", 4, "Flat", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "small", catalog=catalog)
    res = dfx.faiss_search("small", 7, RNG.random((2, 4)).astype(np.float32),
                           catalog=catalog)
    assert res.shape == (2, 7)
    assert (res["label"][:, 3:] == -1).all()
    assert np.isinf(res["distance"][:, 3:]).all()
    assert (res["label"][:, :3] >= 0).all()


def test_search_empty_index(catalog):
    dfx.faiss_create("empty", 4, "Flat", metric_type="L2", catalog=catalog)
    res = dfx.faiss_search("empty", 3, RNG.random((2, 4)).astype(np.float32),
                           catalog=catalog)
    assert (res["label"] == -1).all()


def test_fast_precision_mode(catalog):
    """Throughput mode still returns correct neighbours on separated data."""
    dfx.set_precision("fast")
    try:
        xb = np.eye(8, dtype=np.float32) * 10
        dfx.faiss_create("fastm", 8, "Flat", metric_type="L2",
                         catalog=catalog)
        dfx.faiss_add(xb, "fastm", catalog=catalog)
        res = dfx.faiss_search("fastm", 1, xb, catalog=catalog)
        np.testing.assert_array_equal(res["label"][:, 0], np.arange(8))
    finally:
        dfx.set_precision("parity")
