"""LSH index family: Hamming parity vs a numpy oracle, thresholds,
selectors, composites, and the batched serving path."""

import numpy as np
import pytest

import duckdb_faiss_ext_tpu as dfx
from duckdb_faiss_ext_tpu import errors
from duckdb_faiss_ext_tpu.models.lsh import LSHIndex
from duckdb_faiss_ext_tpu.metrics import resolve_metric


def _oracle_hamming(index: LSHIndex, xb, xq):
    """Brute-force Hamming distances from the model's own encoder."""
    cb = index._encode(np.asarray(xb, np.float32)) > 0
    cq = index._encode(np.asarray(xq, np.float32)) > 0
    return (cq[:, None, :] != cb[None, :, :]).sum(-1).astype(np.float32)


@pytest.mark.parametrize("desc,nbits", [("LSH", 16), ("LSHr", 16),
                                        ("LSH24r", 24), ("LSH8", 8)])
def test_lsh_matches_hamming_oracle(catalog, desc, nbits):
    rng = np.random.default_rng(11)
    d, n, k = 16, 500, 7
    xb = rng.standard_normal((n, d)).astype(np.float32)
    xq = rng.standard_normal((9, d)).astype(np.float32)
    dfx.faiss_create("l", d, desc, metric_type="L2", catalog=catalog)
    entry = catalog.get("l")
    assert entry.index.nbits == nbits
    dfx.faiss_add(xb, "l", catalog=catalog)
    res = dfx.faiss_search("l", k, xq, catalog=catalog)
    ham = _oracle_hamming(entry.index, xb, xq)
    expect = np.sort(ham, axis=1)[:, :k]
    np.testing.assert_array_equal(res["distance"], expect, err_msg=desc)
    # Labels must achieve the reported distances.
    got = np.take_along_axis(ham, res["label"].astype(np.int64), axis=1)
    np.testing.assert_array_equal(got, res["distance"], err_msg=desc)
    dfx.faiss_destroy("l", catalog=catalog)


def test_lsh_trained_thresholds(catalog):
    """LSHt requires training; thresholds shift the binarization point so a
    constant offset no longer saturates every bit."""
    rng = np.random.default_rng(3)
    d = 16
    xb = (rng.standard_normal((400, d)) + 5.0).astype(np.float32)
    dfx.faiss_create("lt", d, "LSHt", metric_type="L2", catalog=catalog)
    idx = catalog.get("lt").index
    assert idx.requires_training and not idx.is_trained
    with pytest.raises(errors.InvalidInputError):
        idx.add(xb)
    # Deferred train-on-finalize through faiss_add (untrained staging path).
    dfx.faiss_add(xb, "lt", catalog=catalog)
    assert idx.is_trained
    # Untrained LSH on offset data: every projection positive -> all codes
    # equal -> Hamming 0 everywhere.  Trained thresholds split the data.
    res = dfx.faiss_search("lt", 5, xb[:4], catalog=catalog)
    assert res["distance"].max() > 0
    untrained = LSHIndex(d, resolve_metric("L2"))
    untrained.add(xb)
    r0 = untrained.search(xb[:4], 5)
    assert r0.distances.max() == 0


def test_lsh_selector_and_idmap(catalog):
    rng = np.random.default_rng(5)
    d = 16
    xb = rng.standard_normal((300, d)).astype(np.float32)
    ids = np.arange(300, dtype=np.int64) * 10
    dfx.faiss_create("li", d, "IDMap,LSH", metric_type="L2", catalog=catalog)
    dfx.faiss_add((ids, xb), "li", catalog=catalog)
    res = dfx.faiss_search("li", 4, xb[:6], catalog=catalog)
    assert (res["label"] % 10 == 0).all()
    assert (res["distance"][:, 0] == 0).all()  # self-hit at Hamming 0
    # Batched path agrees with sequential.
    b = dfx.faiss_search_batched("li", 4, xb[:6], batch_size=2,
                                 catalog=catalog)
    np.testing.assert_array_equal(res["label"], b["label"])
    np.testing.assert_array_equal(res["distance"], b["distance"])


def test_lsh_k_gt_ntotal(catalog):
    rng = np.random.default_rng(9)
    xb = rng.standard_normal((3, 16)).astype(np.float32)
    dfx.faiss_create("lk", 16, "LSH", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "lk", catalog=catalog)
    res = dfx.faiss_search("lk", 8, xb[:2], catalog=catalog)
    assert res["label"].shape == (2, 8)
    assert (res["label"][:, 3:] == -1).all()
    assert np.isinf(res["distance"][:, 3:]).all()


def test_factory_paren_quantizer(catalog):
    """faiss's parenthesized coarse-quantizer grammar: IVFn(desc) equals
    IVFn_desc; nested commas inside parens don't split components."""
    rng = np.random.default_rng(2)
    xb = rng.standard_normal((500, 16)).astype(np.float32)
    for desc in ("IVF8(Flat)", "IVF8(HNSW4)", "IVF8(IVF4,Flat)",
                 "IVF8(Flat),PQ4", "IDMap,IVF8(Flat),SQ8"):
        dfx.faiss_create("pa", 16, desc, metric_type="L2", catalog=catalog)
        data = ((np.arange(500, dtype=np.int64), xb)
                if desc.startswith("IDMap") else xb)
        dfx.faiss_add(data, "pa", catalog=catalog)
        res = dfx.faiss_search("pa", 3, xb[:4], {"nprobe": "8"},
                               catalog=catalog)
        assert res["label"].shape == (4, 3), desc
        assert (res["label"][:, 0] == np.arange(4)).all(), desc  # self-hit
        dfx.faiss_destroy("pa", catalog=catalog)
    with pytest.raises(errors.InvalidInputError):
        dfx.faiss_create("bad", 16, "IVF8(Flat", catalog=catalog)


def test_sqbf16_codec(catalog):
    """SQbf16 — MXU-native bf16 storage (engine extension matching faiss
    QT_bf16): training-free, half the HBM of fp32, small quantization
    error, exact self-hits."""
    rng = np.random.default_rng(12)
    xb = rng.standard_normal((400, 16)).astype(np.float32)
    dfx.faiss_create("bf", 16, "SQbf16", metric_type="L2", catalog=catalog)
    idx = catalog.get("bf").index
    assert not idx.requires_training and idx.is_trained
    dfx.faiss_add(xb, "bf", catalog=catalog)
    res = dfx.faiss_search("bf", 5, xb[:8], catalog=catalog)
    assert (res["label"][:, 0] == np.arange(8)).all()
    # bf16 has ~3 decimal digits: distances near the fp32 exact ones.
    exact = np.sort(((xb[:8, None] - xb[None]) ** 2).sum(-1), 1)[:, :5]
    np.testing.assert_allclose(res["distance"], exact, rtol=0.15, atol=0.15)
    rec = idx.reconstruct(3)
    np.testing.assert_allclose(rec, xb[3], rtol=0.02, atol=0.02)
