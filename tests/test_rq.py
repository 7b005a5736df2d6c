"""Residual-quantizer (RQ{M}x{b}) tests: codec exactness, beam search,
end-to-end search/recall, persistence, composites."""

import numpy as np
import pytest

import duckdb_faiss_ext_tpu as dfx


def _clustered(n, d, ncent=16, seed=21, spread=0.25):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((ncent, d)).astype(np.float32) * 3
    return (centers[rng.integers(0, ncent, n)]
            + rng.standard_normal((n, d)).astype(np.float32) * spread)


def test_rq_decode_matches_manual():
    from duckdb_faiss_ext_tpu.ops.rq import rq_decode, rq_encode, rq_train

    x = _clustered(600, 8, seed=1)
    cb = np.asarray(rq_train(x, 3, 16))
    codes = np.asarray(rq_encode(x[:20], cb, beam=2))
    dec = np.asarray(rq_decode(codes, cb))
    manual = sum(cb[m][codes[:, m]] for m in range(3))
    np.testing.assert_allclose(dec, manual, rtol=1e-5, atol=1e-5)


def test_rq_beam_improves_on_greedy():
    from duckdb_faiss_ext_tpu.ops.rq import rq_decode, rq_encode, rq_train

    x = _clustered(1500, 16, seed=2)
    cb = np.asarray(rq_train(x, 4, 16))

    def err(beam):
        codes = rq_encode(x, cb, beam=beam)
        dec = np.asarray(rq_decode(codes, cb))
        return float(np.mean(np.sum((dec - x) ** 2, axis=1)))

    e1, e4 = err(1), err(4)
    assert e4 <= e1 + 1e-6, (e1, e4)


def test_rq_self_search(catalog):
    d, n = 16, 1200
    xb = _clustered(n, d, seed=3)
    dfx.faiss_create("rq", d, "RQ4x6", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "rq", catalog=catalog)
    res = dfx.faiss_search("rq", 5, xb[:10], catalog=catalog)
    assert (res["label"][:, 0] == np.arange(10)).sum() >= 8


def test_rq_recall_vs_oracle(catalog):
    d, n = 24, 4000
    xb = _clustered(n, d, ncent=32, seed=4)
    xq = xb[:64]
    dfx.faiss_create("rqo", d, "Flat", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "rqo", catalog=catalog)
    truth = dfx.faiss_search("rqo", 10, xq, catalog=catalog)["label"]
    dfx.faiss_create("rqr", d, "RQ6x8", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "rqr", catalog=catalog)
    got = dfx.faiss_search("rqr", 10, xq, catalog=catalog)["label"]
    hits = sum(len(set(g) & set(t)) for g, t in zip(got, truth))
    assert hits / truth.size > 0.6, hits / truth.size


def test_rq_save_load_and_composites(catalog, tmp_path):
    d, n = 16, 900
    xb = _clustered(n, d, seed=5)
    ids = np.arange(n, dtype=np.int64) * 3
    dfx.faiss_create("rqc", d, "IDMap,RQ4x4", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add((ids, xb), "rqc", catalog=catalog)
    before = dfx.faiss_search("rqc", 4, xb[:6], catalog=catalog)
    assert (before["label"][:, 0] == ids[:6]).sum() >= 5
    path = str(tmp_path / "rq.idx")
    dfx.faiss_save("rqc", path, catalog=catalog)
    dfx.faiss_load("rqc2", path, catalog=catalog)
    after = dfx.faiss_search("rqc2", 4, xb[:6], catalog=catalog)
    np.testing.assert_array_equal(before["label"], after["label"])
    np.testing.assert_allclose(before["distance"], after["distance"],
                               rtol=1e-6)


def test_rq_rflat_rerank(catalog):
    d, n = 16, 1000
    xb = _clustered(n, d, seed=6)
    dfx.faiss_create("rqrf", d, "RQ4x4,RFlat", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add(xb, "rqrf", catalog=catalog)
    res = dfx.faiss_search("rqrf", 3, xb[:8], catalog=catalog)
    # Exact re-rank on raw vectors: self-hit distance is (near) zero.
    assert (res["label"][:, 0] == np.arange(8)).all()
    np.testing.assert_allclose(res["distance"][:, 0], 0.0, atol=1e-4)


def test_rq_range_search(catalog):
    d, n = 8, 500
    xb = _clustered(n, d, seed=7)
    dfx.faiss_create("rqrange", d, "RQ2x6", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add(xb, "rqrange", catalog=catalog)
    res = dfx.faiss_range_search("rqrange", 0.5, xb[:4], catalog=catalog)
    lims, labels = res["lims"], res["label"]
    assert lims.shape == (5,)
    for q in range(4):
        seg = labels[lims[q]:lims[q + 1]]
        assert q in seg  # self within radius (decoded approx)


def test_rq_errors(catalog):
    with pytest.raises(dfx.errors.InvalidInputError, match="metric"):
        dfx.faiss_create("rqm", 8, "RQ2x4", metric_type="L1",
                         catalog=catalog)
    dfx.faiss_create("rqt", 8, "RQ2x8", catalog=catalog)
    with pytest.raises(dfx.errors.InvalidInputError, match="too small"):
        dfx.faiss_add(np.random.default_rng(0).standard_normal(
            (20, 8)).astype(np.float32), "rqt", catalog=catalog)


def test_ivf_rq_storage(catalog, tmp_path):
    """IVFn,RQMxb (IndexIVFResidualQuantizer analogue): residual codes in
    the inverted lists, decoded additively in every scan path."""
    d, n = 16, 3000
    xb = _clustered(n, d, ncent=16, seed=8, spread=0.2)
    dfx.faiss_create("ivfrq", d, "IVF8,RQ4x4", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add(xb, "ivfrq", catalog=catalog)
    res = dfx.faiss_search("ivfrq", 5, xb[:10], {"nprobe": "8"},
                           catalog=catalog)
    assert (res["label"][:, 0] == np.arange(10)).sum() >= 9
    # roundtrip
    path = str(tmp_path / "ivfrq.idx")
    dfx.faiss_save("ivfrq", path, catalog=catalog)
    dfx.faiss_load("ivfrq2", path, catalog=catalog)
    after = dfx.faiss_search("ivfrq2", 5, xb[:10], {"nprobe": "8"},
                             catalog=catalog)
    np.testing.assert_array_equal(res["label"], after["label"])
    # reconstruct decodes through the additive codec
    ix = catalog.get("ivfrq").index
    rec = ix.reconstruct(3)
    assert np.linalg.norm(rec - xb[3]) / np.linalg.norm(xb[3]) < 0.3


def test_ivf_rq_filtered(catalog):
    d, n = 16, 2000
    xb = _clustered(n, d, ncent=8, seed=9, spread=0.2)
    ids = np.arange(n, dtype=np.int64)
    dfx.faiss_create("ivfrqf", d, "IVF4,RQ2x6", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add((ids, xb), "ivfrqf", catalog=catalog)
    dfx.register_table("rqt", {"id": ids})
    res = dfx.faiss_search_filter("ivfrqf", 4, xb[:6], "id % 2 == 0",
                                  "id", "rqt", {"nprobe": "4"},
                                  catalog=catalog)
    got = res["label"]
    assert (got[got >= 0] % 2 == 0).all()


def test_rq_nbits_cap(catalog):
    """Codes are stored one uint8 per stage: >8 bits must be rejected, not
    silently wrapped mod 256 (review finding)."""
    with pytest.raises(dfx.errors.InvalidInputError, match="1-8 bits"):
        dfx.faiss_create("rq9", 8, "RQ2x9", catalog=catalog)
    with pytest.raises(dfx.errors.InvalidInputError, match="1-8 bits"):
        dfx.faiss_create("ivfrq9", 8, "IVF4,RQ2x9", catalog=catalog)


def test_ivf_rq_beam_param(catalog):
    """The beam create param reaches the IVF,RQ encoder (review finding:
    it was silently dropped)."""
    d, n = 8, 600
    xb = _clustered(n, d, seed=10)
    dfx.faiss_create_params("ivfrqb", d, "IVF4,RQ2x4", {"beam": "7"},
                            metric_type="L2", catalog=catalog)
    ix = catalog.get("ivfrqb").index
    assert ix.rq_beam == 7
    dfx.faiss_add(xb, "ivfrqb", catalog=catalog)   # encodes with beam=7
    res = dfx.faiss_search("ivfrqb", 3, xb[:5], {"nprobe": "4"},
                           catalog=catalog)
    # Coarse 2x4-bit codec: most self-hits survive.
    assert (res["label"][:, 0] == np.arange(5)).sum() >= 4
