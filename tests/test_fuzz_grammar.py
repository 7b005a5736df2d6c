"""Grammar-wide conformance fuzz: every factory family through one uniform
sweep of invariants the family-specific tests check only locally.

For each family (seeded clustered data, full-effort search params):

* labels returned are valid ids (or the -1 pad) and unique per query;
* self-recall@10 with corpus rows as queries clears a per-family floor
  (1.0 for exact families, codec-appropriate floors for lossy ones);
* a bitmap selector is never violated (no masked-out label returned,
  including through IDMap label indirection and SOAR-style dup storage);
* save → load reproduces the exact same (label, distance) results
  (loaded+trained ⇒ immutable, src/faiss_extension.cpp:238 semantics).
"""

import numpy as np
import pytest

import duckdb_faiss_ext_tpu as dfx
from duckdb_faiss_ext_tpu.ops.selectors import BitmapSelector

# (factory, full-effort params, self-recall@10 floor)
FAMILIES = [
    ("Flat",               {},                     1.0),
    ("IDMap,Flat",         {},                     1.0),
    ("IDMap2,Flat",        {},                     1.0),
    ("SQfp16",             {},                     1.0),
    ("SQ8",                {},                     0.95),
    ("SQ6",                {},                     0.9),
    ("SQ4",                {},                     0.6),
    ("PQ4",                {},                     0.5),
    ("RQ2x4",              {},                     0.5),
    ("LSH32r",             {},                     0.3),
    ("IVF16,Flat",         {"nprobe": "16"},       1.0),
    ("IVF16,SQ8",          {"nprobe": "16"},       0.95),
    ("IVF16,PQ4",          {"nprobe": "16"},       0.5),
    ("IVF16,RQ2x4",        {"nprobe": "16"},       0.5),
    ("IMI2x2,Flat",        {"nprobe": "16"},       1.0),
    ("IVF16(HNSW8),Flat",  {"nprobe": "16"},       1.0),
    ("HNSW16",             {"efSearch": "128"},    1.0),   # exact regime
    ("NSG16",              {"search_L": "128"},    1.0),
    ("PCA8,Flat",          {},                     0.9),
    ("OPQ4_8,PQ4",         {},                     0.5),
    ("L2norm,Flat",        {},                     0.9),   # direction-only
    ("IVF16,PQ4,RFlat",    {"nprobe": "16", "k_factor": "4"}, 0.9),
]

#: the same invariants under INNER_PRODUCT (similarity ordering, the
#: metric split that flips mask fills and top-k direction everywhere)
IP_FAMILIES = [
    ("Flat",               {},                     1.0),
    ("IDMap,Flat",         {},                     1.0),
    ("SQ8",                {},                     0.9),
    ("PQ4",                {},                     0.4),
    ("IVF16,Flat",         {"nprobe": "16"},       1.0),
    # 0.35: spherical IP coarse training (faiss train_q1 parity) changes
    # the residual scales PQ4 quantizes — measured 0.375 after the switch
    # (nprobe=16/16 is exhaustive, so the floor is pure codec quality).
    ("IVF16,PQ4",          {"nprobe": "16"},       0.35),
    ("HNSW16",             {"efSearch": "128"},    1.0),
    ("L2norm,Flat",        {},                     1.0),
]

N, D, K, NQ = 1024, 16, 10, 32


def _data(seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((16, D)).astype(np.float32) * 4
    xb = (centers[rng.integers(0, 16, N)]
          + rng.standard_normal((N, D)).astype(np.float32) * 0.25)
    return xb


@pytest.mark.parametrize("factory,params,floor", FAMILIES,
                         ids=[f[0] for f in FAMILIES])
def test_family_conformance(catalog, tmp_path, factory, params, floor):
    _run_family(catalog, tmp_path, factory, params, floor, "L2", _data())


@pytest.mark.parametrize("factory,params,floor", FAMILIES,
                         ids=[f[0] + "-fast" for f in FAMILIES])
def test_family_conformance_fast_mode(catalog, tmp_path, factory, params,
                                      floor):
    """The same invariants under fast precision: exercises the bf16 scans,
    the in-chunk/opt-in reranks, and the int8 SQ paths (d=16 clears the
    int8 gate)."""
    dfx.set_precision("fast")
    try:
        _run_family(catalog, tmp_path, factory, params, floor, "L2",
                    _data())
    finally:
        dfx.set_precision("parity")


@pytest.mark.parametrize("factory,params,floor", IP_FAMILIES,
                         ids=[f[0] + "-IP" for f in IP_FAMILIES])
def test_family_conformance_ip(catalog, tmp_path, factory, params, floor):
    # normalized rows: self inner product is the max, so self-recall floors
    # transfer from the L2 sweep
    xb = _data(seed=12)
    xb /= np.linalg.norm(xb, axis=1, keepdims=True)
    _run_family(catalog, tmp_path, factory, params, floor,
                "INNER_PRODUCT", xb)


def _run_family(catalog, tmp_path, factory, params, floor, metric, xb):
    name = "fz"
    dfx.faiss_create(name, D, factory, metric_type=metric, catalog=catalog)
    if "IDMap" in factory:
        ids = np.arange(N, dtype=np.int64) * 3 + 7   # non-sequential labels
        dfx.faiss_add((ids, xb), name, catalog=catalog)
    else:
        ids = np.arange(N, dtype=np.int64)
        dfx.faiss_add(xb, name, catalog=catalog)

    xq = xb[:NQ]
    res = dfx.faiss_search(name, K, xq, params or None, catalog=catalog)

    # labels valid and unique per query
    valid = set(ids.tolist()) | {-1}
    for q in range(NQ):
        got = res["label"][q]
        assert set(got.tolist()) <= valid, f"{factory}: bogus label"
        real = got[got >= 0]
        assert len(set(real.tolist())) == len(real), f"{factory}: dup label"

    # self-recall@10 (query q's own id among its top-10)
    hits = np.mean([ids[q] in res["label"][q] for q in range(NQ)])
    assert hits >= floor, f"{factory}: self-recall {hits:.2f} < {floor}"

    # bitmap selector never violated (mask indexes the id space)
    flags = np.zeros(int(ids.max()) + 1, dtype=bool)
    flags[ids[::2]] = True                            # every other row
    sel = BitmapSelector.from_bool(flags)
    fres = dfx.faiss_search(name, K, xq, params or None, catalog=catalog,
                            selector=sel)
    for q in range(NQ):
        got = fres["label"][q]
        got = got[got >= 0]
        assert np.all(flags[got]), f"{factory}: selector violated"

    # save → load reproduces results exactly
    p = str(tmp_path / "fz.dfx")
    dfx.faiss_save(name, p, catalog=catalog)
    dfx.faiss_load("fz2", p, catalog=catalog)
    res2 = dfx.faiss_search("fz2", K, xq, params or None, catalog=catalog)
    np.testing.assert_array_equal(res["label"], res2["label"])
    np.testing.assert_allclose(res["distance"], res2["distance"],
                               rtol=1e-6, atol=1e-6)
