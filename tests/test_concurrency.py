"""Thread-safety: concurrent adds and searches.

The reference is exercised by DuckDB's multi-threaded pipelines with mutex
discipline (SURVEY.md §2.3); here searches run on immutable device buffers
and mutations serialise on the per-entry lock — this test hammers both."""

import threading

import numpy as np

import duckdb_faiss_ext_tpu as dfx

RNG = np.random.default_rng(55)


def test_concurrent_adds_and_searches(catalog):
    d = 16
    dfx.faiss_create("conc", d, "Flat", metric_type="L2", catalog=catalog)
    dfx.faiss_add(RNG.random((100, d), dtype=np.float32), "conc",
                  catalog=catalog)

    n_threads, batches, batch = 8, 5, 50
    errors = []

    def adder():
        try:
            for _ in range(batches):
                dfx.faiss_add(RNG.random((batch, d), dtype=np.float32),
                              "conc", catalog=catalog)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    def searcher():
        try:
            for _ in range(10):
                res = dfx.faiss_search(
                    "conc", 5, RNG.random((4, d), dtype=np.float32),
                    catalog=catalog)
                assert res.shape == (4, 5)
                assert (res["label"] >= -1).all()
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = ([threading.Thread(target=adder) for _ in range(n_threads // 2)]
               + [threading.Thread(target=searcher)
                  for _ in range(n_threads // 2)])
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors, errors
    entry = catalog.get("conc")
    assert entry.index.ntotal == 100 + (n_threads // 2) * batches * batch


def test_balanced_kmeans_reduces_skew():
    from duckdb_faiss_ext_tpu.ops.kmeans import kmeans_fit

    # Heavily skewed data: 90% of points in one tight blob.
    d, n, k = 8, 4000, 16
    blob = RNG.standard_normal((1, d)).astype(np.float32) * 3
    rest = RNG.standard_normal((n // 10, d)).astype(np.float32) * 4
    x = np.concatenate([
        blob + 0.05 * RNG.standard_normal((n - n // 10, d)).astype(np.float32),
        rest])

    _, lab_plain = kmeans_fit(x, k, niter=10, balance=0.0)
    _, lab_bal = kmeans_fit(x, k, niter=10, balance=1.0)
    max_plain = np.bincount(np.asarray(lab_plain), minlength=k).max()
    max_bal = np.bincount(np.asarray(lab_bal), minlength=k).max()
    assert max_bal < max_plain, (max_plain, max_bal)
