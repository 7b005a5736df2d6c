"""Harness tier tests: binomial k', filtered bench plumbing, datasets, TREC."""

import numpy as np
import pytest

import duckdb_faiss_ext_tpu as dfx
from duckdb_faiss_ext_tpu.harness import (recall_at_k, required_k,
                                          run_filtered_bench,
                                          synthetic_dataset)
from duckdb_faiss_ext_tpu.harness.filtered import prob_at_least
from duckdb_faiss_ext_tpu.harness.trec import write_trec_run


def test_required_k_properties():
    # Exactly the reference's semantics: smallest k with
    # P[Binom(k, p) >= want] >= 0.99 (go/main_test.go:104-128).
    k = required_k(10, 0.5)
    assert prob_at_least(10, k, 0.5) >= 0.99
    assert prob_at_least(10, k - 1, 0.5) < 0.99
    assert required_k(10, 1.0) == 10
    assert required_k(10, 0.01) > 1000


def test_filtered_bench_runs(catalog):
    xb, xq = synthetic_dataset(n=2000, d=16, nq=8, ncl=8, seed=1)
    ids = np.arange(2000)
    dfx.faiss_create("b", 16, "IDMap,Flat", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add((ids, xb), "b", catalog=catalog)
    db = dfx.Database()
    db.register("t", {"id": ids})
    results = run_filtered_bench("b", xq, "t", "id",
                                 passrates=(0.5,), want=5, catalog=catalog,
                                 database=db, iters=1)
    r = results[0]
    assert r.qps_post > 0 and r.qps_sel > 0 and r.qps_set > 0
    assert r.required_k >= 5


def test_recall_at_k():
    got = np.array([[1, 2, 3], [4, 5, 6]])
    gt = np.array([[1, 2, 9], [9, 9, 9]])
    assert recall_at_k(got, gt) == (2 + 0) / 6


def test_trec_run_file(catalog, tmp_path):
    xb, xq = synthetic_dataset(n=500, d=8, nq=3, ncl=4, seed=2)
    dfx.faiss_create("trec", 8, "Flat", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "trec", catalog=catalog)
    path = str(tmp_path / "run.txt")
    write_trec_run(path, "trec", ["q1", "q2", "q3"], xq, k=5,
                   catalog=catalog)
    lines = open(path).read().strip().splitlines()
    assert len(lines) == 15
    parts = lines[0].split()
    assert parts[0] == "q1" and parts[1] == "Q0" and parts[3] == "1"


def test_load_errors(catalog, tmp_path):
    import duckdb_faiss_ext_tpu as dfx2

    with pytest.raises(dfx2.InvalidInputError, match="Could not read"):
        dfx2.faiss_load("x", str(tmp_path / "missing.dfx"), catalog=catalog)
    bad = tmp_path / "bad.dfx"
    bad.write_bytes(b"not an index")
    with pytest.raises(dfx2.InvalidInputError):
        dfx2.faiss_load("x", str(bad), catalog=catalog)
    # npz without our header
    import numpy as np2
    with open(tmp_path / "plain.npz", "wb") as f:
        np2.savez(f, a=np2.zeros(3))
    with pytest.raises(dfx2.InvalidInputError, match="not a saved index"):
        dfx2.faiss_load("x", str(tmp_path / "plain.npz"), catalog=catalog)


def test_load_duplicate_name(catalog, tmp_path):
    """Documented deviation: accurate 'already exists' error (the reference
    emits an inverted 'Could not find index' message here, SURVEY §7)."""
    import duckdb_faiss_ext_tpu as dfx2

    dfx2.faiss_create("dupl", 4, "Flat", catalog=catalog)
    dfx2.faiss_add(np.zeros((4, 4), np.float32), "dupl", catalog=catalog)
    p = str(tmp_path / "d.dfx")
    dfx2.faiss_save("dupl", p, catalog=catalog)
    with pytest.raises(dfx2.InvalidInputError, match="already exists"):
        dfx2.faiss_load("dupl", p, catalog=catalog)


def test_catalog_churn(catalog):
    import duckdb_faiss_ext_tpu as dfx2

    for i in range(30):
        dfx2.faiss_create("churn", 4, "Flat", catalog=catalog)
        dfx2.faiss_add(np.ones((8, 4), np.float32) * i, "churn",
                       catalog=catalog)
        dfx2.faiss_destroy("churn", catalog=catalog)
    assert "churn" not in catalog.names()


def test_autotune_ivf(catalog):
    """Autotune (ParameterSpace/OperatingPoints analogue): the nprobe sweep
    on clustered data yields monotone-ish recall, a Pareto frontier, and a
    cheapest setting reaching the target."""
    from duckdb_faiss_ext_tpu.harness import autotune_index

    rng = np.random.default_rng(3)
    centers = rng.standard_normal((32, 16)).astype(np.float32) * 5
    xb = (centers[rng.integers(0, 32, 6000)]
          + rng.standard_normal((6000, 16)).astype(np.float32) * 0.2)
    dfx.faiss_create("tune", 16, "IVF32,Flat", metric_type="L2",
                     catalog=catalog)
    dfx.faiss_add(xb, "tune", catalog=catalog)
    res = autotune_index("tune", xb[:64], k=10, target_recall=0.95,
                         catalog=catalog, repeat=1)
    assert len(res.points) == 6                      # nprobe 1,2,...,32
    assert res.points[-1].recall == 1.0              # exhaustive == GT
    assert res.best is not None and res.best.recall >= 0.95
    # the exhaustive point always survives Pareto filtering
    assert res.points[-1].pareto
    assert "nprobe" in str(res)


def test_autotune_knobless_and_graph(catalog):
    """Flat has no knob (one exhaustive point); HNSW sweeps efSearch against
    its exact scan."""
    from duckdb_faiss_ext_tpu.harness import autotune_index

    rng = np.random.default_rng(4)
    xb = rng.standard_normal((2000, 8)).astype(np.float32)
    dfx.faiss_create("tflat", 8, "Flat", catalog=catalog)
    dfx.faiss_add(xb, "tflat", catalog=catalog)
    res = autotune_index("tflat", xb[:16], k=5, catalog=catalog, repeat=1)
    assert len(res.points) == 1 and res.points[0].recall == 1.0
    assert res.best is res.points[0]

    dfx.faiss_create("thnsw", 8, "HNSW16", metric_type="L2", catalog=catalog)
    idx = catalog.get("thnsw").index
    idx.ann_threshold = 500
    dfx.faiss_add(xb, "thnsw", catalog=catalog)
    res = autotune_index("thnsw", xb[:16], k=5, target_recall=0.8,
                         catalog=catalog, repeat=1)
    assert len(res.points) == 7                      # efSearch 16..1024
    assert res.best is not None and res.best.recall >= 0.8


def test_cpu_filtered_baseline_column():
    """The reference's VSS/plain-SQL comparison column analogue: scaled
    CPU brute-force filtered scan, wired through run_filtered_bench."""
    from duckdb_faiss_ext_tpu.harness.filtered import cpu_filtered_baseline

    rng = np.random.default_rng(0)
    xq = rng.standard_normal((8, 32)).astype(np.float32)
    qps = cpu_filtered_baseline(32, 100_000, xq, want=5, passrate=0.5,
                                sample=4096, iters=2)
    assert qps > 0
    # scaling: doubling n_total halves the scaled qps
    qps2 = cpu_filtered_baseline(32, 200_000, xq, want=5, passrate=0.5,
                                 sample=4096, iters=2)
    assert 0.3 < qps2 / qps < 0.7
