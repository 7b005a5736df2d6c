"""Multi-chip sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from duckdb_faiss_ext_tpu.ops.flat_search import choose_chunk, flat_search
from duckdb_faiss_ext_tpu.parallel.sharded import (
    make_mesh, multichip_dryrun, sharded_flat_search_fn,
    sharded_kmeans_step_fn)

RNG = np.random.default_rng(31)


def test_sharded_search_matches_single_device():
    mesh = make_mesh(8, batch_axis=2)   # 4 corpus shards × 2 query shards
    d, cap, n, nq, k = 32, 1024, 1000, 16, 7
    xb = np.zeros((cap, d), np.float32)
    xb[:n] = RNG.standard_normal((n, d)).astype(np.float32)
    xq = RNG.standard_normal((nq, d)).astype(np.float32)

    ref_d, ref_p = flat_search(jnp.asarray(xb), n, jnp.asarray(xq), k, "L2")

    xb_s = jax.device_put(xb, NamedSharding(mesh, P("shard", None)))
    xq_s = jax.device_put(xq, NamedSharding(mesh, P("batch", None)))
    fn = sharded_flat_search_fn(
        mesh, k=k, metric="L2",
        chunk=choose_chunk(cap // 4, nq, d, "L2"))
    got_d, got_p = fn(xb_s, jnp.int32(n), xq_s, jnp.float32(0.0))

    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))


def test_sharded_search_similarity_metric():
    mesh = make_mesh(8, batch_axis=1)
    d, cap, n, nq, k = 16, 512, 512, 8, 4
    xb = RNG.standard_normal((cap, d)).astype(np.float32)
    xq = RNG.standard_normal((nq, d)).astype(np.float32)
    ref_d, ref_p = flat_search(jnp.asarray(xb), n, jnp.asarray(xq), k,
                               "INNER_PRODUCT")
    xb_s = jax.device_put(xb, NamedSharding(mesh, P("shard", None)))
    fn = sharded_flat_search_fn(mesh, k=k, metric="INNER_PRODUCT",
                                chunk=64)
    got_d, got_p = fn(xb_s, jnp.int32(n), jnp.asarray(xq), jnp.float32(0.0))
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))


def test_sharded_kmeans_step_matches_oracle():
    mesh = make_mesh(8, batch_axis=2)
    d, n, k = 8, 512, 4
    x = RNG.standard_normal((n, d)).astype(np.float32)
    cents = RNG.standard_normal((k, d)).astype(np.float32)

    # numpy oracle for one Lloyd step
    dist = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    lab = dist.argmin(1)
    expect = cents.copy()
    for c in range(k):
        if (lab == c).any():
            expect[c] = x[lab == c].mean(0)

    step = sharded_kmeans_step_fn(mesh, k=k)
    x_s = jax.device_put(x, NamedSharding(mesh, P(("shard", "batch"), None)))
    v_s = jax.device_put(np.ones(n, bool),
                         NamedSharding(mesh, P(("shard", "batch"))))
    got = np.asarray(step(x_s, v_s, jnp.asarray(cents)))
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-5)


def test_multichip_dryrun():
    multichip_dryrun(8)


def test_shard_entry_flat(catalog):
    import duckdb_faiss_ext_tpu as dfx

    xb = RNG.standard_normal((500, 16)).astype(np.float32)
    dfx.faiss_create("sh", 16, "Flat", metric_type="L2", catalog=catalog)
    dfx.faiss_add(xb, "sh", catalog=catalog)
    before = dfx.faiss_search("sh", 3, xb[:2], catalog=catalog)
    dfx.faiss_to_device("sh", catalog=catalog)   # shard over all devices
    entry = catalog.get("sh")
    assert entry.index._device_xb.sharding.is_fully_replicated is False
    after = dfx.faiss_search("sh", 3, xb[:2], catalog=catalog)
    np.testing.assert_array_equal(before["label"], after["label"])
