"""Sharded search and training over a device mesh.

The reference's scaling story is OpenMP threads + BLAS on one node
(SURVEY.md §2.3); the TPU rebuild scales by partitioning the corpus across
devices and merging per-shard top-k results with XLA collectives over
ICI/DCN:

* mesh axes: ``shard`` partitions corpus rows; ``batch`` partitions the
  query batch.  Every device scans its corpus shard for its query sub-batch.
* per-shard scan = the same fused distance+top-k kernel as single-chip
  (ops/flat_search.search_scan) with a global row offset;
* merge = all_gather of (k per shard) candidates over ``shard`` + one more
  top-k — k·S values per query cross the interconnect instead of the corpus.

Training (k-means) shards the assignment over data and reduces the centroid
update with psum over both axes — the distributed Lloyd's step of
SURVEY.md §2.2.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..ops.flat_search import choose_chunk, finalize_scores, search_scan
from ..ops.kmeans import assign_labels, centroid_update


def make_mesh(n_devices: int | None = None, batch_axis: int = 1,
              devices=None) -> Mesh:
    """2-D mesh (shard × batch) over the first n_devices local devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % batch_axis != 0:
        raise ValueError(f"{n} devices not divisible by batch_axis={batch_axis}")
    import numpy as np

    dev_array = np.array(devices).reshape(n // batch_axis, batch_axis)
    return Mesh(dev_array, ("shard", "batch"))


def sharded_flat_search_fn(mesh: Mesh, *, k: int, metric: str, chunk: int,
                           precision=lax.Precision.DEFAULT, has_mask=False):
    """Build the jitted sharded search step for a given mesh/config.

    Signature of the returned fn:
        (xb (cap, d) sharded P('shard', None),
         nvalid scalar,
         xq (nq, d) sharded P('batch', None),
         mask (cap,) sharded P('shard') or None,
         metric_arg scalar)
        → (distances (nq, k), positions (nq, k)) sharded P('batch', None)
    """
    mask_spec = (P("shard"),) if has_mask else ()

    def local(xb, nvalid, xq, *rest):
        if has_mask:
            mask, metric_arg = rest
        else:
            (metric_arg,) = rest
            mask = None
        shard_idx = lax.axis_index("shard")
        cap_local = xb.shape[0]
        offset = (shard_idx * cap_local).astype(jnp.int32)
        qb = min(xq.shape[0], 256)
        if xq.shape[0] % qb:
            qb = xq.shape[0]
        scores, pos = search_scan(
            xb, nvalid, xq, mask, metric_arg, offset,
            k=k, metric=metric, q_block=qb, c_block=chunk,
            precision=precision)
        # Merge across corpus shards: k candidates per shard per query.
        all_scores = lax.all_gather(scores, "shard")   # (S, nq_l, k)
        all_pos = lax.all_gather(pos, "shard")
        s, nq_l, _ = all_scores.shape
        cat_s = jnp.transpose(all_scores, (1, 0, 2)).reshape(nq_l, s * k)
        cat_p = jnp.transpose(all_pos, (1, 0, 2)).reshape(nq_l, s * k)
        merged_s, sel = lax.top_k(cat_s, k)
        merged_p = jnp.take_along_axis(cat_p, sel, axis=1)
        return finalize_scores(merged_s, merged_p, metric)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P("shard", None), P(), P("batch", None)) + mask_spec + (P(),),
        out_specs=(P("batch", None), P("batch", None)),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_kmeans_step_fn(mesh: Mesh, *, k: int,
                           precision=lax.Precision.DEFAULT):
    """One distributed Lloyd iteration: data sharded over (shard, batch),
    centroids replicated; updates reduced with psum over both axes."""

    def local(x, valid, centroids):
        labels = assign_labels(x, centroids, precision)
        w = valid.astype(x.dtype)
        sums, counts = centroid_update(x, labels, k, weights=w)
        sums = lax.psum(sums, ("shard", "batch"))
        counts = lax.psum(counts, ("shard", "batch"))
        new = sums / jnp.maximum(counts, 1.0)[:, None]
        return jnp.where((counts > 0)[:, None], new, centroids)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(("shard", "batch"), None), P(("shard", "batch")),
                  P(None, None)),
        out_specs=P(None, None),
        check_vma=False,
    )
    return jax.jit(fn)


def multichip_dryrun(n_devices: int) -> None:
    """Compile + run one sharded search step and one sharded k-means training
    step on tiny shapes over an n_devices mesh (driver validation hook)."""
    import numpy as np

    batch_axis = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    mesh = make_mesh(n_devices, batch_axis=batch_axis)
    n_shard = n_devices // batch_axis

    d, k = 32, 4
    cap = 64 * n_shard
    nq = 8 * batch_axis
    rng = np.random.default_rng(0)
    xb = rng.standard_normal((cap, d)).astype(np.float32)
    xq = rng.standard_normal((nq, d)).astype(np.float32)

    xb_s = jax.device_put(xb, NamedSharding(mesh, P("shard", None)))
    xq_s = jax.device_put(xq, NamedSharding(mesh, P("batch", None)))

    search = sharded_flat_search_fn(
        mesh, k=k, metric="L2", chunk=choose_chunk(cap // n_shard, nq, d, "L2"))
    dist, pos = search(xb_s, jnp.int32(cap - 3), xq_s, jnp.float32(0.0))
    jax.block_until_ready((dist, pos))
    assert dist.shape == (nq, k) and pos.shape == (nq, k)
    # Cross-check against a local brute-force oracle.
    ref = np.sum((xq[:, None, :] - xb[None, : cap - 3, :]) ** 2, axis=-1)
    ref_best = np.sort(ref, axis=1)[:, :k]
    np.testing.assert_allclose(np.asarray(dist), ref_best, rtol=1e-3,
                               atol=1e-3)

    nclusters = 8
    cents = jnp.asarray(rng.standard_normal((nclusters, d)).astype(np.float32))
    step = sharded_kmeans_step_fn(mesh, k=nclusters)
    valid = jax.device_put(np.ones((cap,), bool),
                           NamedSharding(mesh, P(("shard", "batch"))))
    x_flat = jax.device_put(xb, NamedSharding(mesh, P(("shard", "batch"),
                                                      None)))
    new_cents = step(x_flat, valid, cents)
    jax.block_until_ready(new_cents)
    assert new_cents.shape == (nclusters, d)
