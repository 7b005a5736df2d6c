"""Skew-aware IVF list placement: work-spread measurement (VERDICT #6).

Uses the REAL frozen-marco skew (pass-A counts cache: max list 7,488 vs
avg 2,159 over nlist=4096) and the real frozen centroids + GT queries to
compare per-shard scan work under (a) contiguous list blocks (the
round-4 placement) vs (b) balanced_list_partition (LPT by Σcounts).

Work model: the padded sharded layout scans ``lmax`` slots for every
(query, probed owned list) pair, so per-shard scan time ∝ the number of
probed owned pairs.  Also reported: per-shard Σcounts (the balance
objective) and an 8-virtual-device CPU-mesh wall-clock A/B through the
real sharded_ivf_search_fn on a matching synthetic skewed layout.

Runs entirely on CPU — no TPU needed.

Usage:
  env XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/skew_placement_eval.py
"""

from __future__ import annotations

import glob
import time

import numpy as np


def spread(loads: np.ndarray) -> float:
    return float(loads.max() / max(loads.mean(), 1e-9))


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")

    from duckdb_faiss_ext_tpu.parallel.sharded import balanced_list_partition

    z = np.load(glob.glob("/root/repo/.marco_passA_*_un_ip2_h*.npz")[0])
    cents = np.load(glob.glob("/root/repo/.marco_cents_*_IP_un.npz")[0])[
        "centroids"]
    counts, xq = z["counts"].astype(np.int64), z["xq"].astype(np.float32)
    nlist = counts.shape[0]
    nshards, nprobe = 8, 16
    npl = nlist // nshards
    print(f"marco skew: nlist {nlist}, avg {counts.mean():.0f}, "
          f"max {counts.max()}, queries {xq.shape[0]}", flush=True)

    # real probe distribution (IP coarse assignment, numpy)
    score = xq @ cents.T
    probe = np.argsort(-score, axis=1)[:, :nprobe]

    perm = balanced_list_partition(counts, nshards)
    shard_of_bal = np.empty(nlist, np.int32)
    for s in range(nshards):
        shard_of_bal[perm[s * npl:(s + 1) * npl]] = s
    shard_of_con = np.arange(nlist) // npl

    # Worst-case ordering: hot lists packed first (count-sorted index).
    # k-means happens to scatter marco's hot lists across index order, so
    # plain contiguous looks fine HERE — the sorted ordering shows the
    # failure mode the balanced placement guarantees against (any
    # relabeling/compaction of lists can produce it).
    hot_first = np.argsort(-counts, kind="stable")
    shard_of_hot = np.empty(nlist, np.int32)
    shard_of_hot[hot_first] = np.arange(nlist) // npl

    for name, shard_of in (("contiguous", shard_of_con),
                           ("hot-first", shard_of_hot),
                           ("balanced", shard_of_bal)):
        loads = np.bincount(shard_of, weights=counts, minlength=nshards)
        pairs = np.bincount(shard_of[probe.reshape(-1)], minlength=nshards)
        print(f"{name:>11}: sum-counts spread {spread(loads):.3f}  "
              f"probed-pairs spread {spread(pairs):.3f}  "
              f"(per-shard pairs {pairs.tolist()})", flush=True)

    # CPU-mesh wall-clock A/B: same skew shape, synthetic small payload.
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from duckdb_faiss_ext_tpu.parallel.sharded import (make_mesh,
                                                       sharded_ivf_search_fn)

    d, lmax, k = 64, 64, 10
    rng = np.random.default_rng(0)
    mesh = make_mesh(8, batch_axis=1)
    # shrink the real skew to a (nlist, lmax, d) layout: counts scaled to
    # lmax, centroids random at d=64 but PROBE FREQUENCY replayed from
    # the real distribution via a lookup of the real probe table.
    counts_s = np.minimum((counts * lmax / counts.max()), lmax).astype(
        np.int32)
    payload = rng.standard_normal((nlist, lmax, d)).astype(np.float32)
    row_pos = np.arange(nlist * lmax, dtype=np.int32).reshape(nlist, lmax)
    cents_s = rng.standard_normal((nlist, d)).astype(np.float32)
    # queries steered to reproduce the real probe sets: query q's vector
    # is the mean of its real probed centroids (soft steering — the
    # resulting probe sets share most of the hot lists).
    xq_s = cents_s[probe].mean(axis=1) + 0.01 * rng.standard_normal(
        (xq.shape[0], d)).astype(np.float32)
    nq_pad = 256
    xq_pad = np.ascontiguousarray(xq_s[:nq_pad], np.float32)

    fn = sharded_ivf_search_fn(mesh, k=k, nprobe=nprobe, metric="L2",
                               q_chunk=8)

    def place(order):
        return (
            jax.device_put(payload[order],
                           NamedSharding(mesh, P("shard", None, None))),
            jax.device_put(counts_s[order],
                           NamedSharding(mesh, P("shard"))),
            jax.device_put(row_pos[order],
                           NamedSharding(mesh, P("shard", None))),
            jnp.asarray(cents_s[order]),
            jax.device_put(xq_pad, NamedSharding(mesh, P("batch", None))),
            jnp.float32(0.0),
        )

    for name, order in (("contiguous", np.arange(nlist)),
                        ("balanced", perm)):
        args = place(order)
        jax.block_until_ready(fn(*args))
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*args))
            best = min(best, time.perf_counter() - t0)
        print(f"cpu-mesh {name:>11}: {best * 1e3:7.1f} ms/call", flush=True)
    print("SKEW-PLACEMENT-EVAL COMPLETE", flush=True)


if __name__ == "__main__":
    main()
