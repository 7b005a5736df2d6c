"""Standalone repro of the 8.8M sq6-serving graph-walk compile failure.

marco_graph phase 5 fails to compile at every batch with the full error
truncated by the sweep's except clause.  This reproduces the exact
shapes with device-generated random data (no build, ~1 min) and lets
the error print whole.  JAX_TRACEBACK_FILTERING=off recommended.

Usage:
  env PYTHONPATH=/root/repo:/root/.axon_site JAX_TRACEBACK_FILTERING=off \
      python tools/walk_debug.py [--n 8841823] [--deg 64] [--codec sq6]
"""

from __future__ import annotations

import argparse
import functools
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8_841_823)
    ap.add_argument("--d", type=int, default=1536)
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--deg", type=int, default=64)
    ap.add_argument("--codec", default="sq6", choices=["sq8", "sq6"])
    ap.add_argument("--nq", type=int, default=48)
    ap.add_argument("--pool", type=int, default=16)
    ap.add_argument("--width", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from duckdb_faiss_ext_tpu.ops.graph import graph_search
    from duckdb_faiss_ext_tpu.ops.sq import SQ_LEVELS

    n, d = args.n, args.d
    nchunks = -(-n // args.chunk)
    n_pad = nchunks * args.chunk
    w = d if args.codec == "sq8" else 3 * (d // 4)
    key = jax.random.PRNGKey(0)

    t0 = time.time()

    # chunked generation: one whole-array randint materialises an i32
    # intermediate 4x the u8 buffer (38 GB at this shape)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def gen_chunk(buf, i):
        ch = jax.random.randint(jax.random.fold_in(key, i),
                                (args.chunk, w), 0, 255, jnp.int32) \
            .astype(jnp.uint8)
        return jax.lax.dynamic_update_slice(buf, ch, (i * args.chunk, 0))

    codes = jnp.zeros((n_pad, w), jnp.uint8)
    for i in range(nchunks):
        codes = gen_chunk(codes, jnp.int32(i))
    # Lane-folded adjacency, generated folded (an (N, 64) int32 gather
    # operand makes XLA pad it 64->128 lanes — the +2.1 GiB copy behind
    # the 2026-08-21 compile OOM; see walk_scan deg kwarg).
    fold = max(1, 128 // args.deg) if 128 % args.deg == 0 else 1
    adj = jax.random.randint(key, (n_pad // fold, fold * args.deg),
                             0, n, jnp.int32)
    xq = jax.random.normal(key, (args.nq, d), jnp.float32)
    vmin = jnp.full((d,), -0.1, jnp.float32)
    scale = jnp.full((d,), 0.2 / SQ_LEVELS[args.codec], jnp.float32)
    np.asarray(adj[0, :1])
    print(f"operands on device: {time.time()-t0:.1f}s "
          f"(codes {codes.nbytes/2**30:.2f} GiB + adj "
          f"{adj.nbytes/2**30:.2f} GiB, fold {fold})", flush=True)

    t0 = time.time()
    s, p = graph_search(codes, adj, xq, n, 10, "INNER_PRODUCT",
                        pool=args.pool, width=args.width,
                        codec=args.codec, vmin=vmin, scale=scale,
                        deg=args.deg)
    np.asarray(p[:1])
    print(f"WALK COMPILE+RUN OK: {time.time()-t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
