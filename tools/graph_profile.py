"""Microprofile of the graph-walk iteration on the real chip.

Times each component of a walk step at serving shape (B=1024, N=512k,
d=96, deg=64, width=8): neighbour-list gather, vector gather, batched
scoring, dedup masks, top-k merge, and the end-to-end jitted walk — to
locate the bottleneck (XLA row gather is the prime suspect; see the
perf-findings memory).

    env PYTHONPATH=/root/repo:/root/.axon_site python tools/graph_profile.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def sync(x):
    # Through the relay block_until_ready is a no-op: fetch one element.
    return float(np.asarray(jnp.reshape(x, (-1,))[0]))


def _bounded(fn, timeout_s):
    """Run fn in a daemon thread with a join timeout: a relay hang (any raw
    device call can block forever during an outage) skips the case instead
    of eating the whole profile budget."""
    import threading

    out, err = [], []

    def run():
        try:
            out.append(fn())
        except BaseException as e:  # noqa: BLE001 — reported by caller
            err.append(e)

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        raise TimeoutError(f"hung > {timeout_s}s")
    if err:
        raise err[0]
    return out[0]


def bench(label, fn, reps=5, compile_timeout=420):
    # The relay occasionally drops or hangs a remote compile; retry once
    # with a bounded wait, then skip the case rather than abort the run.
    for attempt in (1, 2):
        try:
            _bounded(fn, compile_timeout)   # compile
            _bounded(lambda: sync(fn()), compile_timeout)
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                sync(fn())
                best = min(best, time.perf_counter() - t0)
            print(f"  {label:42s} {best*1e3:8.2f} ms", flush=True)
            return best
        except Exception as e:  # noqa: BLE001
            print(f"  {label:42s} attempt {attempt} FAILED: "
                  f"{type(e).__name__} {str(e)[:80]}", flush=True)
            time.sleep(20)
    return float("nan")


def main():
    B, N, d, deg, W, pool = 1024, 1 << 19, 96, 64, 8, 64
    M = W * deg
    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((N, d)).astype(np.float32))
    graph = jnp.asarray(rng.integers(0, N, (N, deg)).astype(np.int32))
    xq = jnp.asarray(rng.standard_normal((B, d)).astype(np.float32))
    fids = jnp.asarray(rng.integers(0, N, (B, W)).astype(np.int32))
    cids = jnp.asarray(rng.integers(0, N, (B, M)).astype(np.int32))
    pids = jnp.asarray(rng.integers(0, N, (B, pool)).astype(np.int32))
    pscore = jnp.asarray(rng.standard_normal((B, pool)).astype(np.float32))

    print(f"B={B} N={N} d={d} deg={deg} width={W} pool={pool}", flush=True)
    rtt = bench("rtt floor (1-elem fetch)", lambda: jnp.zeros(8))

    nbr = jax.jit(lambda f: jnp.take(graph, f, axis=0))
    bench("neighbour-list gather (B*W rows of deg)", lambda: nbr(fids))

    vg = jax.jit(lambda c: jnp.take(xb, c, axis=0))
    bench("vector gather (B*M rows of d)", lambda: vg(cids))

    vecs = vg(cids)
    sc = jax.jit(lambda q, v: jnp.einsum(
        "bd,bmd->bm", q, v, preferred_element_type=jnp.float32))
    bench("batched einsum scores (B,M)", lambda: sc(xq, vecs))

    def gather_score(q, c):
        v = jnp.take(xb, c, axis=0)
        return jnp.einsum("bd,bmd->bm", q, v,
                          preferred_element_type=jnp.float32)
    gs = jax.jit(gather_score)
    bench("fused gather+score", lambda: gs(xq, cids))

    def dedup(c, p):
        in_pool = (c[:, :, None] == p[:, None, :]).any(-1)
        earlier = (c[:, :, None] == c[:, None, :])
        earlier &= jnp.tril(jnp.ones((M, M), bool), k=-1)[None]
        return jnp.logical_or(in_pool, earlier.any(-1))
    dd = jax.jit(dedup)
    bench("dedup masks (pairwise id equality)", lambda: dd(cids, pids))

    def dedup_sorted(c, p):
        in_pool = (c[:, :, None] == p[:, None, :]).any(-1)
        order = jnp.argsort(c, axis=1)
        s = jnp.take_along_axis(c, order, axis=1)
        adj = jnp.concatenate(
            [jnp.zeros((B, 1), bool), s[:, 1:] == s[:, :-1]], axis=1)
        dup = jnp.zeros((B, M), bool).at[
            jnp.arange(B)[:, None], order].set(adj)
        return jnp.logical_or(in_pool, dup)
    ds = jax.jit(dedup_sorted)
    bench("dedup masks (sort-based)", lambda: ds(cids, pids))

    cscore = jnp.asarray(rng.standard_normal((B, M)).astype(np.float32))

    def merge(ps, pi, cs, ci):
        all_s = jnp.concatenate([ps, cs], axis=1)
        all_i = jnp.concatenate([pi, ci], axis=1)
        s, sel = lax.top_k(all_s, pool)
        return s, jnp.take_along_axis(all_i, sel, axis=1)
    mg = jax.jit(merge)
    bench("top-k merge (pool+M -> pool)", lambda: mg(pscore, pids, cscore,
                                                     cids)[0])

    from duckdb_faiss_ext_tpu.ops.graph import graph_search, pack_neighbors

    # deg=32 pack (3.2 GB) — the production choice under the 6 GB budget
    # (a 6.4 GB deg-64 pack RESOURCE_EXHAUSTEDs on this chip).
    graph32 = graph[:, :32]
    pack = pack_neighbors(xb, graph32)
    sync(pack)
    bp = jax.jit(lambda f: jnp.take(pack, f, axis=0))
    bench("packed block gather (B*W blocks of 32*d)", lambda: bp(fids))

    for w, it in ((8, 9), (8, 4), (16, 4)):
        bench(f"scattered walk deg64 pool=64 width={w} iters={it}",
              lambda w=w, it=it: graph_search(
                  xb, graph, xq, N, 10, "L2", pool=64, width=w, iters=it,
                  precision=lax.Precision.DEFAULT)[0], reps=3)
    for w, it in ((8, 9), (8, 4), (16, 4), (16, 8)):
        bench(f"packed walk deg32 pool=64 width={w} iters={it}",
              lambda w=w, it=it: graph_search(
                  xb, graph32, xq, N, 10, "L2", pool=64, width=w, iters=it,
                  pack=pack, precision=lax.Precision.DEFAULT)[0], reps=3)

    # bf16 variants of the scattered gather
    xb16 = xb.astype(jnp.bfloat16)
    vg16 = jax.jit(lambda c: jnp.take(xb16, c, axis=0))
    bench("vector gather bf16 (B*M rows)", lambda: vg16(cids))


if __name__ == "__main__":
    main()
