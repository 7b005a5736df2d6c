"""Headline benchmark: Flat exact search QPS/chip at SIFT1M scale.

Workload: BASELINE.json config 2 — corpus 1M × 128-dim fp32 (CLUSTERED,
harness.datasets.synthetic_dataset, queries drawn near corpus clusters so
the supplementary IVF recall@10 is meaningful — a uniform-random corpus
makes any ANN recall number meaningless), query batch 48, k=10, fused
distance+top-k through the public API (the reference's hot path,
Index::search via src/faiss_extension.cpp:629-638).

Prints ONE JSON line to stdout: {"metric", "value", "unit", "vs_baseline"}
plus supplementary fields {"pipelined_qps", "ivf_qps", "ivf_recall"} so the
recorded artifact carries the serving-path and ANN numbers, not only the
RTT-floored synchronous b48 point.  Details (large-batch QPS, build-rate
decomposition) go to stderr.

vs_baseline: ratio against a CPU brute-force stand-in for the reference's
FAISS-CPU path (BLAS sgemm + partial select via numpy), measured on this
host on a corpus subsample and scaled linearly to the full corpus size —
the reference publishes no absolute numbers (BASELINE.md).
"""

import json
import sys
import time

import numpy as np

N, D, K = 1_000_000, 128, 10
BATCH = 48
BIG_BATCH = 1024
BASELINE_SUBSAMPLE = 131_072


def _cfg():
    from duckdb_faiss_ext_tpu.utils.config import config
    return config


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def device_alive(timeout_s=120, attempts=3) -> bool:
    """Bounded-wait device probe.  The tunneled runtime occasionally goes
    unresponsive for stretches (observed: a 256² matmul round-trip hanging
    >120 s); a raw device call then blocks forever and would eat the whole
    bench budget.  Probe in a daemon thread so a hang is detected and the
    bench exits with a clear error instead."""
    import threading

    ok: list[float] = []
    err: list[BaseException] = []

    def probe():
        try:
            import jax.numpy as jnp

            ok.append(float(np.asarray(
                jnp.ones((8, 8)) @ jnp.ones((8, 8)))[0][0]))
        except BaseException as e:  # noqa: BLE001 — reported, not hidden
            err.append(e)

    for i in range(attempts):
        t = threading.Thread(target=probe, daemon=True)
        t.start()
        t.join(timeout_s)
        if ok:
            return True
        if err:
            log(f"device probe attempt {i + 1}/{attempts} failed: "
                f"{type(err[-1]).__name__}: {err[-1]}")
            err.clear()
        else:
            log(f"device probe attempt {i + 1}/{attempts} timed out "
                f"({timeout_s}s): relay unresponsive")
    return False


def measure_rtt(reps=7):
    """Per-call relay round-trip floor, milliseconds: median of tiny
    fetches after warmup.  Recorded in the JSON line so a QPS swing
    between rounds is attributable to relay drift vs a code change from
    the artifact alone (the r01->r02 -33% pipelined swing was relay
    sickness, indistinguishable at the time)."""
    import jax.numpy as jnp

    x = jnp.ones((8, 8))
    np.asarray(x @ x)                                   # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(x @ x)
        ts.append((time.perf_counter() - t0) * 1e3)
    ts.sort()
    return ts[len(ts) // 2]


def measure_compute(reps=3):
    """Compute-side probe, milliseconds: 20 chained 4096² bf16 matmuls
    fetched once (~1.4 TFLOP — big enough that chip CONTENTION from a
    concurrently running process dominates the reading, unlike the RTT
    probe, which stayed healthy while BENCH_r03 was captured 2-3× slow
    against a busy chip)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(x):
        y = x
        for _ in range(20):
            y = y @ x
            y = y / jnp.max(jnp.abs(y))
        return y[0, 0]

    x = jnp.ones((4096, 4096), jnp.bfloat16) * jnp.bfloat16(1e-3)
    float(chain(x))                                     # warm/compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(x))
        ts.append((time.perf_counter() - t0) * 1e3)
    return min(ts)


class ChipLock:
    """Advisory flock shared with tools/ chain scripts so the driver's
    bench capture never races a measurement chain on the one chip (the
    BENCH_r03 failure mode).  Chains wrap each step in
    `flock /root/repo/.chip.lock -c <step>`; bench waits for the lock."""

    PATH = None  # set below, next to this file

    def __init__(self, wait_s=900):
        self.wait_s = wait_s
        self.fd = None

    def acquire(self):
        import fcntl

        if os.environ.get("DFX_CHIP_LOCK_HELD"):
            # invoked under tools/chiplock.sh — the parent already holds
            # the flock; trying to take it again deadlocks until the
            # step timeout (chain1/chain2 bench rc=124, 2026-08-20)
            return True
        self.fd = open(self.PATH, "w")
        deadline = time.time() + self.wait_s
        while True:
            try:
                fcntl.flock(self.fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                return True
            except OSError:
                if time.time() > deadline:
                    log(f"chip lock still held after {self.wait_s}s — "
                        "proceeding anyway (flagged chip_lock_busy)")
                    return False
                time.sleep(5)

    def release(self):
        if self.fd is not None:
            self.fd.close()
            self.fd = None


def bench_api(dfx, cat, name, queries, params=None, iters=10, groups=3):
    """Best-of-N measurement groups: the tunneled runtime's round-trip
    latency drifts between runs, so a single group under-reports."""
    dfx.faiss_search(name, K, queries, params, catalog=cat)  # warmup
    best = 0.0
    for _ in range(groups):
        t0 = time.perf_counter()
        for _ in range(iters):
            dfx.faiss_search(name, K, queries, params, catalog=cat)
        dt = (time.perf_counter() - t0) / iters
        best = max(best, queries.shape[0] / dt)
    return best


def measure_tpu(xb, xq, xq_big, cached_rtt=None):
    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.catalog import Catalog

    start = time.perf_counter()
    dfx.set_precision("fast")
    cat = Catalog()
    rtt_ms = measure_rtt()
    log(f"relay rtt: {rtt_ms:.1f} ms/call")

    dfx.faiss_create("bench", D, "Flat", metric_type="L2", catalog=cat)
    t0 = time.perf_counter()
    dfx.faiss_add(xb, "bench", catalog=cat)
    dfx.faiss_search("bench", K, xq[:8], catalog=cat)  # force device build
    log(f"flat add+upload: {N/(time.perf_counter()-t0):.0f} vectors/s")

    qps48 = bench_api(dfx, cat, "bench", xq)
    log(f"flat qps b{BATCH}: {qps48:.1f}")
    if cached_rtt and rtt_ms > 2.0 * cached_rtt:
        # Relay >2x slower than the cached good run: re-probe and
        # re-measure the headline once after a pause — transients often
        # clear — so a sick-relay session doesn't record an
        # unattributable regression (the r01->r02 -33% case).
        log(f"relay degraded vs cache ({rtt_ms:.1f} vs {cached_rtt:.1f} "
            "ms/call): re-measuring headline after 30 s")
        time.sleep(30)
        rtt_ms = min(rtt_ms, measure_rtt())
        qps48 = max(qps48, bench_api(dfx, cat, "bench", xq))
        log(f"headline after retry: {qps48:.1f} qps, rtt {rtt_ms:.1f} ms")
    qps_big = bench_api(dfx, cat, "bench", xq_big, iters=5)
    log(f"flat qps b{BIG_BATCH}: {qps_big:.1f}")

    # Pipelined serving path: many b48 requests in flight
    # (faiss_search_batched dispatches all, then gathers).
    big = np.tile(xq, (16, 1))
    dfx.faiss_search_batched("bench", K, big, batch_size=BATCH, catalog=cat)
    t0 = time.perf_counter()
    for _ in range(3):
        dfx.faiss_search_batched("bench", K, big, batch_size=BATCH,
                                 catalog=cat)
    qps_pipe = big.shape[0] * 3 / (time.perf_counter() - t0)
    log(f"flat qps pipelined 16×b{BATCH}: {qps_pipe:.1f}")

    # IVF: train on a subsample, add everything, nprobe sweep point.
    # Supplementary only — skip when the relay is slow (upload speed varies
    # 10x between days) so the headline JSON always lands within the
    # driver's budget.
    qps_ivf = recall = qps_ivf_big = None
    if time.perf_counter() - start > 300:
        log(f"ivf bench skipped: headline took "
            f"{time.perf_counter() - start:.0f}s (slow relay)")
        return qps48, qps_pipe, qps_ivf, recall, qps_ivf_big, rtt_ms
    try:
        dfx.faiss_create("bench_ivf", D, "IVF4096,Flat", metric_type="L2",
                         catalog=cat)
        t0 = time.perf_counter()
        dfx.faiss_manual_train(xb[:262_144], "bench_ivf", catalog=cat)
        t_train = time.perf_counter() - t0
        # Decomposed ingest accounting (the round-1 "6.8k vs 80k vec/s"
        # spread): t_add = coarse assignment + host bookkeeping; t_build =
        # layout build + payload upload + first-search compiles.  The
        # payload is ~2× the flat corpus bytes, so on a slow-relay day the
        # build leg dominates and scales with upload MB/s, not engine work.
        t0 = time.perf_counter()
        dfx.faiss_add(xb, "bench_ivf", catalog=cat)
        t_add = time.perf_counter() - t0
        t0 = time.perf_counter()
        dfx.faiss_search("bench_ivf", K, xq[:8], {"nprobe": "64"},
                         catalog=cat)
        t_build = time.perf_counter() - t0
        idx = cat.get("bench_ivf").index
        dev = getattr(idx, "_device_pallas", None)
        payload_mb = (dev[0].nbytes / 2**20) if dev else 0.0
        log(f"ivf train (4096 lists, 262k rows): {t_train:.1f}s; "
            f"assign+ingest {N/t_add:.0f} vec/s ({t_add:.1f}s); "
            f"layout build+upload {t_build:.1f}s "
            f"({payload_mb:.0f} MB payload → "
            f"{payload_mb / max(t_build, 1e-9):.0f} MB/s incl. compile); "
            f"combined {N/(t_add+t_build):.0f} vec/s")
        qps_ivf = bench_api(dfx, cat, "bench_ivf", xq, {"nprobe": "64"})
        rf = dfx.faiss_search("bench", K, xq, catalog=cat)
        ri = dfx.faiss_search("bench_ivf", K, xq, {"nprobe": "64"},
                              catalog=cat)
        recall = float(np.mean([
            len(set(ri["label"][q]) & set(rf["label"][q])) / K
            for q in range(BATCH)]))
        log(f"ivf qps b{BATCH} nprobe=64: {qps_ivf:.1f} (recall@10 "
            f"{recall:.3f}, clustered corpus)")
        # Big-batch point: nq >= PAIRS_MIN_BATCH rides the pair-tile
        # MXU-batched kernel (ops/pallas_ivf_pairs.py).
        qps_ivf_big = bench_api(dfx, cat, "bench_ivf", xq_big,
                                {"nprobe": "64"}, iters=5)
        log(f"ivf qps b{BIG_BATCH} nprobe=64: {qps_ivf_big:.1f} "
            f"(pair-tile kernel)")
    except Exception as e:  # noqa: BLE001 — supplementary only
        log(f"ivf bench skipped: {type(e).__name__}: {e}")

    return qps48, qps_pipe, qps_ivf, recall, qps_ivf_big, rtt_ms


def measure_cpu_baseline():
    rng = np.random.default_rng(7)
    xb = rng.standard_normal((BASELINE_SUBSAMPLE, D), dtype=np.float32)
    xq = rng.standard_normal((BATCH, D), dtype=np.float32)
    xb_norms = (xb * xb).sum(axis=1)

    def run():
        d = xb_norms[None, :] - 2.0 * (xq @ xb.T)
        idx = np.argpartition(d, K, axis=1)[:, :K]
        part = np.take_along_axis(d, idx, axis=1)
        order = np.argsort(part, axis=1)
        return np.take_along_axis(idx, order, axis=1)

    run()
    best = float("inf")
    for _ in range(3):
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            run()
        best = min(best, (time.perf_counter() - t0) / iters)
    per_batch = best * (N / BASELINE_SUBSAMPLE)
    return BATCH / per_batch


import os

LAST_GOOD = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".bench_last.json")
ChipLock.PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".chip.lock")


def emit_and_exit(line, rc=0):
    """Print the JSON artifact line and hard-exit.

    BENCH_r04 lesson: after a relay death the wedged device client can
    abort in C++ teardown ("terminate called recursively" → SIGABRT),
    turning a perfectly valid emitted artifact into rc 134.  So: verify
    the line round-trips as JSON, flush it, then `os._exit` so no
    destructor runs after the artifact is on stdout."""
    payload = json.dumps(line)
    parsed = json.loads(payload)            # assert it parses
    assert parsed.get("metric"), "artifact line missing 'metric'"
    print(payload)
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(rc)


def main():
    if "--refresh" in sys.argv:
        return refresh_cache()
    if not device_alive():
        # The tunneled device goes unresponsive for hours at a time.  Emit
        # the last successful measurement, clearly flagged as stale with
        # its timestamp, so the driver still records a real number.
        try:
            with open(LAST_GOOD) as f:
                line = json.load(f)
            line["stale"] = True
            log("device unresponsive after retries; emitting last good "
                f"measurement from {line.get('measured_at')}")
            emit_and_exit(line, rc=0)
        except (OSError, ValueError):   # missing, or corrupt partial write
            log("device unresponsive after retries and no cached "
                "measurement; aborting bench (no JSON line)")
            return 1
    from duckdb_faiss_ext_tpu.harness.datasets import synthetic_dataset

    cached_rtt = cached_compute = None
    try:
        with open(LAST_GOOD) as f:
            _cache = json.load(f)
        cached_rtt = _cache.get("rtt_ms")
        cached_compute = _cache.get("compute_ms")
    except (OSError, ValueError):
        pass

    lock = ChipLock()
    lock_ok = lock.acquire()

    # Compute-side contention probe: RTT alone missed the BENCH_r03 case
    # (a chain hammering the chip leaves RTT healthy but compute 2-3×).
    compute_ms = measure_compute()
    log(f"compute probe: {compute_ms:.1f} ms (cached good: "
        f"{cached_compute})")
    if cached_compute and compute_ms > 1.5 * cached_compute:
        log("compute probe degraded >1.5x vs cache — waiting 60 s and "
            "re-probing (likely another process on the chip)")
        time.sleep(60)
        compute_ms = min(compute_ms, measure_compute())
    compute_degraded = bool(cached_compute
                            and compute_ms > 1.5 * cached_compute)

    xb, xq_all = synthetic_dataset(N, D, nq=BATCH + BIG_BATCH, seed=42)
    xq, xq_big = xq_all[:BATCH], xq_all[BATCH:]

    (tpu_qps, qps_pipe, qps_ivf, recall,
     qps_ivf_big, rtt_ms) = measure_tpu(xb, xq, xq_big, cached_rtt)
    rtt_end = measure_rtt()
    lock.release()
    cpu_qps = measure_cpu_baseline()
    log(f"cpu baseline qps (scaled): {cpu_qps:.1f}")
    line = {
        "metric": "flat_search_qps_sift1m_k10_b48",
        "value": round(tpu_qps, 2),
        "unit": "queries/s/chip",
        "vs_baseline": round(tpu_qps / cpu_qps, 3),
        "pipelined_qps": round(qps_pipe, 1) if qps_pipe else None,
        "ivf_qps": round(qps_ivf, 1) if qps_ivf else None,
        "ivf_qps_b1024": round(qps_ivf_big, 1) if qps_ivf_big else None,
        "ivf_recall": round(recall, 3) if recall is not None else None,
        # Drift attribution: the relay's per-call floor brackets the b48
        # headline (48000/rtt_ms qps is its hard ceiling regardless of
        # kernel speed), so a swing between rounds is attributable to
        # relay drift vs code from the artifact alone.
        "rtt_ms": round(min(rtt_ms, rtt_end), 2),
        "rtt_end_ms": round(rtt_end, 2),
        "relay_degraded": bool(cached_rtt
                               and min(rtt_ms, rtt_end) > 2.0 * cached_rtt),
        # Compute-side contention attribution (the BENCH_r03 failure
        # mode: healthy RTT, 2-3× slow compute from a concurrent chain).
        "compute_ms": round(compute_ms, 1),
        "compute_degraded": compute_degraded,
        "chip_lock_busy": not lock_ok,
        # Kernel-config attribution (round-3 knobs): which pair-tile
        # implementation / digit-dot dtype produced these numbers.
        "pairs_impl": _cfg().pairs_impl,
        "sq_digit_dtype": _cfg().sq_digit_dtype,
    }
    try:
        cached = dict(line)
        cached["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                              time.gmtime())
        if cached_compute:
            # the cache holds the best-known-healthy probe, so one
            # degraded session can't poison the baseline for the next
            cached["compute_ms"] = round(min(compute_ms, cached_compute), 1)
        write_cache(cached)
    except OSError:
        pass
    emit_and_exit(line, rc=0)


def write_cache(cached):
    tmp = LAST_GOOD + ".tmp"
    with open(tmp, "w") as f:
        json.dump(cached, f)
    os.replace(tmp, LAST_GOOD)          # atomic: no partial cache files


def refresh_cache():
    """`python bench.py --refresh` — light headline-only re-measurement
    that chains run at the END of a healthy session so `.bench_last.json`
    is never hours old when the driver's capture hits a dead relay
    (VERDICT r4 weak #1).  Runs the flat b48/pipelined points only (no
    IVF leg), keeps the cached IVF numbers, and hard-exits."""
    if not device_alive(timeout_s=60, attempts=2):
        log("refresh: device not responsive; leaving cache untouched")
        os._exit(0)
    from duckdb_faiss_ext_tpu.harness.datasets import synthetic_dataset

    try:
        with open(LAST_GOOD) as f:
            cached = json.load(f)
    except (OSError, ValueError):
        cached = {"metric": "flat_search_qps_sift1m_k10_b48",
                  "unit": "queries/s/chip", "vs_baseline": None}
    lock = ChipLock(wait_s=120)
    lock.acquire()
    try:
        import duckdb_faiss_ext_tpu as dfx
        from duckdb_faiss_ext_tpu.catalog import Catalog

        dfx.set_precision("fast")
        cat = Catalog()
        rtt_ms = measure_rtt()
        xb, xq_all = synthetic_dataset(N, D, nq=BATCH, seed=42)
        xq = xq_all[:BATCH]
        dfx.faiss_create("bench", D, "Flat", metric_type="L2", catalog=cat)
        dfx.faiss_add(xb, "bench", catalog=cat)
        qps48 = bench_api(dfx, cat, "bench", xq, groups=2, iters=5)
        big = np.tile(xq, (16, 1))
        dfx.faiss_search_batched("bench", K, big, batch_size=BATCH,
                                 catalog=cat)
        t0 = time.perf_counter()
        for _ in range(3):
            dfx.faiss_search_batched("bench", K, big, batch_size=BATCH,
                                     catalog=cat)
        qps_pipe = big.shape[0] * 3 / (time.perf_counter() - t0)
        if cached.get("vs_baseline") and cached.get("value"):
            # rescale vs_baseline by the qps ratio (the CPU denominator
            # is host-side and stable between runs)
            cpu_qps = cached["value"] / cached["vs_baseline"]
            cached["vs_baseline"] = round(qps48 / cpu_qps, 3)
        cached.update({
            "value": round(qps48, 2),
            "pipelined_qps": round(qps_pipe, 1),
            "rtt_ms": round(rtt_ms, 2),
            "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                         time.gmtime()),
        })
        write_cache(cached)
        log(f"refresh: cache updated — b48 {qps48:.1f} qps, pipelined "
            f"{qps_pipe:.1f}, rtt {rtt_ms:.1f} ms")
    except Exception as e:  # noqa: BLE001 — refresh must never fail a chain
        log(f"refresh failed ({type(e).__name__}: {e}); cache untouched")
    lock.release()
    os._exit(0)


if __name__ == "__main__":
    sys.exit(main())
