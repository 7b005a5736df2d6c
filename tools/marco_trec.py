"""Full-scale TREC conformance: k=1000 over the frozen 8.8M marco index.

The reference's accuracy-conformance flow runs TREC-DL19 topics at k=1000
against the full 8,841,823-doc index and emits a TREC run file
(/root/reference/go/cmd/create_trec/main.go:32-48, Makefile:98-99).  Real
MS MARCO/qrels cannot reach this environment (zero egress), so the
accepted substitute is synthetic exact-GT qrels (harness/trec.py): the
frozen device-generated corpus's exact top-10 per query (pass-A cache)
becomes graded judgments (3×grade-3, 7×grade-2), and the run is scored
with trec_eval conventions (MRR@10, nDCG@10, recall@1000).

k=1000 at 8.8M exercises the top-k/rerank widths the serving sweeps never
touch (the round-4 filtered bug at k'=1874 lived exactly there).  The
save→load half of the flow is covered at marco-mini scale
(tests/test_trec_flow.py); serializing the 11 GiB device-resident payload
through the relay is not useful conformance work.

Usage (real TPU):
  env PYTHONPATH=/root/repo:/root/.axon_site \
      tools/chiplock.sh 3000 python tools/marco_trec.py [--storage SQ6]
      [--nprobe 64] [--k 1000]
"""

from __future__ import annotations

import argparse
import glob
import sys
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--storage", default="SQ6")
    ap.add_argument("--nprobe", type=int, default=64)
    ap.add_argument("--k", type=int, default=1000)
    ap.add_argument("--n", type=int, default=8_841_823)
    ap.add_argument("--out", default="logs/marco_trec.run")
    args = ap.parse_args()

    import runpy

    sys.argv = ["marco_device.py", "--storage", args.storage,
                "--metric", "IP", "--unit-norm", "--assign-topk", "4",
                "--budget-gb", "13.5", "--n", str(args.n),
                "--nprobes", str(args.nprobe), "--batches", "48"]
    runpy.run_path("tools/marco_device.py", run_name="__main__")

    import duckdb_faiss_ext_tpu as dfx
    from duckdb_faiss_ext_tpu.harness.trec import (score_trec_run,
                                                   write_trec_run)

    z = np.load(glob.glob("/root/repo/.marco_passA_*_un_ip2_h*.npz")[0])
    xq, gt = z["xq"], z["gt"]
    nq = xq.shape[0]
    qids = [str(i) for i in range(nq)]
    # Graded qrels straight from the exact top-10 GT (grade 3 for the
    # top 3 true neighbours, grade 2 for the next 7) — the same shape
    # make_synthetic_qrels produces, without a second 8.8M host pass.
    qrels = {}
    for qi in range(nq):
        g = {}
        for r, docid in enumerate(gt[qi]):
            g[str(int(docid))] = 3 if r < 3 else 2
        qrels[qids[qi]] = g

    params = {"nprobe": str(args.nprobe)}
    print(f"\n=== TREC k={args.k} over 8.8M ({args.storage} "
          f"np{args.nprobe}) ===", flush=True)
    t0 = time.time()
    write_trec_run(args.out, "marco", qids, xq, k=args.k,
                   run_name=f"dfx-{args.storage.lower()}", params=params,
                   batch=256)
    dt = time.time() - t0
    print(f"run written: {args.out} ({nq} queries x k={args.k} in "
          f"{dt:.1f}s = {nq / dt:.1f} qps at k=1000)", flush=True)
    scores = score_trec_run(args.out, qrels, recall_k=args.k)
    print("TREC scores: " + "  ".join(
        f"{m}={v:.4f}" if isinstance(v, float) else f"{m}={v}"
        for m, v in scores.items()), flush=True)
    print("MARCO-TREC COMPLETE", flush=True)


if __name__ == "__main__":
    main()
