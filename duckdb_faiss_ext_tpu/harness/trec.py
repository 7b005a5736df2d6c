"""TREC run-file emission for accuracy conformance.

Port of the reference's create_trec tool (go/cmd/create_trec/main.go:32-48):
run a query set at k=1000 against a named index and emit the standard TREC
run format ``qid Q0 docid rank score runname`` for scoring with qrels
(the reference scores MS MARCO / TREC-DL19 with anserini-tools,
Makefile:73-75)."""

from __future__ import annotations

import numpy as np

from .. import api


def write_trec_run(path: str, index_name: str, query_ids, queries,
                   k: int = 1000, run_name: str = "dfx-tpu",
                   params=None, catalog=None, batch: int = 256) -> None:
    query_ids = np.asarray(query_ids)
    queries = np.asarray(queries, dtype=np.float32)
    with open(path, "w") as f:
        for start in range(0, queries.shape[0], batch):
            qb = queries[start:start + batch]
            res = api.faiss_search(index_name, k, qb, params, catalog)
            for qi in range(qb.shape[0]):
                qid = query_ids[start + qi]
                for rank in range(k):
                    label = int(res["label"][qi, rank])
                    if label < 0:
                        break
                    score = float(res["distance"][qi, rank])
                    f.write(f"{qid} Q0 {label} {rank + 1} {score:.6f} "
                            f"{run_name}\n")
