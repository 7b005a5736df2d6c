#!/usr/bin/env python
"""k-NN majority-vote classification over an index.

The analogue of the reference's Python examples (examples/ai.py /
examples/ai3.py): embed labeled documents, add them to an index with their
class as part of the label space, then classify queries by majority vote
over the k nearest neighbours.  The reference embeds tweets with
sentence-transformers; this standalone example uses synthetic class-clustered
embeddings so it runs without model downloads — swap `embed()` for a real
encoder in production.
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import duckdb_faiss_ext_tpu as dfx

NUM_CLASSES = 3
DIM = 64
rng = np.random.default_rng(0)
class_centers = rng.standard_normal((NUM_CLASSES, DIM)).astype(np.float32)


def embed(class_id: int, n: int) -> np.ndarray:
    """Stand-in embedding model: points near the class centroid."""
    return (class_centers[class_id]
            + 0.7 * rng.standard_normal((n, DIM)).astype(np.float32))


def main() -> int:
    # Label encoding: label = doc_id * NUM_CLASSES + class (so the class is
    # recoverable from the search result labels alone).
    train_x, train_labels = [], []
    for c in range(NUM_CLASSES):
        x = embed(c, 500)
        ids = (np.arange(500) + c * 500) * NUM_CLASSES + c
        train_x.append(x)
        train_labels.append(ids)
    xb = np.concatenate(train_x)
    ids = np.concatenate(train_labels)

    dfx.faiss_create("sentiment", DIM, "IDMap,Flat", metric_type="L2")
    dfx.faiss_add((ids, xb), "sentiment")

    correct = total = 0
    for c in range(NUM_CLASSES):
        queries = embed(c, 50)
        res = dfx.faiss_search("sentiment", 15, queries)
        votes = res["label"] % NUM_CLASSES
        pred = np.array([np.bincount(v[v >= 0] if (v >= 0).any() else [0],
                                     minlength=NUM_CLASSES).argmax()
                         for v in votes])
        correct += int((pred == c).sum())
        total += pred.size
    print(f"k-NN majority-vote accuracy: {correct / total:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
