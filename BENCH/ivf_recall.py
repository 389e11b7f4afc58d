#!/usr/bin/env python3
"""IVF recall-vs-n_probe curve at 10^6 vectors / ~1000 cells (VERDICT r3
next-round #6).

Corpus: deterministic Gaussian-mixture embeddings (200 true clusters,
dim 16, unit-normalized) — the clustered geometry IVF is built for; with
uniform random vectors every neighbor is near-orthogonal and "recall"
measures tie-breaking noise, not index quality.  Ground truth: exact
brute-force cosine top-k computed in numpy on the identical matrix (the
generator is shared, nothing is collected from Spark).

Appends a section to BENCH/accuracy.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sketch_spark import get_spark  # noqa: E402
from sketch_spark.operators import ann  # noqa: E402

N = 1_000_000
DIM = 16
N_TRUE_CLUSTERS = 200
N_QUERIES = 64
K = 10
N_CELLS = 1000
SEED = 20260818


def make_matrix() -> np.ndarray:
    rng = np.random.default_rng(SEED)
    centers = rng.normal(size=(N_TRUE_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, N_TRUE_CLUSTERS, size=N)
    x = centers[assign] + 0.15 * rng.normal(size=(N, DIM))
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    return x.astype(np.float32)


def main() -> None:
    os.environ.setdefault("SPARK_DRIVER_MEM", "16g")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        "ivf-recall", master=f"local[{cpus}]", shuffle_partitions=2 * cpus
    )
    x = make_matrix()
    q_ids = np.arange(N_QUERIES) * (N // N_QUERIES)  # deterministic spread

    # exact ground truth in numpy (queries x corpus, chunked)
    qs = x[q_ids].astype(np.float64)
    truth: dict[int, set] = {}
    sims = np.empty((N_QUERIES, N), dtype=np.float64)
    step = 200_000
    for lo in range(0, N, step):
        sims[:, lo : lo + step] = qs @ x[lo : lo + step].T.astype(np.float64)
    for qi, qid in enumerate(q_ids):
        s = sims[qi].copy()
        s[qid] = -np.inf  # self excluded (ivf_topk filters q_id != n_id)
        top = np.argpartition(-s, K)[:K]
        truth[int(qid)] = set(int(t) for t in top)

    import pandas as pd

    pdf = pd.DataFrame({"vec_id": np.arange(N, dtype=np.int64), "embedding": list(x)})
    corpus = spark.createDataFrame(pdf).repartition(2 * cpus).persist()
    corpus.count()
    queries = corpus.where(corpus.vec_id.isin([int(i) for i in q_ids])).persist()
    queries.count()

    curve = {}
    for n_probe in (1, 2, 4, 8, 16):
        t0 = time.time()
        got = ann.ivf_topk(
            corpus, queries, k=K, n_cells=N_CELLS, n_probe=n_probe, seed=SEED
        ).collect()
        by_q: dict[int, set] = {}
        for r in got:
            by_q.setdefault(int(r.q_id), set()).add(int(r.n_id))
        rec = float(
            np.mean([len(by_q.get(q, set()) & truth[q]) / K for q in truth])
        )
        curve[n_probe] = {
            "recall_at_10": round(rec, 4),
            "sec": round(time.time() - t0, 1),
        }
        print(f"# n_probe={n_probe}: recall@10={rec:.4f}", file=sys.stderr)

    md = os.path.join(os.path.dirname(os.path.abspath(__file__)), "accuracy.md")
    with open(md, "a") as f:
        f.write(
            f"\n## IVF recall vs n_probe ({N:,} vectors, dim {DIM}, "
            f"{N_TRUE_CLUSTERS} true clusters, n_cells={N_CELLS}, "
            f"sample=64x cells, k={K}, {N_QUERIES} queries; "
            "BENCH/ivf_recall.py)\n\n| n_probe | recall@10 | sec |\n|---|---|---|\n"
        )
        for p, r in curve.items():
            f.write(f"| {p} | {r['recall_at_10']:.4f} | {r['sec']} |\n")
    print(json.dumps({"metric": "ivf_recall_curve", "n": N, "n_cells": N_CELLS,
                      "curve": curve}))
    spark.stop()


if __name__ == "__main__":
    main()
