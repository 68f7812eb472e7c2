#!/usr/bin/env python
"""Sustained-ingest benchmark for IVF host-side placement (VERDICT r2 #8).

Measures _place_rows throughput on a C=16K-cluster index under a streaming
workload (many add batches), isolating the host bucket-placement cost from
device work. Round-2's implementation re-ran `np.where` over the full bucket
table per touched cluster (O(clusters_touched * NB) per batch) and grew the
id table one bucket at a time (O(NB*Bc) copy per spill); round 3 replaces
both with a per-cluster open-bucket map + batched spill allocation.

Host-only (numpy): run anywhere, no TPU needed.
  PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/ivf_ingest.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("VDB_FORCE_CPU", "1")

from tpu_vector_db.index.ivf import IVFIndex  # noqa: E402


def main():
    C = int(os.environ.get("VDB_INGEST_CLUSTERS", 16384))
    BC = int(os.environ.get("VDB_INGEST_BC", 1024))
    BATCH = int(os.environ.get("VDB_INGEST_BATCH", 10_000))
    TOTAL = int(os.environ.get("VDB_INGEST_TOTAL", 2_000_000))
    rng = np.random.default_rng(0)

    # skeleton index: placement does not touch vectors, only the tables
    idx = IVFIndex(dim=128, metric="cosine", n_clusters=C, bucket_rows=BC)
    idx._centroids = np.zeros((C, 128), np.float32)
    idx._ids = np.full((C, BC), -1, np.int32)
    idx._bucket_cluster = np.arange(C, dtype=np.int32)
    idx._free = np.full(C, BC, np.int64)
    idx._n = 0

    # zipf-ish skew: realistic ingest hits some clusters far more than others
    weights = 1.0 / np.arange(1, C + 1) ** 0.7
    weights /= weights.sum()

    placed = 0
    spent = 0.0
    checkpoints = []
    while placed < TOTAL:
        n = min(BATCH, TOTAL - placed)
        assign = rng.choice(C, size=n, p=weights).astype(np.int32)
        t0 = time.perf_counter()
        idx._place_rows(assign, np.arange(placed, placed + n))
        spent += time.perf_counter() - t0
        idx._n += n
        placed += n
        if placed % 500_000 == 0:
            checkpoints.append(round(placed / spent, 0))
    dt = spent
    live = int((idx._ids >= 0).sum())
    assert live == TOTAL, (live, TOTAL)
    uniq = len(np.unique(idx._ids[idx._ids >= 0]))
    assert uniq == TOTAL, (uniq, TOTAL)

    print(json.dumps({
        "metric": f"ivf_ingest_C{C}_bc{BC}_batch{BATCH}",
        "rows": TOTAL,
        "rows_per_s": round(TOTAL / dt, 0),
        "total_s": round(dt, 2),
        "rows_per_s_checkpoints": checkpoints,
        "buckets_final": int(idx._ids.shape[0]),
    }), flush=True)


if __name__ == "__main__":
    main()
