#!/usr/bin/env python
"""Large-scale ingest + query benchmark CLI.

Parity with reference benchmarks/large_scale_benchmark.py:32-104 (N x dim,
optional ANN, ingest rate + build time, query latency/QPS at k) — extended
with batch sweeps, bf16 storage, engine selection, and recall@k against the
flat ground truth when ANN is on.

  python benchmarks/large_scale_benchmark.py --n 1000000 --dim 768 \\
      --ann --bf16 --batch 64 --k 10
"""

from __future__ import annotations

import os

if os.environ.get("VDB_FORCE_CPU"):  # env JAX_PLATFORMS is hijacked by the
    import jax                        # pinned TPU plugin; config API sticks
    jax.config.update("jax_platforms", "cpu")

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tpu_vector_db.store import TPUVectorStore, VectorStoreConfig  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--queries", type=int, default=512)
    ap.add_argument("--metric", default="cosine")
    ap.add_argument("--ann", action="store_true")
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--ef-search", type=int, default=100)
    ap.add_argument("--recall-queries", type=int, default=100)
    ap.add_argument("--path", default="/tmp/tpu_vdb_large_bench")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    cfg = VectorStoreConfig(
        dimension=args.dim, metric=args.metric, enable_ann=args.ann,
        storage_dtype="bfloat16" if args.bf16 else "float32",
        persist_mode="off",
        ann_params={"M": 16, "ef_construction": 200,
                    "ef_search": args.ef_search})
    store = TPUVectorStore(args.path, cfg)
    store.clear()

    print(f"generating {args.n} x {args.dim} vectors...", flush=True)
    vectors = rng.standard_normal((args.n, args.dim)).astype(np.float32)

    t0 = time.perf_counter()
    chunk = 100_000
    for start in range(0, args.n, chunk):
        store.add_vectors(vectors[start: start + chunk])
    ingest_dt = time.perf_counter() - t0
    print(f"ingest: {args.n / ingest_dt:,.0f} vec/s ({ingest_dt:.1f}s total)",
          flush=True)
    if args.ann:
        print(f"ann build time: {store._ann.build_time_s:.1f}s", flush=True)

    queries = rng.standard_normal((args.queries, args.dim)).astype(np.float32)
    store.warmup(batch=args.batch, k=args.k)

    # batched throughput
    t0 = time.perf_counter()
    done = 0
    while done < args.queries:
        store.batch_query(queries[done: done + args.batch], k=args.k)
        done += args.batch
    dt = time.perf_counter() - t0
    qps = args.queries / dt
    print(f"query: {qps:,.1f} QPS (batch {args.batch}), "
          f"{dt / (args.queries / args.batch) * 1e3:.2f} ms/batch", flush=True)

    # batch-1 latency
    lat = []
    for i in range(min(32, args.queries)):
        t0 = time.perf_counter()
        store.query(queries[i], k=args.k)
        lat.append(time.perf_counter() - t0)
    p50 = sorted(lat)[len(lat) // 2] * 1e3

    result = {"n": args.n, "dim": args.dim, "metric": args.metric,
              "index": "beam_graph" if args.ann else "flat",
              "storage": cfg.storage_dtype,
              "ingest_vps": round(args.n / ingest_dt, 1),
              "qps_batched": round(qps, 1),
              "p50_ms_batch1": round(p50, 3)}

    if args.ann:
        nq = args.recall_queries
        found = [set(store.query(queries[i], k=args.k)[0])
                 for i in range(nq)]
        truth = [set(store.query(queries[i], k=args.k, use_ann=False)[0])
                 for i in range(nq)]
        recall = sum(len(f & t) for f, t in zip(found, truth)) / (nq * args.k)
        result["recall_at_k"] = round(recall, 4)
        print(f"recall@{args.k} vs flat: {recall:.4f}", flush=True)

    print(json.dumps(result))
    store.clear()


if __name__ == "__main__":
    main()
