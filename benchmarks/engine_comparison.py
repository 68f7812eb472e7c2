#!/usr/bin/env python
"""Engine comparison harness.

The role of the reference's Gradio benchmark app
(benchmarks/benchmark_app.py:55-193 — MLX DB via API vs direct vs FAISS vs
ChromaDB vs Qdrant on ingestion vec/s, QPS, latency): compares this
framework's engines side by side — flat XLA scan, fused Pallas scan, ANN
beam-graph, REST-API round trip — plus any external baselines that happen to
be importable (faiss, chromadb; both gated, absent in this image).

  python benchmarks/engine_comparison.py --n 50000 --dim 384
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


def bench_store(name: str, cfg: VectorStoreConfig, vectors, queries, k,
                base: Path, use_ann=True) -> dict:
    store = TPUVectorStore(base / name.replace(" ", "_"), cfg)
    store.clear()
    t0 = time.perf_counter()
    store.add_vectors(vectors)
    ingest = len(vectors) / (time.perf_counter() - t0)
    store.warmup(batch=len(queries), k=k)
    t0 = time.perf_counter()
    store.batch_query(queries, k=k, use_ann=use_ann)
    batch_dt = time.perf_counter() - t0
    lat = []
    for i in range(16):
        t0 = time.perf_counter()
        store.query(queries[i % len(queries)], k=k, use_ann=use_ann)
        lat.append(time.perf_counter() - t0)
    store.clear()
    return {"engine": name, "ingest_vps": round(ingest, 1),
            "qps_batched": round(len(queries) / batch_dt, 1),
            "p50_ms": round(sorted(lat)[len(lat) // 2] * 1e3, 3)}


def bench_torch(vectors, queries, k) -> dict | None:
    """External baseline that IS importable in this image: torch-CPU exact
    cosine (matmul + topk), the same brute-force shape faiss's IndexFlatIP
    runs. Gives the cross-engine table a real non-JAX row."""
    try:
        import torch
    except ImportError:
        return None
    t0 = time.perf_counter()
    db = torch.from_numpy(vectors)
    db = db / db.norm(dim=-1, keepdim=True).clamp_min(1e-8)
    ingest = len(vectors) / (time.perf_counter() - t0)
    q = torch.from_numpy(queries)
    q = q / q.norm(dim=-1, keepdim=True).clamp_min(1e-8)
    with torch.no_grad():
        torch.topk(q[:1] @ db.T, k)  # warm
        t0 = time.perf_counter()
        torch.topk(q @ db.T, k)
        dt = time.perf_counter() - t0
        lat = []
        for i in range(16):
            t0 = time.perf_counter()
            torch.topk(q[i % len(q): i % len(q) + 1] @ db.T, k)
            lat.append(time.perf_counter() - t0)
    return {"engine": "torch-cpu-flat", "ingest_vps": round(ingest, 1),
            "qps_batched": round(len(queries) / dt, 1),
            "p50_ms": round(sorted(lat)[len(lat) // 2] * 1e3, 3)}


def bench_chromadb(vectors, queries, k) -> dict | None:
    """In-memory ChromaDB collection (the reference's ChromaDB row,
    benchmark_app.py flows: add then query_embeddings). Gated: chromadb is
    not installed in this image; the code path is exercised wherever it is."""
    try:
        import chromadb  # gated: not in this image
    except ImportError:
        return None
    client = chromadb.EphemeralClient() if hasattr(chromadb, "EphemeralClient") \
        else chromadb.Client()
    col = client.create_collection(
        "bench", metadata={"hnsw:space": "cosine"})
    ids = [str(i) for i in range(len(vectors))]
    t0 = time.perf_counter()
    # chroma caps add batches (~5461); chunk to stay portable
    step = 5000
    for s in range(0, len(vectors), step):
        col.add(ids=ids[s: s + step],
                embeddings=vectors[s: s + step].tolist())
    ingest = len(vectors) / (time.perf_counter() - t0)
    col.query(query_embeddings=queries[:1].tolist(), n_results=k)  # warm
    t0 = time.perf_counter()
    col.query(query_embeddings=queries.tolist(), n_results=k)
    dt = time.perf_counter() - t0
    lat = []
    for i in range(16):
        t0 = time.perf_counter()
        col.query(query_embeddings=queries[i % len(queries):
                                           i % len(queries) + 1].tolist(),
                  n_results=k)
        lat.append(time.perf_counter() - t0)
    return {"engine": "chromadb", "ingest_vps": round(ingest, 1),
            "qps_batched": round(len(queries) / dt, 1),
            "p50_ms": round(sorted(lat)[len(lat) // 2] * 1e3, 3)}


def bench_qdrant(vectors, queries, k) -> dict | None:
    """In-memory Qdrant (the reference's Qdrant row: upsert PointStructs,
    per-query search). Gated: qdrant_client is not installed here."""
    try:
        from qdrant_client import QdrantClient
        from qdrant_client.models import (
            Distance, PointStruct, VectorParams)
    except ImportError:
        return None
    client = QdrantClient(":memory:")
    client.create_collection(
        "bench", vectors_config=VectorParams(
            size=vectors.shape[1], distance=Distance.COSINE))
    t0 = time.perf_counter()
    step = 2000
    for s in range(0, len(vectors), step):
        client.upsert("bench", points=[
            PointStruct(id=s + j, vector=row.tolist())
            for j, row in enumerate(vectors[s: s + step])])
    ingest = len(vectors) / (time.perf_counter() - t0)
    client.search("bench", query_vector=queries[0].tolist(), limit=k)  # warm
    t0 = time.perf_counter()
    for q in queries:
        client.search("bench", query_vector=q.tolist(), limit=k)
    dt = time.perf_counter() - t0
    lat = []
    for i in range(16):
        t0 = time.perf_counter()
        client.search("bench", query_vector=queries[i % len(queries)].tolist(),
                      limit=k)
        lat.append(time.perf_counter() - t0)
    return {"engine": "qdrant", "ingest_vps": round(ingest, 1),
            "qps_batched": round(len(queries) / dt, 1),
            "p50_ms": round(sorted(lat)[len(lat) // 2] * 1e3, 3)}


def bench_faiss(vectors, queries, k) -> dict | None:
    try:
        import faiss  # gated: not in this image
    except ImportError:
        return None
    index = faiss.IndexFlatIP(vectors.shape[1])
    t0 = time.perf_counter()
    index.add(vectors)
    ingest = len(vectors) / (time.perf_counter() - t0)
    t0 = time.perf_counter()
    index.search(queries, k)
    dt = time.perf_counter() - t0
    return {"engine": "faiss-flat", "ingest_vps": round(ingest, 1),
            "qps_batched": round(len(queries) / dt, 1), "p50_ms": None}


#: In-framework engines, name -> VectorStoreConfig factory(dim).  Shared
#: with the interactive comparison app (benchmarks/compare_app.py), the
#: role of the reference's Gradio engine-checkbox list
#: (benchmarks/benchmark_app.py:180).
STORE_ENGINES = {
    "flat-xla": lambda dim: VectorStoreConfig(
        dimension=dim, persist_mode="off", use_pallas=False),
    "flat-pallas": lambda dim: VectorStoreConfig(
        dimension=dim, persist_mode="off"),
    "flat-bf16": lambda dim: VectorStoreConfig(
        dimension=dim, persist_mode="off", storage_dtype="bfloat16"),
    "ann-beam-graph": lambda dim: VectorStoreConfig(
        dimension=dim, persist_mode="off", enable_ann=True,
        ann_params={"index_type": "beam_graph"}),
    "ann-ivf": lambda dim: VectorStoreConfig(
        dimension=dim, persist_mode="off", enable_ann=True,
        ann_params={"index_type": "ivf", "min_rows": 0}),
    "auto-routed": lambda dim: VectorStoreConfig(
        dimension=dim, persist_mode="off", enable_ann=True,
        ann_params={"index_type": "auto"}),
    "flat-int8": lambda dim: VectorStoreConfig(
        dimension=dim, persist_mode="off", storage_dtype="int8"),
    "ivf-int8-gather": lambda dim: VectorStoreConfig(
        dimension=dim, persist_mode="off", storage_dtype="int8",
        enable_ann=True, ann_params={"index_type": "ivf", "min_rows": 0}),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--dim", type=int, default=384)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--path", default="/tmp/tpu_vdb_engine_cmp")
    ap.add_argument("--torch-only", action="store_true",
                    help="run only the external torch-CPU baseline (lets the"
                         " 1-core host produce the cross-engine row at the"
                         " full 1M x 768D contract scale without also paying"
                         " for the in-framework CPU sweeps)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    vectors = rng.standard_normal((args.n, args.dim)).astype(np.float32)
    queries = rng.standard_normal((args.batch, args.dim)).astype(np.float32)
    base = Path(args.path)

    if args.torch_only:
        row = bench_torch(vectors, queries, args.k)
        print(json.dumps([row] if row else []))
        return

    rows = []
    for name, cfg_for in STORE_ENGINES.items():
        rows.append(bench_store(name, cfg_for(args.dim),
                                vectors, queries, args.k, base))
    for ext in (bench_torch(vectors, queries, args.k),
                bench_faiss(vectors, queries, args.k),
                bench_chromadb(vectors, queries, args.k),
                bench_qdrant(vectors, queries, args.k)):
        if ext:
            rows.append(ext)
    if not any(r["engine"].startswith("faiss") for r in rows):
        print("(faiss/chromadb not installed; torch-cpu is the external row)")

    cols = list(rows[0].keys())
    widths = {c: max(len(c), *(len(str(r[c])) for r in rows)) for c in cols}
    print("  ".join(c.ljust(widths[c]) for c in cols))
    for r in rows:
        print("  ".join(str(r[c]).ljust(widths[c]) for c in cols))
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
