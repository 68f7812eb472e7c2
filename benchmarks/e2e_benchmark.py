#!/usr/bin/env python
"""End-to-end RAG benchmark with pass/fail gates.

Parity with reference benchmarks/e2e_benchmark.py:68-290: model init, N-doc
indexing (docs/s, chunks/s, texts/s), per-query embed+retrieve latency, QPS,
memory, and the same gate thresholds (>=50 docs/s, <=100 ms query, >=10 QPS,
<=2 GB — reference :224-239).

  python benchmarks/e2e_benchmark.py --docs 200 --model hash-384
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

from tpu_vector_db.pipeline import PipelineFactory  # noqa: E402

GATES = {"docs_per_second": 50.0, "query_ms": 100.0, "qps": 10.0,
         "memory_gb": 2.0}

TOPICS = ["vector search", "machine learning", "tpu hardware",
          "distributed systems", "information retrieval"]


def synth_docs(n: int, rng) -> list[str]:
    docs = []
    for i in range(n):
        topic = TOPICS[i % len(TOPICS)]
        sentences = [
            f"Document {i} discusses {topic} in depth. "
            f"Aspect {j} of {topic} involves consideration "
            f"{rng.integers(0, 1000)} and technique {rng.integers(0, 100)}."
            for j in range(rng.integers(5, 15))
        ]
        docs.append(" ".join(sentences))
    return docs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--model", default="hash-384")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--path", default="/tmp/tpu_vdb_e2e_bench")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    import psutil
    proc = psutil.Process()

    t0 = time.perf_counter()
    rag = PipelineFactory.create_rag_pipeline(args.path,
                                              model_name=args.model)
    rag.pipeline.store.clear()
    rag.pipeline.encoder.warmup()
    init_s = time.perf_counter() - t0
    print(f"init: {init_s:.2f}s", flush=True)

    docs = synth_docs(args.docs, rng)
    index_stats = rag.index_documents(
        docs, [{"topic": TOPICS[i % len(TOPICS)]}
               for i in range(len(docs))])
    print(f"indexing: {index_stats}", flush=True)

    latencies = []
    for i in range(args.queries):
        topic = TOPICS[i % len(TOPICS)]
        t0 = time.perf_counter()
        ctx = rag.retrieve_context(f"tell me about {topic} technique", k=args.k)
        latencies.append(time.perf_counter() - t0)
        assert ctx.chunks, "retrieval returned nothing"
    latencies.sort()
    query_ms = latencies[len(latencies) // 2] * 1e3
    qps = args.queries / sum(latencies)
    mem_gb = proc.memory_info().rss / 2**30

    results = {
        "model": args.model,
        "docs_per_second": index_stats["docs_per_second"],
        "chunks_per_second": index_stats["chunks_per_second"],
        "query_ms_p50": round(query_ms, 3),
        "qps": round(qps, 1),
        "memory_gb": round(mem_gb, 3),
    }
    passed = {
        "docs_per_second": results["docs_per_second"] >= GATES["docs_per_second"],
        "query_ms": results["query_ms_p50"] <= GATES["query_ms"],
        "qps": results["qps"] >= GATES["qps"],
        "memory_gb": results["memory_gb"] <= GATES["memory_gb"],
    }
    results["gates"] = passed
    results["passed"] = all(passed.values())
    print(json.dumps(results, indent=2))
    rag.pipeline.store.clear()
    sys.exit(0 if results["passed"] else 1)


if __name__ == "__main__":
    main()
