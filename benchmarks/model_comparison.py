#!/usr/bin/env python
"""Per-encoder E2E comparison table.

Parity with reference benchmarks/e2e_model_comparison.py (same pipeline per
embedding model -> comparison table). Models come from the encoder registry;
random-init Flax encoders still measure the true compute cost per
architecture even without trained weights.

  python benchmarks/model_comparison.py --models hash-384 minilm-l6-384
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

from tpu_vector_db.pipeline import EMBEDDING_MODEL_REGISTRY, RAGPipeline, create_encoder  # noqa: E402
from tpu_vector_db.store import TPUVectorStore, VectorStoreConfig  # noqa: E402
from benchmarks.e2e_benchmark import synth_docs  # noqa: E402


def bench_model(name: str, docs: list[str], queries: int, base: Path) -> dict:
    t0 = time.perf_counter()
    encoder = create_encoder(name)
    encoder.warmup()
    init_s = time.perf_counter() - t0
    store = TPUVectorStore(base / name, VectorStoreConfig(
        dimension=encoder.dimension, persist_mode="off"))
    store.clear()
    rag = RAGPipeline(encoder, store)

    stats = rag.index_documents(docs)
    lat = []
    for i in range(queries):
        t0 = time.perf_counter()
        rag.retrieve_context(f"query about topic {i}", k=5)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    enc_stats = encoder.get_stats()
    store.clear()
    return {
        "model": name,
        "dimension": encoder.dimension,
        "init_s": round(init_s, 2),
        "docs_per_second": stats["docs_per_second"],
        "texts_per_second": round(enc_stats["texts_per_second"], 1),
        "query_ms_p50": round(lat[len(lat) // 2] * 1e3, 2),
        "qps": round(queries / sum(lat), 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+",
                    default=["hash-384", "minilm-l6-384", "bge-small-384"])
    ap.add_argument("--docs", type=int, default=100)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--path", default="/tmp/tpu_vdb_model_cmp")
    args = ap.parse_args()

    for m in args.models:
        if m not in EMBEDDING_MODEL_REGISTRY:
            sys.exit(f"unknown model {m}; known: "
                     f"{sorted(EMBEDDING_MODEL_REGISTRY)}")

    rng = np.random.default_rng(0)
    docs = synth_docs(args.docs, rng)
    rows = [bench_model(m, docs, args.queries, Path(args.path))
            for m in args.models]

    cols = list(rows[0].keys())
    widths = {c: max(len(c), *(len(str(r[c])) for r in rows)) for c in cols}
    print("  ".join(c.ljust(widths[c]) for c in cols))
    for r in rows:
        print("  ".join(str(r[c]).ljust(widths[c]) for c in cols))
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
