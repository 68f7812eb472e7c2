#!/usr/bin/env python
"""Quickstart: the store as a library — create, add, query, filter, persist.

  python examples/quickstart.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import tpu_vector_db as vdb  # noqa: E402


def main() -> None:
    rng = np.random.default_rng(0)
    path = "/tmp/vdb_quickstart"

    # 1. create a store (cosine, 384-D, bf16 storage on device)
    store = vdb.create_vector_store(
        path, dimension=384, metric="cosine", storage_dtype="bfloat16")
    store.clear()

    # 2. add vectors with metadata
    docs = rng.standard_normal((1000, 384)).astype(np.float32)
    store.add_vectors(docs, [
        {"doc_id": f"doc_{i}", "lang": "en" if i % 2 else "de"}
        for i in range(1000)
    ])
    print(f"store holds {len(store)} vectors")

    # 3. query (top-k nearest by cosine similarity)
    indices, scores, metadata = store.query(docs[42], k=3)
    print("self-query:", list(zip(indices, [round(s, 4) for s in scores])))

    # 4. filtered query — exact-match metadata subset
    indices, scores, metadata = store.query(
        docs[42], k=3, filter_metadata={"lang": "de"})
    print("filtered:", [(i, m["lang"]) for i, m in zip(indices, metadata)])

    # 5. batched queries (one device sweep for the whole batch)
    results = store.batch_query(docs[:8], k=2)
    print("batch top-1s:", [r[0][0] for r in results])

    # 6. persistence: stores reload from disk
    store.flush()
    # config=None restores the persisted config from manifest.json (the
    # created-with dtype/metric/ANN settings); passing a mismatching
    # config would raise StoreDimensionMismatch by design
    reloaded = vdb.TPUVectorStore(path)
    print(f"reloaded {len(reloaded)} vectors;",
          "query parity:", reloaded.query(docs[42], k=1)[0] == indices[:1]
          or reloaded.query(docs[42], k=1)[0] == [42])

    print("stats:", store.get_stats())


if __name__ == "__main__":
    main()
