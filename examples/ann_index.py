#!/usr/bin/env python
"""ANN example: beam-graph index, recall vs exact search, incremental adds.

  python examples/ann_index.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tpu_vector_db.store import TPUVectorStore, VectorStoreConfig  # noqa: E402


def main() -> None:
    rng = np.random.default_rng(0)
    store = TPUVectorStore("/tmp/vdb_ann_example", VectorStoreConfig(
        dimension=128,
        enable_ann=True,
        persist_mode="off",
        # hnswlib-compatible knobs; build_backend: "tpu" | "cpu" (native C++).
        # index_type pins the graph family — the 'auto' default would
        # route this 20K-row demo to the exact flat scan
        ann_params={"index_type": "beam_graph", "min_rows": 0,
                    "M": 16, "ef_construction": 200, "ef_search": 100,
                    "build_backend": "auto"},
    ))
    store.clear()

    # clustered data, like real embedding distributions (uniform random
    # vectors are the adversarial regime for every graph index — see
    # BENCHMARKS.md)
    centers = rng.standard_normal((200, 128)).astype(np.float32) * 3
    vectors = (centers[rng.integers(0, 200, 20_000)] +
               rng.standard_normal((20_000, 128))).astype(np.float32)
    t0 = time.time()
    store.add_vectors(vectors)
    print(f"ingest+index 20K: {time.time() - t0:.1f}s "
          f"(index: {store._ann.get_stats()})")

    queries = (centers[rng.integers(0, 200, 50)] +
               rng.standard_normal((50, 128))).astype(np.float32)
    hits = misses = 0
    for q in queries:
        ann_ids, _, _ = store.query(q, k=10)                 # beam graph
        exact_ids, _, _ = store.query(q, k=10, use_ann=False)  # flat scan
        hits += len(set(ann_ids) & set(exact_ids))
        misses += len(set(exact_ids) - set(ann_ids))
    print(f"recall@10 vs exact: {hits / (hits + misses):.3f}")

    # incremental add: extends the graph, no full rebuild
    more = rng.standard_normal((1000, 128)).astype(np.float32)
    t0 = time.time()
    store.add_vectors(more)
    print(f"incremental add of 1K: {time.time() - t0:.1f}s "
          f"(graph now {store._ann.size} nodes)")
    ids, _, _ = store.query(more[0], k=1)
    print("new vector reachable:", ids == [20_000])


if __name__ == "__main__":
    main()
