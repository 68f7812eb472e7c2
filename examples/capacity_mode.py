#!/usr/bin/env python
"""Capacity modes: int8/int4 quantized vector storage + gather-layout IVF.

One 16 GB chip holds ~9M x 768D rows in bf16. storage_dtype="int8"
doubles that (16M: unit-norm rows quantized to a fixed x127 scale) and
"int4" doubles it again (32M: two offset-8 nibbles per byte, one f32
scale per row chosen so the dequantized row is exactly unit-norm). The
exact fused kernel scores the quantized rows directly — keys are the
true cosine of the stored point. The reference tops out at ~10M f32
rows on 32-64 GB unified memory (README.md:63) with no quantized tier.

With enable_ann=True the store builds a GATHER-layout IVF on top: the
index holds only a ~4 B/row id table (the bucketized row copy could not
fit at capacity scale) and probes gather their rows from the flat
matrix — batch-1 latency drops from the full-sweep 25-37 ms to the
probed fraction (TPU numbers in BENCHMARKS.md).

  python examples/capacity_mode.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tpu_vector_db.store import TPUVectorStore, VectorStoreConfig  # noqa: E402


def main() -> None:
    rng = np.random.default_rng(0)
    n, d = 50_000, 256
    x = rng.normal(size=(n, d)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)

    for dtype in ("int8", "int4"):
        store = TPUVectorStore(f"/tmp/vdb_capacity_{dtype}", VectorStoreConfig(
            dimension=d,
            storage_dtype=dtype,          # cosine-only capacity mode
            enable_ann=True,              # gather-layout IVF on top
            persist_mode="off",
            # index_type='auto' would route this small demo corpus to the
            # exact scan (it is under the 100K flat crossover); real
            # capacity-scale stores resolve to IVF automatically
            ann_params={"index_type": "ivf", "nprobe": 16,
                        "self_check": False}))
        t0 = time.perf_counter()
        store.add_vectors(x, [{"i": i} for i in range(n)])
        print(f"[{dtype}] ingested {n} rows in "
              f"{time.perf_counter() - t0:.1f}s; "
              f"index = {store.get_stats()['index_type']}")

        q = x[123]
        t0 = time.perf_counter()
        ids, scores, _ = store.query(q, k=5)
        st = store._ann.get_stats()
        print(f"[{dtype}] self-query top-1 id={ids[0]} "
              f"score={scores[0]:.4f} in "
              f"{(time.perf_counter() - t0) * 1e3:.1f} ms (first call "
              f"compiles); {st['layout']} layout, "
              f"{st['memory_mb']} MB index overhead")
        assert scores[0] > 0.95

        # exact engine on the same quantized rows for comparison
        exact = store.batch_query(q[None], k=5, use_ann=False)[0]
        print(f"[{dtype}] exact-engine top-1 score={exact[1][0]:.4f} "
              f"(same quantized rows — IVF recall is a coverage knob)")


if __name__ == "__main__":
    main()
