#!/usr/bin/env python
"""Sharded store over a device mesh (the capability the reference lacked).

Runs on a virtual 8-device CPU mesh when real chips aren't present; the same
code drives a v5e-8 (rows shard across ICI, local top-k merges with one
all-gather).

  python examples/sharded_mesh.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# virtual devices when only one chip (or none) is available
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Default to the virtual CPU mesh: querying jax.device_count() first would
# FINALIZE the single-chip backend and the later platform switch would be
# ignored. Set VDB_USE_TPU_MESH=1 on real multi-chip hardware.
if not os.environ.get("VDB_USE_TPU_MESH"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from tpu_vector_db.parallel import ShardedVectorStore, make_device_mesh  # noqa: E402
from tpu_vector_db.store import TPUVectorStore, VectorStoreConfig  # noqa: E402


def main() -> None:
    mesh = make_device_mesh(8)
    print(f"mesh: {mesh.devices.size} devices, axes {mesh.axis_names}")

    rng = np.random.default_rng(0)
    cfg = dict(dimension=64, block_rows=1024, persist_mode="off")
    sharded = ShardedVectorStore("/tmp/vdb_shard_example",
                                 VectorStoreConfig(**cfg), mesh=mesh)
    sharded.clear()

    vectors = rng.standard_normal((50_000, 64)).astype(np.float32)
    sharded.add_vectors(vectors, [{"i": i} for i in range(len(vectors))])
    print("sharded stats:", sharded.get_stats())

    # identical results to a single-device store
    flat = TPUVectorStore("/tmp/vdb_flat_example", VectorStoreConfig(**cfg))
    flat.clear()
    flat.add_vectors(vectors)

    queries = rng.standard_normal((4, 64)).astype(np.float32)
    rs = sharded.batch_query(queries, k=5)
    rf = flat.batch_query(queries, k=5)
    agree = all(a[0] == b[0] for a, b in zip(rs, rf))
    print("sharded == flat results:", agree)
    print("top-5 for query 0:", rs[0][0])


if __name__ == "__main__":
    main()
