#!/usr/bin/env python
"""BASELINE config #5 at its TRUE shape: 10M x 128D sharded over an
8-device mesh, merged top-k checked exactly against the single-device
flat scan of the same bf16 rows (VERDICT r3 item 6 — until r4 the sub-ms
projection rested on a 1.25M single-chip slice plus a toy-shape merge
proof; this executes the full sharded shape end to end).

Runs on the 8-virtual-device CPU mesh by default (correctness + shape
feasibility; latency on the CPU mesh is meaningless and recorded only as
wall time). Writes CONFIG5_FULLSHAPE.json at the repo root.

--isolate-merge (r4 verdict item 5): measures the k*P all-gather merge
INCREMENT at the real 10M x 128D shape by timing the full sharded query
against a local-only variant (same shard_map scan, gather+merge removed,
outputs left sharded). The CPU mesh's "ICI" is shared memory, so the
measured increment is an upper bound on orchestration cost, not an ICI
bandwidth claim — the analytic ICI payload is k*P*(4B key + 4B idx) per
query, a few KB, vs a 40 MB/shard/query HBM sweep. Writes
CONFIG5_MERGE.json.

Usage: python benchmarks/config5_full_shape.py [n_devices] [--isolate-merge]
"""

import json
import os
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

argv = [a for a in sys.argv[1:] if not a.startswith("--")]
n_devices = int(argv[0]) if argv else 8

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def isolate_merge(n_devices: int, n: int = 10_000_000, d: int = 128,
                  q_n: int = 8, k: int = 10, reps: int = 5) -> dict:
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from tpu_vector_db.ops.scan import flat_scan_topk
    from tpu_vector_db.parallel.mesh import (SHARD_AXIS, make_device_mesh,
                                             replicated, row_sharding)
    from tpu_vector_db.parallel.sharded_scan import make_sharded_query_fn

    block = 131072
    per_shard = -(-n // (n_devices * block)) * block
    n_pad = per_shard * n_devices
    mesh = make_device_mesh(n_devices)

    print(f"generating {n_pad} x {d} bf16 rows")
    rng = np.random.default_rng(42)
    host = np.zeros((n_pad, d), dtype=jnp.bfloat16.dtype)
    chunk = 1 << 20
    for s in range(0, n_pad, chunk):
        e = min(s + chunk, n_pad)
        x = rng.standard_normal((e - s, d)).astype(np.float32)
        x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-8)
        host[s:e] = x.astype(jnp.bfloat16.dtype)
    queries = rng.standard_normal((q_n, d)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    db = jax.device_put(host, row_sharding(mesh))
    q_rep = jax.device_put(jnp.asarray(queries), replicated(mesh))
    count = jax.device_put(jnp.int32(n), replicated(mesh))

    full_fn, _ = make_sharded_query_fn(mesh, k, metric="cosine",
                                       db_normalized=True,
                                       block_rows=block)

    # local-only variant: identical per-shard scan, NO gather/merge —
    # outputs stay sharded over the mesh
    def local_core(q, dbl, cnt):
        rows_local = dbl.shape[0]
        shard_id = jax.lax.axis_index(SHARD_AXIS)
        offset = shard_id * rows_local
        local_count = jnp.clip(cnt - offset, 0, rows_local).astype(jnp.int32)
        keys, idx = flat_scan_topk(q, dbl, local_count, k, metric="cosine",
                                   db_normalized=True, block_rows=block)
        return keys, idx + offset

    local_fn = jax.jit(jax.shard_map(
        local_core, mesh=mesh,
        in_specs=(P(), P(SHARD_AXIS, None), P()),
        out_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None)),
        check_vma=False))

    def measure(fn):
        jax.block_until_ready(fn(q_rep, db, count))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(q_rep, db, count))
            best = min(best, time.perf_counter() - t0)
        return best

    t_full = measure(full_fn)
    t_local = measure(local_fn)
    res = {
        "check": "config5_isolate_merge",
        "rows": n, "dim": d, "devices": n_devices, "batch": q_n, "k": k,
        "backend": jax.default_backend(),
        "full_query_s": round(t_full, 4),
        "local_only_s": round(t_local, 4),
        "merge_increment_s": round(t_full - t_local, 4),
        "merge_increment_pct": round(
            100.0 * (t_full - t_local) / t_local, 2),
        "ici_payload_bytes_per_query": k * n_devices * 8,
        "note": ("CPU-mesh upper bound on merge orchestration (shared-"
                 "memory 'ICI'); the real ICI payload is "
                 f"{k * n_devices * 8} B/query vs a "
                 f"{per_shard * d * 2 // 2**20} MiB/shard HBM sweep — "
                 "the merge is not the config-5 bottleneck."),
    }
    print(f"isolate_merge OK: {res}")
    return res


if "--isolate-merge" in sys.argv:
    res = isolate_merge(n_devices)
    out = ROOT / "CONFIG5_MERGE.json"
else:
    from __graft_entry__ import full_shape_config5

    res = full_shape_config5(n_devices)
    out = ROOT / "CONFIG5_FULLSHAPE.json"
out.write_text(json.dumps(res, indent=1))
print(f"wrote {out}")
