#!/usr/bin/env python
"""TPU check + benchmark for the big-k fused Pallas kernel (k > 32).

Stage 1: Mosaic correctness — small shapes, exact compare vs the XLA scan
on-device (the interpret-mode tests prove the algorithm; this proves the
bitonic reshapes / while_loop lower correctly on real hardware).
Stage 2: BASELINE config #2 — 1M x 128D L2, batch-64, top-100 (bf16), timed
with a data-dependency chain + one final D2H (axon block_until_ready
under-reports; see CLAUDE.md).

Run (one TPU process at a time, through the tunnel):
  setsid nohup python benchmarks/bigk_tpu_check.py > /tmp/bigk.log 2>&1 &
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_vector_db.ops.pallas_scan import pallas_flat_topk  # noqa: E402
from tpu_vector_db.ops.scan import flat_scan_topk  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def correctness():
    log("stage 1: Mosaic correctness (8192 x 128, k in {40, 100, 250})")
    key = jax.random.PRNGKey(1)
    kd, kq = jax.random.split(key)
    n, d, qn = 8192, 128, 4
    db = jax.random.normal(kd, (n, d), jnp.float32)
    db = db / jnp.linalg.norm(db, axis=-1, keepdims=True)
    q = jax.random.normal(kq, (qn, d), jnp.float32)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    sq = jnp.sum(db.astype(jnp.float32) ** 2, -1)
    count = np.int32(8000)
    for metric in ("cosine", "euclidean"):
        for k in (40, 100, 250):
            t0 = time.perf_counter()
            vals, idx = pallas_flat_topk(
                q, db, count, k, metric=metric,
                db_sqnorms=sq if metric == "euclidean" else None,
                block_rows=1024)
            vals, idx = np.asarray(vals), np.asarray(idx)
            rvals, ridx = flat_scan_topk(
                q, db, jnp.int32(count), k, metric=metric,
                db_normalized=True,
                db_sqnorms=sq if metric == "euclidean" else None,
                block_rows=8192)
            rvals, ridx = np.asarray(rvals), np.asarray(ridx)
            ok_v = np.allclose(vals, rvals, atol=2e-3)
            ok_i = (idx == ridx).mean()
            log(f"  {metric} k={k}: vals_ok={ok_v} idx_match={ok_i:.4f} "
                f"({time.perf_counter()-t0:.1f}s)")
            if not ok_v or ok_i < 0.95:
                log(f"  MISMATCH: vals diff max "
                    f"{np.abs(vals - rvals).max():.5f}")
                return False
    return True


def bench(n, d, k, batch, metric, dtype=jnp.bfloat16, iters=30):
    n_pad = ((n + 131071) // 131072) * 131072
    key = jax.random.PRNGKey(0)
    kd, kq = jax.random.split(key)

    @jax.jit
    def make_db(kk):
        db = jax.random.normal(kk, (n_pad, d), jnp.float32)
        if metric == "cosine":
            db = db / jnp.maximum(
                jnp.linalg.norm(db, axis=-1, keepdims=True), 1e-8)
        return db.astype(dtype)

    db = make_db(kd)
    sq = (jnp.sum(db.astype(jnp.float32) ** 2, -1)
          if metric == "euclidean" else None)
    q0 = jax.random.normal(kq, (batch, d), jnp.float32)
    count = np.int32(n)
    jax.block_until_ready(db)
    log(f"db ready: {n}x{d} {metric} k={k} b={batch}")

    @jax.jit
    def step(q, db, sq, acc):
        keys, idx = pallas_flat_topk(q, db, count, k, metric=metric,
                                     db_sqnorms=sq)
        q2 = q + jnp.mean(keys) * 1e-6
        return q2, acc + jnp.sum(keys)

    t0 = time.perf_counter()
    q, acc = step(q0, db, sq, jnp.float32(0))
    float(acc)
    log(f"  compile+first {time.perf_counter()-t0:.1f}s")
    for _ in range(5):
        q, acc = step(q, db, sq, acc)
    float(acc)
    t0 = time.perf_counter()
    for _ in range(iters):
        q, acc = step(q, db, sq, acc)
    float(acc)
    dt = (time.perf_counter() - t0) / iters
    log(f"  RESULT {n}x{d} {metric} k={k} b={batch}: "
        f"{dt*1e3:.3f} ms/batch = {batch/dt:.0f} QPS")
    return dt


def main():
    log(f"backend: {jax.default_backend()}")
    if not correctness():
        log("FAILED correctness; aborting bench")
        sys.exit(1)
    # BASELINE config #2: 1M x 128D L2 top-100 batched (previous: 22.6 ms
    # on the XLA merge-chain path; target < 8 ms)
    bench(1_000_000, 128, 100, 64, "euclidean")
    # same config on the small-k kernel for reference
    bench(1_000_000, 128, 10, 64, "euclidean")
    # headline dim at k=100
    bench(1_000_000, 768, 100, 64, "cosine")
    log("done")


if __name__ == "__main__":
    main()
