#!/usr/bin/env python
"""int8 capacity-mode TPU measurement: fused Pallas scan vs the XLA scan.

Round-2 measured the XLA int8 scan conversion-bound at ~197 GB/s effective
(16M x 768D batch-64 = 54.2 ms). The Pallas kernel keeps int8 bytes through
the DMA and widens in VMEM, so the target is >= 350 GB/s effective
(<= ~30 ms at 16M) per VERDICT.md item 3.

Usage: setsid nohup python benchmarks/int8_tpu_check.py > log 2>&1 &
Env: VDB_INT8_ROWS (default 16777216), VDB_INT8_ENGINE (pallas|xla|both).
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_vector_db.ops.pallas_scan import pallas_flat_topk as _pallas  # noqa: E402
from tpu_vector_db.ops.scan import flat_scan_topk  # noqa: E402

# CPU smoke runs fall back to interpret mode (slow but correct)
_INTERP = jax.default_backend() != "tpu"


def pallas_flat_topk(*a, **kw):
    return _pallas(*a, interpret=_INTERP, **kw)


DIM, BATCH, K = 768, 64, 10
FILL = 2 ** 19  # rows per generation step (f32 transient = 1.5 GiB)


def log(msg):
    print(msg, file=sys.stderr, flush=True)


@functools.partial(jax.jit, donate_argnums=(0,))
def _fill(buf, key, start):
    # donated int8 buffer + dynamic_update_slice: constant transient HBM
    # (concatenating per-block arrays doubles residency near capacity)
    x = jax.random.normal(key, (FILL, DIM), jnp.float32)
    norm = jnp.sqrt(jnp.sum(x * x, -1, keepdims=True))
    x = x / jnp.maximum(norm, 1e-8)
    q = jnp.clip(jnp.round(x * 127.0), -127, 127).astype(jnp.int8)
    return jax.lax.dynamic_update_slice(buf, q, (start, 0))


def build_db(n_pad: int):
    buf = jnp.zeros((n_pad, DIM), jnp.int8)
    key = jax.random.PRNGKey(0)
    for i in range(n_pad // FILL):
        key, sub = jax.random.split(key)
        buf = _fill(buf, sub, jnp.int32(i * FILL))
    jax.block_until_ready(buf)
    return buf


def measure(engine_fn, q0, db, iters=30):
    @jax.jit
    def step(q, db, acc):
        keys, idx = engine_fn(q, db)
        q2 = q + jnp.mean(keys) * 1e-6
        return q2, acc + jnp.sum(keys)

    t0 = time.perf_counter()
    q, acc = step(q0, db, jnp.float32(0))
    float(acc)
    log(f"  compile+first {time.perf_counter() - t0:.1f}s")
    for _ in range(3):
        q, acc = step(q, db, acc)
    float(acc)
    t0 = time.perf_counter()
    for _ in range(iters):
        q, acc = step(q, db, acc)
    float(acc)
    return (time.perf_counter() - t0) / iters


def main():
    n = int(os.environ.get("VDB_INT8_ROWS", str(16 * 2 ** 20)))
    which = os.environ.get("VDB_INT8_ENGINE", "both")
    n_pad = ((n + FILL - 1) // FILL) * FILL
    count = jnp.int32(n)
    log(f"building {n_pad} x {DIM} int8 db "
        f"({n_pad * DIM / 2**30:.1f} GiB) on {jax.default_backend()}")
    t0 = time.perf_counter()
    db = build_db(n_pad)
    log(f"db built in {time.perf_counter() - t0:.0f}s")
    kq = jax.random.PRNGKey(1)
    q0 = jax.random.normal(kq, (BATCH, DIM), jnp.float32)
    q0 = q0 / jnp.sqrt(jnp.sum(q0 * q0, -1, keepdims=True))

    results = {}
    if which in ("pallas", "both"):
        log("pallas engine:")
        dt = measure(lambda q, d: pallas_flat_topk(
            q, d, count, K, metric="cosine"), q0, db)
        gbs = n_pad * DIM / dt / 2**30
        results["pallas_ms"] = round(dt * 1e3, 2)
        results["pallas_gbps_effective"] = round(gbs, 1)
        log(f"  {dt*1e3:.2f} ms/batch-{BATCH}  {gbs:.0f} GiB/s  "
            f"{BATCH/dt:.0f} QPS")
    if which in ("xla", "both"):
        log("xla engine:")
        dt = measure(lambda q, d: flat_scan_topk(
            q, d, count, K, metric="cosine", db_normalized=True,
            block_rows=FILL), q0, db, iters=10)
        results["xla_ms"] = round(dt * 1e3, 2)
        results["xla_gbps_effective"] = round(n_pad * DIM / dt / 2**30, 1)
        log(f"  {dt*1e3:.2f} ms/batch-{BATCH}")

    if which == "both":
        # exactness gate: the two engines' keys agree up to bf16 query
        # rounding (scores are in 127-scale: tol 1.0 ~ bf16 eps * |q.x|max)
        import numpy as np
        pv, _ = pallas_flat_topk(q0, db, count, K, metric="cosine")
        xv, _ = flat_scan_topk(q0, db, count, K, metric="cosine",
                               db_normalized=True, block_rows=FILL)
        diff = float(np.max(np.abs(np.asarray(pv) - np.asarray(xv))))
        results["max_key_diff"] = round(diff, 3)
        results["keys_agree"] = diff <= 1.0
    results["n"] = n_pad
    print(json.dumps({"metric": f"int8_scan_{n_pad//2**20}Mx{DIM}D_b{BATCH}",
                      **results}), flush=True)


if __name__ == "__main__":
    main()
