#!/usr/bin/env python
"""Filtered-query measurement (VERDICT r2 item 5).

Measures the masked exact scan at metadata-filter selectivities 10% / 1% /
0.1% on 1M x 768D bf16 (the filter mask streams into the Pallas kernel,
ops/pallas_scan.py), and the IVF k*10-oversample path on the same data, so
BENCHMARKS.md can publish a filtered table and the store's routing of
pathological selectivities to the masked exact scan is evidence-backed.
The reference's filter path was a published capability
(service/optimized_vector_store.py:123,131-141: oversample k*10 then
post-filter in Python).

Usage: setsid nohup python benchmarks/filtered_tpu.py > log 2>&1 &
Env: VDB_FILTERED_ROWS (default 1M), VDB_FORCE_CPU=1 for host smoke.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpu_vector_db.ops.scan import flat_scan_topk  # noqa: E402

DIM, BATCH, K = 768, 64, 10
FILL = 2 ** 19


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_db(n_pad):
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("rows",))
    def fill(buf, key, start, rows):
        x = jax.random.normal(key, (rows, DIM), jnp.float32)
        x = x / jnp.maximum(jnp.sqrt(jnp.sum(x * x, -1, keepdims=True)),
                            1e-8)
        return jax.lax.dynamic_update_slice(buf, x.astype(jnp.bfloat16),
                                            (start, 0))

    buf = jnp.zeros((n_pad, DIM), jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    s = 0
    while s < n_pad:
        r = min(FILL, n_pad - s)
        key, sub = jax.random.split(key)
        buf = fill(buf, sub, jnp.int32(s), r)
        s += r
    jax.block_until_ready(buf)
    return buf


def measure(engine, q0, db, mask, iters=30):
    # db/mask are ARGUMENTS of the jitted step — closing over them would
    # embed 1.5GB as HLO constants and blow the tunnel upload limit (413)
    @jax.jit
    def step(q, acc, db, mask):
        keys, _ = engine(q, db, mask)
        q2 = q + jnp.mean(keys) * 1e-6
        return q2, acc + jnp.sum(keys.astype(jnp.float32))

    t0 = time.perf_counter()
    q, acc = step(q0, jnp.float32(0), db, mask)
    float(acc)
    log(f"  compile+first {time.perf_counter() - t0:.1f}s")
    for _ in range(3):
        q, acc = step(q, acc, db, mask)
    float(acc)
    t0 = time.perf_counter()
    for _ in range(iters):
        q, acc = step(q, acc, db, mask)
    float(acc)
    return (time.perf_counter() - t0) / iters


def main():
    on_tpu = jax.default_backend() == "tpu"
    n = int(os.environ.get("VDB_FILTERED_ROWS",
                           str(1_000_000 if on_tpu else 100_000)))
    n_pad = ((n + FILL - 1) // FILL) * FILL
    log(f"building {n_pad} x {DIM} bf16 on {jax.default_backend()}")
    db = build_db(n_pad)
    count = jnp.int32(n)
    q0 = jax.random.normal(jax.random.PRNGKey(1), (BATCH, DIM), jnp.float32)
    q0 = q0 / jnp.sqrt(jnp.sum(q0 * q0, -1, keepdims=True))

    if on_tpu:
        from tpu_vector_db.ops.pallas_scan import pallas_flat_topk

        def engine(q, db, mask):
            if mask is None:
                return pallas_flat_topk(q, db, count, K, metric="cosine")
            return pallas_flat_topk(q, db, count, K, metric="cosine",
                                    filter_mask=mask)
    else:
        def engine(q, db, mask):
            return flat_scan_topk(q, db, count, K, metric="cosine",
                                  db_normalized=True, filter_mask=mask,
                                  block_rows=FILL)

    rng = np.random.default_rng(0)
    results = {"metric": f"filtered_scan_{n//1000}Kx{DIM}D_b{BATCH}_k{K}",
               "rows": []}

    iters = 30 if on_tpu else 3
    dt = measure(engine, q0, db, None, iters=iters)
    results["rows"].append({"selectivity": 1.0,
                            "ms_per_batch": round(dt * 1e3, 2),
                            "qps": round(BATCH / dt, 0)})
    log(f"unfiltered: {dt*1e3:.2f} ms")

    for sel in (0.10, 0.01, 0.001):
        mask_host = (rng.random(n_pad) < sel).astype(np.float32)
        mask_host[n:] = 0.0
        live = int(mask_host.sum())
        mask = jnp.asarray(mask_host)
        dt = measure(engine, q0, db, mask, iters=iters)
        # correctness: filtered result ids must all be mask-live
        keys, idx = engine(q0, db, mask)
        idx = np.asarray(idx)
        keys = np.asarray(keys)
        ok = bool(np.all((mask_host[idx] > 0.5) | (keys == -np.inf)
                         | (keys < -1e30)))
        results["rows"].append({
            "selectivity": sel, "live_rows": live,
            "ms_per_batch": round(dt * 1e3, 2),
            "qps": round(BATCH / dt, 0), "ids_respect_filter": ok})
        log(f"sel={sel}: {dt*1e3:.2f} ms live={live} ok={ok}")

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
