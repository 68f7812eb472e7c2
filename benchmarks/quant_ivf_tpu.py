#!/usr/bin/env python
"""Gather-layout IVF over the quantized capacity modes, on the real chip.

The exact engine serves 16M x 768D int8 at ~25.5 ms/batch-64 and 32M x
768D int4 at ~37 ms — a full HBM sweep either way, so batch-1 p50 IS the
sweep time. Gather-layout IVF (ops/ivf_scan.ivf_probe_topk_gather) probes
nprobe buckets by GATHERING their rows from the flat matrix (no bucketized
copy — it could not fit at capacity scale): the scanned fraction is
~nprobe*Bc/N, so batch-1 latency should drop by >10x at recall ~1 on
clustered data. This harness measures, per dtype:

- IVF build time (k-means trains straight on the quantized rows)
- batch-1 and batch-8 probe p50 (folded chains, min-of-3 — bench.py
  method) vs the exact sweep
- score-recall@10 vs exact ground truth on the same quantized rows

Usage: setsid nohup python benchmarks/quant_ivf_tpu.py > log 2>&1 &
Env: VDB_FORCE_CPU=1 smoke mode (small N); VDB_QIVF_DTYPE=int8|int4|both.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from tpu_vector_db.index.ivf import IVFIndex, _select_buckets  # noqa: E402
from tpu_vector_db.ops.ivf_scan import ivf_probe_topk_gather  # noqa: E402
from tpu_vector_db.ops.pallas_scan import pallas_flat_topk  # noqa: E402
from tpu_vector_db.ops.quant4 import pack_int4  # noqa: E402
from tpu_vector_db.ops.scan import flat_scan_topk  # noqa: E402

D = 768
FILL = 2 ** 19


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_quant_db(n_pad, dtype, n_centers=8192, spread=0.25, seed=0):
    """Clustered unit-norm rows quantized on device (the regime the IVF
    recall contract is stated on)."""
    kc = jax.random.PRNGKey(seed + 99)
    centers = jax.random.normal(kc, (n_centers, D), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       static_argnames=("rows",))
    def fill_fn(buf, scl, cents, key, start, rows):
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (rows,), 0, n_centers)
        x = cents[idx] + spread * jax.random.normal(k2, (rows, D),
                                                    jnp.float32)
        x = x / jnp.maximum(
            jnp.sqrt(jnp.sum(x * x, -1, keepdims=True)), 1e-8)
        if dtype == "int8":
            q = jnp.clip(jnp.round(x * 127.0), -127, 127).astype(jnp.int8)
            return (jax.lax.dynamic_update_slice(buf, q, (start, 0)), scl)
        p, s = pack_int4(x)
        return (jax.lax.dynamic_update_slice(buf, p, (start, 0)),
                jax.lax.dynamic_update_slice(scl, s, (start,)))

    cols = D if dtype == "int8" else D // 2
    buf = jnp.zeros((n_pad, cols), jnp.int8 if dtype == "int8"
                    else jnp.uint8)
    scl = jnp.zeros((n_pad,), jnp.float32)
    key = jax.random.PRNGKey(seed)
    start = 0
    while start < n_pad:
        rows = min(FILL, n_pad - start)
        key, sub = jax.random.split(key)
        buf, scl = fill_fn(buf, scl, centers, sub, jnp.int32(start), rows)
        start += rows
    jax.block_until_ready(buf)
    return buf, (scl if dtype == "int4" else None)


def folded_chain(step, q0, args, iters, inner=10):
    @jax.jit
    def chunk(q, acc, *args):
        def body(_, carry):
            q, acc = carry
            return step(q, acc, *args)
        return jax.lax.fori_loop(0, inner, body, (q, acc))

    t0 = time.perf_counter()
    q, acc = chunk(q0, jnp.float32(0), *args)
    float(acc)
    log(f"  compile+first {time.perf_counter() - t0:.1f}s")
    for _ in range(2):
        q, acc = chunk(q, acc, *args)
    float(acc)
    outer = max(1, iters // inner)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(outer):
            q, acc = chunk(q, acc, *args)
        float(acc)
        best = min(best, (time.perf_counter() - t0) / (outer * inner))
    return best


def run_dtype(dtype, on_tpu):
    n = (16 * 2 ** 20 if dtype == "int8" else 32 * 2 ** 20) if on_tpu \
        else 20_000
    n_pad = ((n + 131071) // 131072) * 131072
    res = {"metric": f"quant_ivf_{dtype}_{n//1000}Kx{D}D",
           "rows": n, "dtype": dtype}
    log(f"[{dtype}] building {n_pad} x {D} clustered quantized db")
    db, scales = build_quant_db(n_pad, dtype,
                                n_centers=8192 if on_tpu else 64)

    idx = IVFIndex(dim=D, metric="cosine",
                   nprobe=64 if on_tpu else 8,
                   n_clusters=None if on_tpu else 64)
    t0 = time.perf_counter()
    st = idx.build(db, n, scales=scales)
    res["build_s"] = round(time.perf_counter() - t0, 1)
    res["clusters"] = st["clusters"]
    log(f"  built in {res['build_s']}s C={st['clusters']} "
        f"NB={st['buckets']}")
    idx._ensure_device(db, None)
    dev = idx._dev
    assert "buckets" not in dev, "quantized db must take the gather layout"
    nprobe = idx.nprobe

    def mk_step(batch):
        def step(q, acc, db, scl, ids, cents, bclust, csq):
            sel = _select_buckets(q, cents, bclust, nprobe, "cosine", csq)
            kv, _ = ivf_probe_topk_gather(q, db, ids, sel, 10,
                                          db_scales=scl)
            kv = jnp.where(jnp.isfinite(kv), kv, 0.0)
            return q + jnp.mean(kv) * 1e-9, acc + jnp.sum(kv)
        return step

    iargs = (db, scales, dev["ids"], dev["centroids"],
             dev["bucket_cluster"], dev["c_sqnorms"])
    for batch in (1, 8):
        q0 = jax.random.normal(jax.random.PRNGKey(3), (batch, D),
                               jnp.float32)
        q0 = q0 / jnp.sqrt(jnp.sum(q0 * q0, -1, keepdims=True))
        dt = folded_chain(mk_step(batch), q0, iargs,
                          30 if on_tpu else 4)
        res[f"ivf_b{batch}_ms"] = round(dt * 1e3, 3)
        res[f"ivf_b{batch}_qps"] = round(batch / dt, 1)
        log(f"  ivf b{batch}: {dt*1e3:.3f} ms")

    # exact sweep reference point at batch-1 (the current capacity-mode
    # serving latency)
    count = jnp.int32(n)

    def exact_step(q, acc, db, scl):
        if on_tpu:
            kv, _ = pallas_flat_topk(q, db, count, 10, metric="cosine",
                                     db_scales=scl)
        else:
            kv, _ = flat_scan_topk(q, db, count, 10, metric="cosine",
                                   db_normalized=True, db_scales=scl)
        return q + jnp.mean(kv) * 1e-9, acc + jnp.sum(kv)

    q0 = jax.random.normal(jax.random.PRNGKey(4), (1, D), jnp.float32)
    q0 = q0 / jnp.sqrt(jnp.sum(q0 * q0, -1, keepdims=True))
    dt = folded_chain(exact_step, q0, (db, scales),
                      20 if on_tpu else 2)
    res["exact_b1_ms"] = round(dt * 1e3, 3)
    res["speedup_b1"] = round(res["exact_b1_ms"] / res["ivf_b1_ms"], 1)
    log(f"  exact b1: {dt*1e3:.3f} ms -> ivf speedup "
        f"{res['speedup_b1']}x")

    # score-recall@10 vs exact ground truth on the same quantized rows
    nq = 32
    qs = jax.random.normal(jax.random.PRNGKey(5), (nq, D), jnp.float32)
    qs = qs / jnp.sqrt(jnp.sum(qs * qs, -1, keepdims=True))
    ids_all, keys_all = idx.search(qs, db, n, k=10, scales=scales)
    if on_tpu:
        ek, _ = pallas_flat_topk(qs, db, count, 10, metric="cosine",
                                 db_scales=scales)
    else:
        ek, _ = flat_scan_topk(qs, db, count, 10, metric="cosine",
                               db_normalized=True, db_scales=scales)
    kth = np.asarray(ek, np.float32)[:, -1]
    sel_keys = np.asarray(keys_all, np.float32)
    scale = 127.0 if dtype == "int8" else 1.0
    tol = 0.004 * np.maximum(np.abs(kth), 1.0 * scale)
    res["score_recall_at_10"] = round(
        float(np.mean(sel_keys >= kth[:, None] - tol[:, None])), 4)
    log(f"  score-recall@10 = {res['score_recall_at_10']}")
    del db, scales, idx
    return res


def main():
    on_tpu = jax.default_backend() == "tpu"
    which = os.environ.get("VDB_QIVF_DTYPE", "both")
    out = []
    for dtype in ("int8", "int4"):
        if which not in ("both", dtype):
            continue
        out.append(run_dtype(dtype, on_tpu))
        print(json.dumps(out[-1]), flush=True)


if __name__ == "__main__":
    main()
