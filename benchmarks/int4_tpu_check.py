#!/usr/bin/env python
"""int4 capacity-mode TPU measurement: the quant4 Pallas scan.

int8 serves 16M x 768D on one 16 GB chip at 25.1 ms/batch-64 (r3); int4
packs two components per byte, so the same chip holds 32M x 768D
(12.3 GiB packed + 128 MiB scales). Targets: the kernel streams half of
int8's bytes per row, so <= ~30 ms at 32M (>= 400 GiB/s effective), and
top-10 selections must reach the f32 ground-truth k-th score within the
int4 noise band (~0.01 cosine) on a 1M slice.

Usage: setsid nohup python benchmarks/int4_tpu_check.py > log 2>&1 &
Env: VDB_INT4_ROWS (default 33554432), VDB_INT4_CHECK_ROWS (default 2^20).
"""

import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tpu_vector_db.ops.pallas_scan import pallas_flat_topk as _pallas  # noqa: E402
from tpu_vector_db.ops.quant4 import pack_int4, unpack_int4  # noqa: E402

_INTERP = jax.default_backend() != "tpu"


def pallas_flat_topk(*a, **kw):
    return _pallas(*a, interpret=_INTERP, **kw)


DIM, BATCH, K = 768, 64, 10
FILL = 2 ** 19


def log(msg):
    print(msg, file=sys.stderr, flush=True)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _fill(buf, scales, key, start):
    x = jax.random.normal(key, (FILL, DIM), jnp.float32)
    norm = jnp.sqrt(jnp.sum(x * x, -1, keepdims=True))
    x = x / jnp.maximum(norm, 1e-8)
    p, s = pack_int4(x)
    return (jax.lax.dynamic_update_slice(buf, p, (start, 0)),
            jax.lax.dynamic_update_slice(scales, s, (start,)))


def build_db(n_pad: int):
    buf = jnp.zeros((n_pad, DIM // 2), jnp.uint8)
    scales = jnp.zeros((n_pad,), jnp.float32)
    key = jax.random.PRNGKey(0)
    for i in range(n_pad // FILL):
        key, sub = jax.random.split(key)
        buf, scales = _fill(buf, scales, sub, jnp.int32(i * FILL))
    jax.block_until_ready(buf)
    return buf, scales


def time_scan(q, db, scales, count, iters=20):
    """One jitted step with a device-side data-dependency chain + one
    final D2H (axon block_until_ready under-reports, and per-op eager
    dispatch through the tunnel adds ~tens of ms per call; same harness
    as int8_tpu_check.measure)."""
    @jax.jit
    def step(qq, dbx, scl, acc):
        # db/scales passed as ARGS — closed-over device arrays become HLO
        # constants (CLAUDE.md)
        vals, _ = pallas_flat_topk(qq, dbx, np.int32(count), K,
                                   metric="cosine", db_scales=scl)
        return qq + jnp.mean(vals) * 1e-6, acc + jnp.sum(vals)

    qq, acc = step(q, db, scales, jnp.float32(0))
    float(acc)  # compile + first
    for _ in range(3):
        qq, acc = step(qq, db, scales, acc)
    float(acc)
    t0 = time.perf_counter()
    for _ in range(iters):
        qq, acc = step(qq, db, scales, acc)
    float(acc)
    return (time.perf_counter() - t0) / iters


def main():
    n = int(os.environ.get("VDB_INT4_ROWS", 2 ** 25))       # 32M
    n_check = int(os.environ.get("VDB_INT4_CHECK_ROWS", 2 ** 20))
    rng = np.random.default_rng(1)
    q = rng.standard_normal((BATCH, DIM)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    qj = jnp.asarray(q)

    # ---- correctness on a 1M slice vs f32 ground truth
    log(f"building {n_check} check rows")
    db_c, sc_c = build_db(n_check)
    vals, idx = pallas_flat_topk(qj, db_c, np.int32(n_check), K,
                                 metric="cosine", db_scales=sc_c)
    vals, idx = np.asarray(vals), np.asarray(idx)
    deq = np.asarray(unpack_int4(db_c, sc_c), np.float32)
    gt = q @ deq.T                       # scores of the stored points
    kth = np.sort(gt, axis=1)[:, -K]
    sel = np.take_along_axis(gt, idx, axis=1)
    key_err = float(np.max(np.abs(vals - sel)))
    score_slack = float(np.min(sel - kth[:, None]))
    log(f"key_err={key_err:.4f} score_slack={score_slack:.4f}")
    assert key_err < 0.01, key_err       # keys == dequantized scores
    assert score_slack > -0.02, score_slack
    t_1m = time_scan(qj, db_c, sc_c, n_check)
    log(f"1M scan {t_1m*1e3:.2f} ms")
    del db_c, sc_c, deq

    # ---- capacity timing at 32M
    log(f"building {n} rows ({n * (DIM // 2 + 4) / 2**30:.1f} GiB)")
    t0 = time.perf_counter()
    db, scales = build_db(n)
    log(f"built in {time.perf_counter() - t0:.0f}s")
    dt = time_scan(qj, db, scales, n)
    bytes_swept = n * (DIM // 2 + 4)
    gibs = bytes_swept / dt / 2**30
    qps = BATCH / dt
    print(json.dumps({
        "metric": f"flat_cosine_int4_{n//1000}Kx{DIM}D_b{BATCH}_k{K}",
        "value": round(qps, 1), "unit": "QPS",
        "latency_ms_per_batch": round(dt * 1e3, 2),
        "effective_gibs": round(gibs, 1),
        "key_err_vs_f32_slice": round(key_err, 5),
        "score_slack_vs_f32_slice": round(score_slack, 5),
        "scan_ms_1M_slice": round(t_1m * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
