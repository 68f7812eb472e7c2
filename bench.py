#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line.

Top-level fields stay the headline config (1M x 768D cosine flat scan, bf16,
batch-64, top-10 — the reference publishes 437.96 QPS / 2.28 ms there,
README.md:68, M2/M3; vs_baseline = our QPS / 437.96). The "suite" field
attests every other headline claim with a driver-captured measurement
(VERDICT r2 item 4): BASELINE configs #1-#4, the IVF batch-1 operating
point with its recall gate, the big-k kernel, the int8 capacity mode, and
the per-shard slice of config #5 (10M x 128D / v5e-8 = 1.25M x 128D).

Method: databases are generated ON DEVICE (the TPU sits behind a network
tunnel, ~0.3 GB/s H2D); sweeps are serialized by a data dependency (next
query batch derived from previous results) so pipelined dispatch can't
overlap the thing being measured, and one device->host sync lands after the
timed chain. Batch-1 rows chain 50 dependent queries — through-the-tunnel
per-call timing would measure the tunnel, not the device.
"""

import json
import os
import sys
import time

VERBOSE = bool(os.environ.get("BENCH_VERBOSE"))


def _log(msg: str) -> None:
    if VERBOSE:
        print(msg, file=sys.stderr, flush=True)


import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)) or ".")

from tpu_vector_db.ops.scan import flat_scan_topk  # noqa: E402

ON_TPU = None  # resolved in main
BLOCK = 131072

# reference-published rows (README.md:63-68) for vs_baseline where a
# comparable config exists
REF = {
    "1Mx768D": 437.96,    # README.md:68
    "1Mx1536D": 235.08,   # README.md:66
    "1Mx1024D": 326.83,   # README.md:67
    "2Mx384D": 685.79,    # README.md:65
    "5Mx128D": 687.76,    # README.md:64
    "10Mx128D": 446.56,   # README.md:63 (config #5 target)
}


def _engine(count, k, metric="cosine", block=BLOCK):
    """Returns fn(q, db). db MUST flow in as an argument — a device array
    captured in a jit closure is embedded as an HLO constant; at 1.5GB that
    blows the axon tunnel's compile-upload limit (HTTP 413)."""
    if ON_TPU:
        from tpu_vector_db.ops.pallas_scan import pallas_flat_topk
        return lambda q, db: pallas_flat_topk(q, db, count, k,
                                              metric=metric)
    return lambda q, db: flat_scan_topk(
        q, db, count, k, metric=metric, db_normalized=True,
        db_sqnorms=(jnp.sum(db.astype(jnp.float32) ** 2, -1)
                    if metric == "euclidean" else None),
        block_rows=block)


def _normal_db(n_pad, d, dtype=jnp.bfloat16, seed=0, fill=2 ** 19):
    """Unit-norm rows, generated on device in donated slabs."""
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("rows",))
    def fill_fn(buf, key, start, rows):
        x = jax.random.normal(key, (rows, d), jnp.float32)
        x = x / jnp.maximum(
            jnp.sqrt(jnp.sum(x * x, -1, keepdims=True)), 1e-8)
        if dtype == jnp.int8:
            from tpu_vector_db.ops.quant4 import quantize_unit_rows
            x = quantize_unit_rows(x, "int8")[0]  # THE store quantizer
        return jax.lax.dynamic_update_slice(
            buf, x.astype(dtype), (start, 0))

    buf = jnp.zeros((n_pad, d), dtype)
    key = jax.random.PRNGKey(seed)
    start = 0
    while start < n_pad:
        rows = min(fill, n_pad - start)
        key, sub = jax.random.split(key)
        buf = fill_fn(buf, sub, jnp.int32(start), rows)
        start += rows
    jax.block_until_ready(buf)
    return buf


def _clustered_db(n_pad, d, n_centers=4096, seed=0, spread=0.2,
                  fill=2 ** 19):
    """Unit-norm clustered rows (the regime ANN recall is judged on)."""
    import functools

    kc = jax.random.PRNGKey(seed + 999)
    centers = jax.random.normal(kc, (n_centers, d), jnp.float32)

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("rows",))
    def fill_fn(buf, cents, key, start, rows):
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (rows,), 0, n_centers)
        x = cents[idx] + spread * jax.random.normal(k2, (rows, d),
                                                    jnp.float32)
        x = x / jnp.maximum(
            jnp.sqrt(jnp.sum(x * x, -1, keepdims=True)), 1e-8)
        return jax.lax.dynamic_update_slice(
            buf, x.astype(jnp.bfloat16), (start, 0))

    buf = jnp.zeros((n_pad, d), jnp.bfloat16)
    key = jax.random.PRNGKey(seed)
    start = 0
    while start < n_pad:
        rows = min(fill, n_pad - start)
        key, sub = jax.random.split(key)
        buf = fill_fn(buf, centers, sub, jnp.int32(start), rows)
        start += rows
    jax.block_until_ready(buf)
    return buf


def _measure_step_chain(step, q0, args, iters, warm=2):
    """ONE timing harness for every row (review finding: three drifting
    copies measured subtly different things). Data-dependency chain +
    one final D2H; returns s/iteration.

    step(q, acc, *args) -> (q', acc') must keep q' dependent on the
    step's result. The chain is folded INNER steps per dispatched
    program with lax.fori_loop: the axon tunnel imposes a measured
    ~0.7 ms/dispatch floor that would otherwise dominate every batch-1
    row; folding measures the device, matching a locally-attached
    production host. INNER stays small (10) — giant loop programs
    compile pathologically slowly on axon (CLAUDE.md). Large arrays
    flow through `args` (a jit closure would embed them as HLO
    constants). min-of-3 reps strips the chip's ±30% cross-minute
    drift — the min is the reproducible device capability."""
    inner = min(10, iters)

    @jax.jit
    def chunk(q, acc, *args):
        def body(_, carry):
            q, acc = carry
            return step(q, acc, *args)
        return jax.lax.fori_loop(0, inner, body, (q, acc))

    t0 = time.perf_counter()
    q, acc = chunk(q0, jnp.float32(0), *args)
    float(acc)
    _log(f"  compile+first {time.perf_counter() - t0:.1f}s")
    for _ in range(warm):
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


def _topk_step(engine):
    """Standard step: run the engine, perturb q by the result (data
    dependency), accumulate finite keys (NEG_INF pads from short probe
    sets must not poison acc — review finding in the old _ivf_row copy)."""
    def step(q, acc, *args):
        keys, _ = engine(q, *args)
        keys = jnp.where(jnp.isfinite(keys), keys.astype(jnp.float32), 0.0)
        return q + jnp.mean(keys) * 1e-9, acc + jnp.sum(keys)
    return step


def _measure_chain(engine, q0, db, iters, warm=2):
    """Back-compat wrapper: single-db-arg engines."""
    return _measure_step_chain(_topk_step(engine), q0, (db,), iters,
                               warm=warm)


def _queries(batch, d, seed=1):
    q = jax.random.normal(jax.random.PRNGKey(seed), (batch, d), jnp.float32)
    return q / jnp.sqrt(jnp.sum(q * q, -1, keepdims=True))


def _scan_row(name, n, d, batch, k, dtype=jnp.bfloat16, metric="cosine",
              ref_key=None, iters=None):
    n_eff = n if ON_TPU else min(n, 100_000)
    n_pad = ((n_eff + BLOCK - 1) // BLOCK) * BLOCK
    _log(f"{name}: building {n_pad} x {d} {np.dtype(dtype).name}")
    db = _normal_db(n_pad, d, dtype=dtype)
    count = jnp.int32(n_eff)
    engine = _engine(count, k, metric, block=min(BLOCK, n_pad))
    iters = iters or (50 if ON_TPU else 3)
    dt = _measure_chain(engine, _queries(batch, d), db, iters)
    qps = batch / dt
    row = {
        "metric": f"{name}_{n_eff//1000}Kx{d}D_b{batch}_k{k}"
                  f"_{np.dtype(dtype).name}_{metric}",
        "value": round(qps, 1), "unit": "QPS",
        "latency_ms_per_batch": round(dt * 1e3, 3),
    }
    # vs_baseline only when the run is at FULL size: a CPU fallback caps
    # n_eff at 100K, and dividing that QPS by the reference's full-size
    # number would record a bogus ratio (review finding)
    if ref_key and n_eff == n:
        row["vs_baseline"] = round(qps / REF[ref_key], 2)
        row["baseline_qps"] = REF[ref_key]
    del db
    return row


def _int4_row():
    """int4 capacity mode: 32M x 768D on one chip (12.1 GiB packed db +
    128 MiB scales — 2x int8's rows; ops/quant4.py + the quant4 kernel).
    Keys are true scores of the dequantized rows (TPU-verified key_err
    2e-4, score slack within the int4 noise band,
    benchmarks/int4_tpu_check.py)."""
    import functools

    from tpu_vector_db.ops.pallas_scan import pallas_flat_topk
    from tpu_vector_db.ops.quant4 import pack_int4

    d, batch, k = 768, 64, 10
    n = 32 * 2 ** 20 if ON_TPU else 20_000  # interpret mode on CPU
    n_pad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    _log(f"flat_cosine_int4: building {n_pad} x {d} packed uint8")
    fill = 2 ** 19

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       static_argnames=("rows",))
    def fill_fn(buf, scl, key, start, rows):
        x = jax.random.normal(key, (rows, d), jnp.float32)
        x = x / jnp.maximum(
            jnp.sqrt(jnp.sum(x * x, -1, keepdims=True)), 1e-8)
        p, s = pack_int4(x)
        return (jax.lax.dynamic_update_slice(buf, p, (start, 0)),
                jax.lax.dynamic_update_slice(scl, s, (start,)))

    buf = jnp.zeros((n_pad, d // 2), jnp.uint8)
    scl = jnp.zeros((n_pad,), jnp.float32)
    key = jax.random.PRNGKey(0)
    start = 0
    while start < n_pad:
        rows = min(fill, n_pad - start)
        key, sub = jax.random.split(key)
        buf, scl = fill_fn(buf, scl, sub, jnp.int32(start), rows)
        start += rows
    jax.block_until_ready(buf)

    count = jnp.int32(n)

    def engine(q, db):
        packed, scales = db  # pytree arg: both must flow in as arguments
        return pallas_flat_topk(q, packed, count, k, metric="cosine",
                                db_scales=scales,
                                interpret=not ON_TPU)

    dt = _measure_chain(engine, _queries(batch, d), (buf, scl),
                        20 if ON_TPU else 2)
    qps = batch / dt
    return {
        "metric": f"flat_cosine_int4_{n//1000}Kx{d}D_b{batch}_k{k}",
        "value": round(qps, 1), "unit": "QPS",
        "latency_ms_per_batch": round(dt * 1e3, 3),
    }


def _ivf_row():
    """BASELINE config #3 regime: 1M x 768D clustered, IVF batch-1 with a
    score-recall@10 gate vs f32 ground truth (bf16 tie-ambiguity makes
    id-recall meaningless on tight clusters — BENCHMARKS.md)."""
    from tpu_vector_db.index.ivf import IVFIndex

    n = 1_000_000 if ON_TPU else 50_000
    d = 768
    n_pad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    _log(f"ivf: building clustered {n_pad} x {d}")
    db = _clustered_db(n_pad, d)
    idx = IVFIndex(dim=d, metric="cosine",
                   nprobe=64 if ON_TPU else 8,
                   n_clusters=None if ON_TPU else 256)
    t0 = time.perf_counter()
    stats = idx.build(db, n)
    build_s = time.perf_counter() - t0
    _log(f"  ivf built in {build_s:.0f}s ({stats['clusters']} clusters)")

    nq = 64
    queries = np.asarray(db[:nq], np.float32)  # stored rows as queries
    qj = jnp.asarray(queries)

    idx.search(qj[:1], db, n, k=10)  # compile + device mirror

    # batch-1 latency: data-dependency chain over the device kernels + one
    # final D2H (idx.search does a per-call D2H; behind the ~30ms tunnel
    # that measures the tunnel, not the chip)
    from tpu_vector_db.index.ivf import _select_buckets
    nprobe = idx.nprobe
    dev = idx._dev
    if ON_TPU:
        from tpu_vector_db.ops.ivf_scan import ivf_probe_topk_pallas

        def ivf_engine(q, buckets, ids_d, fills, cents, bclust, csq):
            s = _select_buckets(q, cents, bclust, nprobe, "cosine", csq)
            return ivf_probe_topk_pallas(q, buckets, ids_d, fills, s, 10)
    else:
        from tpu_vector_db.ops.ivf_scan import ivf_probe_topk_xla

        def ivf_engine(q, buckets, ids_d, fills, cents, bclust, csq):
            s = _select_buckets(q, cents, bclust, nprobe, "cosine", csq)
            return ivf_probe_topk_xla(q, buckets, ids_d, s, 10,
                                      metric="cosine")

    iargs = (dev["buckets"], dev["ids"], dev["fills"], dev["centroids"],
             dev["bucket_cluster"], dev["c_sqnorms"])
    dt = _measure_step_chain(_topk_step(ivf_engine), qj[:1], iargs,
                             50 if ON_TPU else 5)

    # recall gate: every selected row's exact f32 score >= the f32 k-th
    ids_all, keys_all = idx.search(qj, db, n, k=10)

    @jax.jit
    def gt_kth(q, db):
        s = jnp.matmul(q, db[:n].astype(jnp.float32).T,
                       preferred_element_type=jnp.float32)
        vals, _ = jax.lax.top_k(s, 10)
        return vals[:, -1]

    @jax.jit
    def sel_scores(q, db, sel):
        rows = db[jnp.maximum(sel, 0)].astype(jnp.float32)  # (Q, 10, d)
        return jnp.einsum("qd,qkd->qk", q, rows)

    kth = np.asarray(gt_kth(qj, db))
    sel = np.asarray(sel_scores(qj, db, jnp.asarray(ids_all)))
    tol = 0.004 * np.maximum(1.0, np.abs(kth))
    recall = float(np.mean(sel >= (kth[:, None] - tol[:, None])))

    row = {
        "metric": f"ivf_batch1_{n//1000}Kx{d}D_k10_nprobe{idx.nprobe}",
        "value": round(1.0 / dt, 1), "unit": "QPS",
        "latency_ms_p50": round(dt * 1e3, 3),
        "score_recall_at_10": round(recall, 4),
        "build_s": round(build_s, 1),
        "clusters": stats["clusters"],
    }
    # vs_baseline only at FULL size — same gate as the flat rows: a CPU
    # fallback caps n at 50K, and a 50K-row CPU latency divided by the
    # reference's 1M TPU-class number is a bogus ratio (VERDICT r3 item 2)
    if n == 1_000_000:
        row["vs_baseline"] = round((1.0 / dt) / REF["1Mx768D"], 2)
        row["baseline_qps"] = REF["1Mx768D"]
    del db
    return row


def _quant_ivf_row():
    """Gather-layout IVF over the int8 capacity mode: 16M x 768D on one
    chip, batch-1 probes that GATHER rows from the flat matrix (no
    bucketized copy — ops/ivf_scan.ivf_probe_topk_gather). The exact
    engine's batch-1 p50 at this scale is the full ~25 ms sweep
    (int8_capacity row); this row attests the probed path + its
    score-recall gate."""
    import functools

    from tpu_vector_db.index.ivf import IVFIndex, _select_buckets
    from tpu_vector_db.ops.ivf_scan import ivf_probe_topk_gather

    d = 768
    n = 16 * 2 ** 20 if ON_TPU else 20_000
    n_pad = ((n + BLOCK - 1) // BLOCK) * BLOCK
    _log(f"quant_ivf: building {n_pad} x {d} clustered int8")
    n_centers = 8192 if ON_TPU else 64
    kc = jax.random.PRNGKey(99)
    centers = jax.random.normal(kc, (n_centers, d), jnp.float32)

    from tpu_vector_db.ops.quant4 import quantize_unit_rows

    @functools.partial(jax.jit, donate_argnums=(0,),
                       static_argnames=("rows",))
    def fill_fn(buf, cents, key, start, rows):
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (rows,), 0, n_centers)
        x = cents[idx] + 0.25 * jax.random.normal(k2, (rows, d),
                                                  jnp.float32)
        x = x / jnp.maximum(
            jnp.sqrt(jnp.sum(x * x, -1, keepdims=True)), 1e-8)
        # THE store quantizer — a local reimplementation would silently
        # drift from what the store serves (review finding)
        q8 = quantize_unit_rows(x, "int8")[0]
        return jax.lax.dynamic_update_slice(buf, q8, (start, 0))

    buf = jnp.zeros((n_pad, d), jnp.int8)
    key = jax.random.PRNGKey(7)
    start = 0
    while start < n_pad:
        rows = min(2 ** 19, n_pad - start)
        key, sub = jax.random.split(key)
        buf = fill_fn(buf, centers, sub, jnp.int32(start), rows)
        start += rows
    jax.block_until_ready(buf)

    idx = IVFIndex(dim=d, metric="cosine",
                   nprobe=64 if ON_TPU else 8,
                   n_clusters=None if ON_TPU else 64)
    t0 = time.perf_counter()
    st = idx.build(buf, n)
    build_s = time.perf_counter() - t0
    _log(f"  built in {build_s:.0f}s C={st['clusters']}")
    idx._ensure_device(buf, None)
    dev = idx._dev
    nprobe = idx.nprobe

    def gather_engine(q, db, ids, cents, bclust, csq):
        sel = _select_buckets(q, cents, bclust, nprobe, "cosine", csq)
        return ivf_probe_topk_gather(q, db, ids, sel, 10)

    iargs = (buf, dev["ids"], dev["centroids"], dev["bucket_cluster"],
             dev["c_sqnorms"])
    dt = _measure_step_chain(_topk_step(gather_engine), _queries(1, d, 5),
                             iargs, 30 if ON_TPU else 2)

    # score-recall@10 vs the exact engine on the SAME int8 rows
    nq = 16
    qs = _queries(nq, d, seed=6)
    ids_all, keys_all = idx.search(qs, buf, n, k=10)
    count = jnp.int32(n)
    engine = _engine(count, 10)
    ek, _ = engine(qs, buf)
    kth = np.asarray(ek, np.float32)[:, -1]
    tol = 0.004 * np.maximum(np.abs(kth), 127.0)
    recall = float(np.mean(
        np.asarray(keys_all, np.float32) >= kth[:, None] - tol[:, None]))
    row = {
        "metric": f"quant_ivf_int8_{n//1000}Kx{d}D_b1_k10_nprobe{nprobe}",
        "value": round(1.0 / dt, 1), "unit": "QPS",
        "latency_ms_p50": round(dt * 1e3, 3),
        "score_recall_at_10": round(recall, 4),
        "build_s": round(build_s, 1),
        "layout": "gather",
    }
    del buf
    return row


def _backend_alive(timeout_s: int | None = None) -> bool:
    """Probe the device in a SUBPROCESS with a hard timeout: when the
    axon tunnel is down, backend init HANGS for ~30 min rather than
    raising — a try/except in-process cannot degrade gracefully.

    The timeout defaults to 420s (override VDB_BENCH_PROBE_TIMEOUT):
    CLAUDE.md forbids timeout-killing TPU processes because it wedges a
    LIVE tunnel for minutes, so the window is generous enough that only
    an already-dead tunnel gets its probe killed (an 8x8 matmul is a
    tiny program; even a cold tunnel answers in well under a minute —
    the multi-minute compiles are large kernels). A
    healthy (even cold) tunnel answers a tiny matmul well inside the
    timeout; only an already-dead tunnel gets its probe killed."""
    import subprocess
    if timeout_s is None:
        timeout_s = int(os.environ.get("VDB_BENCH_PROBE_TIMEOUT", "420"))
    code = ("import jax, jax.numpy as jnp;"
            "print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()));"
            "print(jax.default_backend())")
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, timeout=timeout_s,
                             text=True)
        return out.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    global ON_TPU
    fallback = False
    if os.environ.get("VDB_FORCE_CPU") or _backend_alive():
        ON_TPU = jax.default_backend() == "tpu"
    else:
        # the tunnel goes down for hours at a time; a dead backend must
        # degrade to a flagged CPU run, not a 30-minute hang + crash
        _log("TPU backend unresponsive; CPU fallback")
        jax.config.update("jax_platforms", "cpu")
        ON_TPU = False
        fallback = True
    suite = []

    def run(name, fn):
        try:
            t0 = time.perf_counter()
            row = fn()
            row["wall_s"] = round(time.perf_counter() - t0, 1)
            suite.append(row)
            _log(f"{name}: {row}")
        except Exception as e:  # noqa: BLE001 — one row must not kill the suite
            suite.append({"metric": name, "error": repr(e)[:300]})
            _log(f"{name}: FAILED {e!r}")

    # headline first (also BASELINE's ">= 10x reference QPS per chip" gate)
    run("headline", lambda: _scan_row(
        "flat_cosine", 1_000_000, 768, 64, 10, ref_key="1Mx768D"))
    # config #1: 100K x 384D exact cosine top-10, batch-1 (no reference
    # row exists at this size — the nearest published config is 20x the
    # rows, so a vs_baseline would mislead in either direction)
    run("config1", lambda: _scan_row(
        "flat_cosine", 100_000, 384, 1, 10))
    # config #2: 1M x 128D L2, batch-64, top-100 (big-k kernel)
    run("config2", lambda: _scan_row(
        "flat_l2_bigk", 1_000_000, 128, 64, 100, metric="euclidean"))
    # config #3 regime: IVF batch-1 + recall gate at 1M x 768D
    run("config3_ivf", _ivf_row)
    # config #4: 1M x 1536D bf16 fused kernel
    run("config4", lambda: _scan_row(
        "flat_cosine", 1_000_000, 1536, 64, 10, ref_key="1Mx1536D"))
    # config #5 per-shard slice: 10M x 128D / v5e-8 = 1.25M x 128D batch-1
    run("config5_shard_slice", lambda: _scan_row(
        "flat_cosine_shard_slice", 1_250_000, 128, 1, 10))
    # every remaining reference-published config (README.md:63-67),
    # measured directly on ONE chip — 10M x 128D (2.4 GiB bf16) fits
    # without sharding
    run("ref_10Mx128D", lambda: _scan_row(
        "flat_cosine", 10_000_000, 128, 64, 10, ref_key="10Mx128D",
        iters=20))
    run("ref_5Mx128D", lambda: _scan_row(
        "flat_cosine", 5_000_000, 128, 64, 10, ref_key="5Mx128D"))
    run("ref_2Mx384D", lambda: _scan_row(
        "flat_cosine", 2_000_000, 384, 64, 10, ref_key="2Mx384D"))
    run("ref_1Mx1024D", lambda: _scan_row(
        "flat_cosine", 1_000_000, 1024, 64, 10, ref_key="1Mx1024D"))
    # int8 capacity mode: 16M x 768D on one chip (12 GiB db)
    if ON_TPU:
        run("int8_capacity", lambda: _scan_row(
            "flat_cosine_int8", 16 * 2 ** 20, 768, 64, 10,
            dtype=jnp.int8, iters=20))
    else:
        run("int8_capacity", lambda: _scan_row(
            "flat_cosine_int8", 100_000, 768, 64, 10, dtype=jnp.int8))
    # int4 capacity mode: 32M x 768D on one chip (2x int8's rows)
    run("int4_capacity", _int4_row)
    # gather-layout IVF over the int8 capacity mode: probed batch-1 at
    # 16M rows (vs the exact engine's full-sweep p50 above)
    run("quant_ivf", _quant_ivf_row)

    head = suite[0] if suite and "error" not in suite[0] else {}
    out = {
        "metric": "flat_cosine_qps_1Mx768D_b64_k10_bf16",
        "value": head.get("value") if head else None,
        "unit": "QPS",
        "vs_baseline": head.get("vs_baseline") if head else None,
        "latency_ms_per_batch": (head.get("latency_ms_per_batch")
                                 if head else None),
        "backend": jax.default_backend(),
        "suite": suite,
    }
    if not ON_TPU:
        # self-describing degradation (VERDICT r3 item 1b): a CPU-fallback
        # capture must never read as a TPU attestation. Rows are downscaled
        # and vs_baseline is suppressed; point at the last good TPU suite.
        out["degraded"] = True
        out["degraded_reason"] = (
            "TPU backend unavailable (axon tunnel down); rows downscaled, "
            "CPU backend" if fallback else
            "CPU backend (forced or no TPU attached); rows downscaled")
        out["last_tpu_suite"] = "BENCH_r02.json"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
