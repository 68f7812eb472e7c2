#!/usr/bin/env python
"""TPU check + benchmark for the IVF index (VERDICT round-1 item #1).

Targets (BASELINE.md / VERDICT.md):
  A. 1M x 768D cosine, batch-1: ANN p50 < 2.28 ms at recall@10 >= 0.95
     (reference README.md:68 publishes 2.28 ms; our exact scan is 3.8 ms).
  B. 10M x 128D batch-64: ANN QPS > fused-flat QPS (12.8 ms measured r1).
  C. Build time: minutes-scale k-means vs the 59-min graph build.

Data: clustered (Gaussian mixture) — the regime ANN indexes exist for;
recall is measured against the exact Pallas scan on the same data.

Run: setsid nohup python benchmarks/ivf_tpu_check.py > /tmp/ivf.log 2>&1 &
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_vector_db.index.ivf import IVFIndex  # noqa: E402
from tpu_vector_db.ops.pallas_scan import pallas_flat_topk  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def make_clustered(n_pad, d, centers, key, dtype=jnp.bfloat16):
    """Cluster-structured rows, generated on device, cosine-prepared."""
    kc, kp, kn = jax.random.split(key, 3)

    @jax.jit
    def gen(kc, kp, kn):
        mu = jax.random.normal(kc, (centers, d), jnp.float32)
        pick = jax.random.randint(kp, (n_pad,), 0, centers)
        x = mu[pick] + 0.15 * jax.random.normal(kn, (n_pad, d), jnp.float32)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
        return x.astype(dtype)

    return gen(kc, kp, kn)


def run_config(n, d, batch, k, nprobe, n_clusters, iters=40):
    n_pad = ((n + 131071) // 131072) * 131072
    key = jax.random.PRNGKey(0)
    db = make_clustered(n_pad, d, max(n // 1000, 64), key)
    jax.block_until_ready(db)
    log(f"db ready {n}x{d}")

    idx = IVFIndex(dim=d, metric="cosine", n_clusters=n_clusters,
                   nprobe=nprobe, train_iters=8)
    t0 = time.perf_counter()
    stats = idx.build(db, n)
    idx._ensure_device(db, None)
    jax.block_until_ready(idx._dev["buckets"])
    build_s = time.perf_counter() - t0
    log(f"  IVF build: {build_s:.1f}s {stats}")

    # queries = perturbed stored rows (realistic near-duplicate queries)
    kq = jax.random.PRNGKey(7)
    qbase = db[:batch].astype(jnp.float32)
    q = qbase + 0.05 * jax.random.normal(kq, qbase.shape, jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)

    # ground truth from the exact fused scan
    gt_vals, gt_idx = pallas_flat_topk(q, db, np.int32(n), k,
                                       metric="cosine")
    gt_idx = np.asarray(gt_idx)

    ids, keys = idx.search(q, db, n, k=k, nprobe=nprobe)
    hits = sum(len(set(ids[i]) & set(gt_idx[i])) for i in range(batch))
    recall = hits / (batch * k)
    log(f"  recall@{k} (nprobe={nprobe}/{idx._ids.shape[0]} buckets): "
        f"{recall:.4f}")

    # latency: data-dependency chain, one final D2H
    dev = idx._dev
    from tpu_vector_db.index.ivf import _select_buckets
    from tpu_vector_db.ops.ivf_scan import ivf_probe_topk_pallas

    @jax.jit
    def step(q, buckets, ids_dev, fills, cents, bclust, csq, acc):
        sel = _select_buckets(q, cents, bclust, nprobe, "cosine", csq)
        kv, ki = ivf_probe_topk_pallas(q, buckets, ids_dev, fills, sel, k)
        q2 = q + jnp.mean(kv) * 1e-6
        return q2, acc + jnp.sum(kv)

    args = (dev["buckets"], dev["ids"], dev["fills"], dev["centroids"],
            dev["bucket_cluster"], dev["c_sqnorms"])
    t0 = time.perf_counter()
    qq, acc = step(q, *args, jnp.float32(0))
    float(acc)
    log(f"  compile+first {time.perf_counter()-t0:.1f}s")
    for _ in range(5):
        qq, acc = step(qq, *args, acc)
    float(acc)
    t0 = time.perf_counter()
    for _ in range(iters):
        qq, acc = step(qq, *args, acc)
    float(acc)
    dt = (time.perf_counter() - t0) / iters
    log(f"  RESULT ivf {n}x{d} b={batch} k={k} nprobe={nprobe}: "
        f"{dt*1e3:.3f} ms = {batch/dt:.0f} QPS (recall {recall:.4f})")

    # flat comparison on the same data
    @jax.jit
    def flat_step(q, db, acc):
        kv, ki = pallas_flat_topk(q, db, np.int32(n), k, metric="cosine")
        q2 = q + jnp.mean(kv) * 1e-6
        return q2, acc + jnp.sum(kv)

    qq, acc = flat_step(q, db, jnp.float32(0))
    float(acc)
    for _ in range(3):
        qq, acc = flat_step(qq, db, acc)
    float(acc)
    t0 = time.perf_counter()
    for _ in range(max(iters // 2, 5)):
        qq, acc = flat_step(qq, db, acc)
    float(acc)
    fdt = (time.perf_counter() - t0) / max(iters // 2, 5)
    log(f"  RESULT flat {n}x{d} b={batch} k={k}: {fdt*1e3:.3f} ms = "
        f"{batch/fdt:.0f} QPS -> ivf speedup {fdt/dt:.2f}x")
    del db, idx
    return dt, fdt, recall


def main():
    log(f"backend: {jax.default_backend()}")
    # A: batch-1 latency at the headline config
    run_config(1_000_000, 768, batch=1, k=10, nprobe=64, n_clusters=2048)
    # B: batched throughput crossover at 10M x 128D
    run_config(10_000_000, 128, batch=64, k=10, nprobe=64, n_clusters=4096)
    log("done")


if __name__ == "__main__":
    main()
