#!/usr/bin/env python
"""IVF nprobe/n_clusters sweep at 10M x 128D — find the recall/QPS frontier
vs the fused flat scan (12.5-12.8 ms/batch-64 measured).

The first TPU check (benchmarks/ivf_tpu_check.py) hit recall 0.658 at
nprobe=64 of 4474 buckets; this sweeps nprobe and the quantizer size to
find where recall >= 0.95 sits and whether the crossover vs flat survives.

Run: setsid nohup python benchmarks/ivf_sweep.py > /tmp/ivf_sweep.log 2>&1 &
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_vector_db.index.ivf import IVFIndex, _select_buckets  # noqa: E402
from tpu_vector_db.ops.ivf_scan import ivf_probe_topk_pallas  # noqa: E402
from tpu_vector_db.ops.pallas_scan import pallas_flat_topk  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def make_clustered(n, d, centers, key, dtype=jnp.bfloat16):
    kc, kp, kn = jax.random.split(key, 3)

    @jax.jit
    def gen(kc, kp, kn):
        mu = jax.random.normal(kc, (centers, d), jnp.float32)
        pick = jax.random.randint(kp, (n,), 0, centers)
        x = mu[pick] + 0.15 * jax.random.normal(kn, (n, d), jnp.float32)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
        return x.astype(dtype)

    return gen(kc, kp, kn)


def main():
    log(f"backend: {jax.default_backend()}")
    n, d, batch, k = 10_000_000, 128, 64, 10
    n_pad = ((n + 131071) // 131072) * 131072
    db = make_clustered(n_pad, d, max(n // 1000, 64), jax.random.PRNGKey(0))
    jax.block_until_ready(db)
    log(f"db ready {n}x{d}")

    kq = jax.random.PRNGKey(7)
    qbase = db[:batch].astype(jnp.float32)
    q = qbase + 0.05 * jax.random.normal(kq, qbase.shape, jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
    gt_vals, gt_idx = pallas_flat_topk(q, db, np.int32(n), k, metric="cosine")
    gt_idx = np.asarray(gt_idx)
    gt_kth = np.asarray(gt_vals, np.float32)[:, -1]

    @jax.jit
    def f32_found(q, db, ids):  # tie-robust: f32 scores of returned ids
        rows = db[jnp.maximum(ids, 0)].astype(jnp.float32)
        return jnp.einsum("qd,qkd->qk", q, rows,
                          preferred_element_type=jnp.float32)

    # flat timing baseline
    @jax.jit
    def flat_step(q, db, acc):
        kv, _ = pallas_flat_topk(q, db, np.int32(n), k, metric="cosine")
        return q + jnp.mean(kv) * 1e-6, acc + jnp.sum(kv)

    qq, acc = flat_step(q, db, jnp.float32(0))
    float(acc)
    t0 = time.perf_counter()
    for _ in range(20):
        qq, acc = flat_step(qq, db, acc)
    float(acc)
    flat_ms = (time.perf_counter() - t0) / 20 * 1e3
    log(f"flat: {flat_ms:.2f} ms/batch ({batch / flat_ms * 1e3:.0f} QPS)")

    for n_clusters in (8192, 16384):
        idx = IVFIndex(dim=d, metric="cosine", n_clusters=n_clusters,
                       nprobe=64, train_iters=10)
        t0 = time.perf_counter()
        stats = idx.build(db, n)
        idx._ensure_device(db, None)
        jax.block_until_ready(idx._dev["buckets"])
        log(f"build C={n_clusters}: {time.perf_counter() - t0:.0f}s {stats}")
        dev = idx._dev
        args = (dev["buckets"], dev["ids"], dev["fills"], dev["centroids"],
                dev["bucket_cluster"], dev["c_sqnorms"])

        for nprobe in (64, 128, 256):
            ids, _ = idx.search(q, db, n, k=k, nprobe=nprobe)
            hits = sum(len(set(ids[i]) & set(gt_idx[i]))
                       for i in range(batch))
            recall = hits / (batch * k)
            found = np.asarray(f32_found(q, db, jnp.asarray(ids)))
            srecall = float(
                ((found >= gt_kth[:, None] - 0.004) & (ids >= 0)).mean())

            @jax.jit
            def step(q, buckets, ids_dev, fills, cents, bclust, csq, acc,
                     nprobe=nprobe):
                sel = _select_buckets(q, cents, bclust, nprobe, "cosine",
                                      csq)
                kv, _ = ivf_probe_topk_pallas(q, buckets, ids_dev, fills,
                                              sel, k)
                return q + jnp.mean(kv) * 1e-6, acc + jnp.sum(kv)

            qq, acc = step(q, *args, jnp.float32(0))
            float(acc)
            t0 = time.perf_counter()
            for _ in range(20):
                qq, acc = step(qq, *args, acc)
            float(acc)
            dt = (time.perf_counter() - t0) / 20 * 1e3
            log(f"  RESULT C={n_clusters} nprobe={nprobe}: {dt:.2f} ms "
                f"({batch / dt * 1e3:.0f} QPS) recall@{k}={recall:.4f} "
                f"score_recall={srecall:.4f} "
                f"speedup_vs_flat={flat_ms / dt:.2f}x")
        del idx, dev, args
    log("done")


if __name__ == "__main__":
    main()
