#!/usr/bin/env python
"""ef_search sweep for the beam graph on normalized tight-cluster data.

After the normalization fix, 300K x 768D tight clusters measure id-recall
0.921 at ef=100 (benchmarks/beam_build_tpu.py). This sweeps ef to locate
the >= 0.95 operating point and its latency cost, plus a wider-noise
regime closer to real embedding distributions.

Run: setsid nohup python benchmarks/beam_ef_sweep.py > /tmp/ef_sweep.log 2>&1 &
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_vector_db.index.beam_graph import BeamGraphIndex, beam_search  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def make_clustered(n, d, centers, noise, key, dtype=jnp.bfloat16):
    kc, kp, kn = jax.random.split(key, 3)

    @functools.partial(jax.jit, static_argnames=())
    def gen(kc, kp, kn):
        mu = jax.random.normal(kc, (centers, d), jnp.float32)
        pick = jax.random.randint(kp, (n,), 0, centers)
        x = mu[pick] + noise * jax.random.normal(kn, (n, d), jnp.float32)
        x = x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
        return x.astype(dtype)

    return gen(kc, kp, kn)


def run(n, d, noise, k=10):
    n_pad = ((n + 131071) // 131072) * 131072
    db = make_clustered(n_pad, d, max(n // 1000, 64), noise,
                        jax.random.PRNGKey(0))
    jax.block_until_ready(db)
    log(f"db ready {n}x{d} noise={noise}")
    idx = BeamGraphIndex(dim=d, metric="cosine", M=16, ef_construction=200,
                         batch_size=256)
    t0 = time.perf_counter()
    idx.build(db, n)
    log(f"  build {time.perf_counter() - t0:.0f}s")

    kq = jax.random.PRNGKey(7)
    qbase = db[:100].astype(jnp.float32)
    q = qbase + 0.05 * jax.random.normal(kq, qbase.shape, jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)

    @functools.partial(jax.jit, static_argnames=("k",))
    def f32_gt(q, db, ids, k):
        sims = jnp.einsum("qd,nd->qn", q, db.astype(jnp.float32),
                          preferred_element_type=jnp.float32)
        gt_vals, gt_idx = jax.lax.top_k(sims, k)
        found = jnp.take_along_axis(sims, jnp.maximum(ids, 0), axis=1)
        return gt_idx, gt_vals[:, -1], found

    for ef in (100, 200, 400):
        ids, _ = idx.search(q, db, n, k=k, ef_search=ef)
        gt_idx, gt_kth, found = f32_gt(q, db[:n], jnp.asarray(ids), k)
        gt_idx, gt_kth, found = (np.asarray(gt_idx), np.asarray(gt_kth),
                                 np.asarray(found))
        hits = sum(len(set(ids[i]) & set(gt_idx[i])) for i in range(len(q)))
        srec = float((found >= gt_kth[:, None] - 1e-5).mean())

        bw = 8
        iters = max(ef // bw * 2, 8)
        qb = q[:64]
        graph_dev = idx._graph_dev
        entries = jnp.asarray(idx._entries_padded())

        @jax.jit
        def step(qq, db, graph, entries, acc, ef=ef, iters=iters):
            _, keys = beam_search(qq, db, graph, entries, np.int32(n),
                                  k=k, ef=ef, beam_width=bw, iters=iters,
                                  metric="cosine")
            return qq + jnp.mean(keys) * 1e-6, acc + jnp.sum(keys)

        qq, acc = step(qb, db, graph_dev, entries, jnp.float32(0))
        float(acc)
        t0 = time.perf_counter()
        for _ in range(10):
            qq, acc = step(qq, db, graph_dev, entries, acc)
        float(acc)
        dt = (time.perf_counter() - t0) / 10
        log(f"  RESULT ef={ef}: id_recall={hits / gt_idx.size:.4f} "
            f"score_recall={srec:.4f} {dt * 1e3:.1f} ms/b64 "
            f"({64 / dt:.0f} QPS)")
    del db, idx


def main():
    log(f"backend: {jax.default_backend()}")
    run(300_000, 768, noise=0.15)  # the tight regime (0.921 @ ef100)
    run(300_000, 768, noise=1.0)   # realistic embedding-like spread
    log("done")


if __name__ == "__main__":
    main()
