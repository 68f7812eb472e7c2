#!/usr/bin/env python
"""TPU build-throughput benchmark for the fused beam-graph build.

Round-1 finding #8: the per-batch host-synced build took 59 min at
1M x 768D (tunnel-RTT-bound at ~250ms/batch: ~7 dispatches + 4 D2H per
256 rows). The round-2 build keeps graph + edge keys device-resident,
fuses search/prune/forward-write/reverse-re-prune into one jitted program,
and scans _SCAN_K batches per dispatch with ZERO per-batch D2H.
Target: 1M x 768D build < 15 min through the tunnel.

Run: setsid nohup python benchmarks/beam_build_tpu.py > /tmp/beam_build.log 2>&1 &
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_vector_db.index.beam_graph import BeamGraphIndex  # noqa: E402


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


def run(n, d, batch_q=64, k=10, ef=100):
    n_pad = ((n + 131071) // 131072) * 131072
    db = make_clustered(n_pad, d, max(n // 1000, 64), jax.random.PRNGKey(0))
    jax.block_until_ready(db)
    log(f"db ready {n}x{d}")

    idx = BeamGraphIndex(dim=d, metric="cosine", M=16, ef_construction=200,
                         batch_size=256)
    t0 = time.perf_counter()
    stats = idx.build(db, n)  # build() materializes host = true sync
    build_s = time.perf_counter() - t0
    log(f"  BUILD {n}x{d}: {build_s:.1f}s ({stats})")

    # recall vs FLOAT32 exact ground truth on perturbed stored rows. The
    # bf16 pallas GT is tie-ambiguous on tight clusters (at 300K+ the top
    # ~1000 same-cluster scores sit within bf16 eps, so bf16 "top-10 ids"
    # are arbitrary tie-breaks); score-recall counts a hit when the found
    # neighbor's f32 score reaches the 10th-best f32 GT score.
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

    ids, _ = idx.search(q, db, n, k=k, ef_search=ef)
    gt_idx, gt_kth, found = f32_gt(q, db[:n], jnp.asarray(ids), k)
    gt_idx, gt_kth, found = (np.asarray(gt_idx), np.asarray(gt_kth),
                             np.asarray(found))
    hits = sum(len(set(ids[i]) & set(gt_idx[i])) for i in range(len(q)))
    score_recall = float((found >= gt_kth[:, None] - 1e-5).mean())
    log(f"  recall@{k} (ef={ef}): id={hits / gt_idx.size:.4f} "
        f"score={score_recall:.4f}")

    # chained search latency (batch 64), one terminal D2H
    from tpu_vector_db.index.beam_graph import beam_search
    qb = q[:64] if len(q) >= 64 else q
    graph_dev, entries = idx._graph_dev, jnp.asarray(idx._entries_padded())
    bw = 8
    iters = max(ef // bw * 2, 8)

    @jax.jit
    def step(q, db, graph, entries, acc):
        _, keys = beam_search(q, db, graph, entries, np.int32(n), k=k,
                              ef=ef, beam_width=bw, iters=iters,
                              metric="cosine")
        return q + jnp.mean(keys) * 1e-6, acc + jnp.sum(keys)

    qq, acc = step(qb, db, graph_dev, entries, jnp.float32(0))
    float(acc)
    t0 = time.perf_counter()
    for _ in range(20):
        qq, acc = step(qq, db, graph_dev, entries, acc)
    float(acc)
    dt = (time.perf_counter() - t0) / 20
    log(f"  SEARCH b={len(qb)} ef={ef}: {dt * 1e3:.2f} ms/batch = "
        f"{len(qb) / dt:.0f} QPS")
    del db, idx


def main():
    log(f"backend: {jax.default_backend()}")
    run(300_000, 768)    # r1: 678s host-synced
    run(1_000_000, 768)  # r1: 59 min host-synced; target < 15 min
    log("done")


if __name__ == "__main__":
    main()
