#!/usr/bin/env python
"""Build-time sweep for the fused beam-graph build (round 4).

Measures build seconds + recall at 300K x 768D tight clusters (the
adversarial regime) for the r4 build optimizations, then optionally the
1M x 768D contract point. Variants:

  r4        — batch 512, reverse-chunk 4096, db-native (bf16) scoring,
              insert_budget_div=2 (the new defaults)
  r4-div3   — same, first-pass beam budget cut to efc/bw/3
  r3-knobs  — batch 256, chunk 512 via attrs (approximates the r3 build
              for an A/B on the same data; scoring stays bf16)

Target (VERDICT r3 #3): 1M x 768D <= 8 min at recall >= 0.900 @ ef=100.

Run: setsid nohup python benchmarks/beam_build_sweep.py > /tmp/beam_sweep.log 2>&1 &
"""

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_vector_db.index import beam_graph as BG  # noqa: E402
from tpu_vector_db.index.beam_graph import BeamGraphIndex  # noqa: E402
from benchmarks.beam_build_tpu import make_clustered  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


@functools.partial(jax.jit, static_argnames=("k",))
def _f32_gt(q, db, ids, k):
    sims = jnp.einsum("qd,nd->qn", q, db.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
    gt_vals, gt_idx = jax.lax.top_k(sims, k)
    found = jnp.take_along_axis(sims, jnp.maximum(ids, 0), axis=1)
    return gt_idx, gt_vals[:, -1], found


def measure(idx, db, n, k=10, ef=100):
    kq = jax.random.PRNGKey(7)
    qbase = db[:100].astype(jnp.float32)
    q = qbase + 0.05 * jax.random.normal(kq, qbase.shape, jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-8)
    ids, _ = idx.search(q, db, n, k=k, ef_search=ef)
    gt_idx, gt_kth, found = _f32_gt(q, db[:n], jnp.asarray(ids), k)
    gt_idx, gt_kth, found = map(np.asarray, (gt_idx, gt_kth, found))
    hits = sum(len(set(ids[i]) & set(gt_idx[i])) for i in range(len(q)))
    return hits / gt_idx.size, float((found >= gt_kth[:, None] - 1e-5).mean())


def run_variant(name, db, n, d, *, batch, chunk, div):
    idx = BeamGraphIndex(dim=d, metric="cosine", M=16, ef_construction=200,
                         batch_size=batch)
    idx.insert_budget_div = div
    old_chunk = BG._chunk_for
    BG._chunk_for = lambda e, limit=chunk: old_chunk(e, limit)
    try:
        t0 = time.perf_counter()
        idx.build(db, n)
        build_s = time.perf_counter() - t0
    finally:
        BG._chunk_for = old_chunk
    rid, rscore = measure(idx, db, n)
    log(f"  {name}: build {build_s:.1f}s  recall@10 ef=100 "
        f"id={rid:.4f} score={rscore:.4f}")
    del idx
    return build_s, rid, rscore


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=300_000)
    ap.add_argument("--variants", default="r4,r4-div3")
    args = ap.parse_args()
    log(f"backend: {jax.default_backend()}")
    d = 768
    n_pad = ((args.n + 131071) // 131072) * 131072
    db = make_clustered(n_pad, d, max(args.n // 1000, 64),
                        jax.random.PRNGKey(0))
    jax.block_until_ready(db)
    log(f"db ready {args.n}x{d} (tight clusters)")
    specs = {
        "r4": dict(batch=512, chunk=4096, div=2),
        "r4-div3": dict(batch=512, chunk=4096, div=3),
        "r3-knobs": dict(batch=256, chunk=512, div=2),
    }
    for name in args.variants.split(","):
        run_variant(name, db, args.n, d, **specs[name])
    log("done")


if __name__ == "__main__":
    main()
