#!/usr/bin/env python
"""Attribute beam-graph build time to its device phases (round 4).

Times beam_search (insert budget + full budget), alpha_prune, and
_reverse_update separately at the build's real shapes on the current
backend, with a terminal D2H per measurement (block_until_ready
under-reports through the axon tunnel). Each component jits fresh —
expect a few minutes of compiles on axon.

Run: setsid nohup python benchmarks/beam_phase_profile.py > /tmp/beam_phase.log 2>&1 &
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from tpu_vector_db.index import beam_graph as BG  # noqa: E402
from benchmarks.beam_build_tpu import make_clustered  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def timed(fn, *args, reps=3, **kw):
    out = fn(*args, **kw)
    jax.tree_util.tree_map(
        lambda x: np.asarray(x[..., :1]) if hasattr(x, "shape") else x, out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        # terminal D2H sync
        jax.tree_util.tree_map(
            lambda x: np.asarray(x[..., :1]) if hasattr(x, "shape") else x,
            out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    n, d, B = 300_000, 768, 512
    M, efc = 16, 200
    R = M  # graph degree
    log(f"backend: {jax.default_backend()}")
    n_pad = ((n + 131071) // 131072) * 131072
    db = make_clustered(n_pad, d, n // 1000, jax.random.PRNGKey(0))
    jax.block_until_ready(db)
    log(f"db ready {n}x{d}")

    idx = BG.BeamGraphIndex(dim=d, metric="cosine", M=M, ef_construction=efc,
                            batch_size=B)
    idx._ensure_cap(n)
    idx._n = n
    idx._refresh_entries()
    graph = jnp.asarray(
        np.random.default_rng(0).integers(0, n, (idx._cap, R), np.int32))
    ekeys = jnp.zeros((idx._cap, R), jnp.float32)
    entries = jnp.asarray(idx._entries_padded())
    queries = db[:B]
    sqn = None

    bw = idx.build_beam_width
    for iters in (efc // bw // 3, efc // bw // 2, efc // bw):
        t = timed(lambda it: BG.beam_search(
            queries, db, graph, entries, n, k=efc, ef=efc, beam_width=bw,
            iters=it, metric="cosine", sqnorms=None), iters)
        log(f"beam_search iters={iters}: {t*1e3:.1f} ms/batch")

    cand_ids, cand_keys = BG.beam_search(
        queries, db, graph, entries, n, k=efc, ef=efc, beam_width=bw,
        iters=efc // bw // 2, metric="cosine", sqnorms=None)
    jax.block_until_ready((cand_ids, cand_keys))

    t = timed(BG.alpha_prune, queries, db, cand_ids, cand_keys, R,
              "cosine", sqnorms=None, alpha=idx.alpha)
    log(f"alpha_prune (B={B}, width={cand_ids.shape[1]}): {t*1e3:.1f} ms")

    ids = jnp.arange(B, dtype=jnp.int32) + 1000
    rev = jax.jit(functools.partial(
        BG._reverse_update, M=M, R=R, metric="cosine", alpha=idx.alpha,
        rev_extra=BG.BeamGraphIndex._REVERSE_EXTRA,
        rev_chunk=BG._chunk_for(B * M)))
    t = timed(rev, graph, ekeys, db, ids, cand_ids[:, :M],
              cand_keys[:, :M].astype(jnp.float32), sqn)
    log(f"reverse_update (E={B*M}, chunk={BG._chunk_for(B*M)}): "
        f"{t*1e3:.1f} ms")

    # init-sort cost probe: entry-set top_k vs approx_max_k at 1M width
    for width in (1024, 4096):
        keys = jax.random.normal(jax.random.PRNGKey(1), (B, width))

        def full_sort(kk):
            v, i = jax.lax.top_k(kk, efc)
            return v

        def approx(kk):
            v, i = jax.lax.approx_max_k(kk, efc)
            return v

        t1 = timed(jax.jit(full_sort), keys)
        t2 = timed(jax.jit(approx), keys)
        log(f"init top_k width={width}: sort {t1*1e3:.2f} ms, "
            f"approx {t2*1e3:.2f} ms")

    log("done")


if __name__ == "__main__":
    main()
