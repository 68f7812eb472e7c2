#!/usr/bin/env python
"""Build-dispatch folding A/B (r4 verdict item 7).

The fused beam-graph build folds _SCAN_K consecutive insert/refine
batches into one dispatched lax.scan program (index/beam_graph.py
_device_insert_scan). r4 shipped K=8, sized originally for the search
path; the build pays one blocking ~30-58 ms dispatch round-trip per
scan program through the axon tunnel, so K=16 halves that count:

  dispatch arithmetic at 1M rows, B=512: 1953 insert batches -> 244
  programs at K=8 vs 122 at K=16 (plus the same again for the refine
  pass). If the per-BATCH fixed cost (~58 ms, BUILD_1M_r04.json phase
  attribution) is device-side rather than dispatch-side, the saving is
  bounded by ~244 x RTT ~ 7-14 s — this harness measures which it is.

Same-process A/B (chip drift makes cross-process build comparisons
invalid — CLAUDE.md): per K, an untimed 64K warm build compiles every
program shape, then a fresh 300K build is timed. Folding K batches does
not change the insert math EXCEPT that the entry routing set refreshes
once per program instead of once per 8 batches, so strict recall is
re-measured per leg.

  python benchmarks/beam_kfold_ab.py [--rows 300000] [--ks 8,16]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

if os.environ.get("VDB_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

from bench import _clustered_db  # noqa: E402
from tpu_vector_db.index.beam_graph import BeamGraphIndex  # noqa: E402
from tpu_vector_db.ops.scan import flat_scan_topk  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def strict_recall(index, db, n, d, k=10, nq=256):
    """id-recall@k on held-out perturbed queries vs the exact scan."""
    key = jax.random.PRNGKey(99)
    base = db[jax.random.randint(key, (nq,), 0, n)]
    noise = 0.05 * jax.random.normal(key, (nq, d), jnp.float32)
    q = base.astype(jnp.float32) + noise
    q = q / jnp.sqrt(jnp.sum(q * q, -1, keepdims=True))
    gt_keys, gt_ids = flat_scan_topk(q, db, jnp.int32(n), k,
                                     metric="cosine", db_normalized=True,
                                     block_rows=2 ** 17)
    ids, _ = index.search(q, db, n, k=k, ef_search=100)
    gt_ids = np.asarray(gt_ids)
    ids = np.asarray(ids)
    hits = sum(len(set(ids[i].tolist()) & set(gt_ids[i].tolist()))
               for i in range(nq))
    return hits / float(nq * k)


def build_once(db, n, d, timed_rows, warm_rows):
    idx = BeamGraphIndex(dim=d, metric="cosine", M=16, ef_construction=200)
    idx.build(db, warm_rows)  # compile pass, untimed
    idx2 = BeamGraphIndex(dim=d, metric="cosine", M=16,
                          ef_construction=200)
    t0 = time.perf_counter()
    idx2.build(db, timed_rows)
    # force completion: the device graph is the result; one D2H syncs
    float(jnp.sum(idx2._graph_dev[0, :1].astype(jnp.float32)))
    dt = time.perf_counter() - t0
    return idx2, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=300_000)
    ap.add_argument("--ks", default="8,16",
                    type=lambda s: [int(x) for x in s.split(",")])
    args = ap.parse_args()
    backend = jax.default_backend()
    n, d = args.rows, 768
    if backend != "tpu":
        n, d = min(n, 20_000), 64
    warm = max(n // 5, 4096)
    block = 2 ** 17
    n_pad = ((n + block - 1) // block) * block
    log(f"backend={backend} rows={n} warm={warm}")
    db = _clustered_db(n_pad, d)

    legs = []
    for kk in args.ks:
        BeamGraphIndex._SCAN_K = kk
        log(f"K={kk}: warm build {warm} rows (compiles)")
        t0 = time.perf_counter()
        idx, dt = build_once(db, n, d, n, warm)
        log(f"K={kk}: timed {n}-row build {dt:.1f}s "
            f"(incl. warm leg total {time.perf_counter() - t0:.1f}s)")
        rec = strict_recall(idx, db, n, d)
        log(f"K={kk}: strict recall@10 {rec:.3f}")
        n_batches = -(-n // idx.batch_size)
        legs.append({"scan_k": kk, "build_s": round(dt, 1),
                     "strict_recall_at_10": round(rec, 4),
                     "approx_programs_per_pass": -(-n_batches // kk)})
        del idx
    BeamGraphIndex._SCAN_K = 8

    out = {
        "harness": "benchmarks/beam_kfold_ab.py",
        "backend": backend,
        "config": f"{n // 1000}Kx{d}D clustered, M=16 efc=200, "
                  "r4 fast-build defaults, same-process A/B",
        "legs": legs,
    }
    if len(legs) >= 2:
        out["delta_s"] = round(legs[0]["build_s"] - legs[1]["build_s"], 1)
        out["delta_pct"] = round(100.0 * (legs[0]["build_s"]
                                          - legs[1]["build_s"])
                                 / legs[0]["build_s"], 1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
