#!/usr/bin/env python
"""Batch-1 honest decomposition at the headline config (r4 verdict item 4).

The one row where the reference still wins on paper is exact batch-1 at
1M x 768D: 3.8 ms wall vs its published 2.28 ms (reference README.md:68).
But ~0.7 ms of every dispatched program here is the axon tunnel's
measured dispatch floor, and the blocking D2H rides a ~30 ms RTT — costs
a co-located deployment does not pay. This harness publishes the split:

  wall_ms       blocking single-shot p50 (call + D2H each rep) — what a
                remote client of THIS testbed chip sees
  device_ms     chain-folded min-of-3 (10 dependent steps per dispatched
                program, lax.fori_loop; CLAUDE.md r3 protocol) — the
                chip's own time, matching a locally-attached host
  tunnel_ms     wall - device: the testbed artifact

for (a) the exact Pallas fused scan and (b) the IVF probe (now ONE
dispatched program end-to-end: index/ivf.py _select_and_probe fuses
centroid selection + bucket probe), both batch-1 top-10 at 1M x 768D
bf16 cosine. The co-located projection is device_ms + a generous 0.1 ms
local dispatch allowance, with the arithmetic stated in the artifact.

  python benchmarks/batch1_decomp.py [--rows 1000000] [--wall-reps 30]

Writes one JSON object to stdout; progress to stderr.
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

from bench import (_clustered_db, _engine, _measure_chain,  # noqa: E402
                   _measure_step_chain, _normal_db, _queries, _topk_step)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def wall_p50(fn, reps):
    """Blocking single-shot: one dispatch + one D2H per rep."""
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        keys, _ = fn()
        np.asarray(keys)  # D2H — the only true sync on axon
        ts.append(time.perf_counter() - t0)
    return float(np.percentile(np.asarray(ts) * 1e3, 50))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--wall-reps", type=int, default=30)
    args = ap.parse_args()
    n, d, k = args.rows, 768, 10
    block = 2 ** 19
    n_pad = ((n + block - 1) // block) * block
    backend = jax.default_backend()
    log(f"backend={backend} rows={n}")

    out = {"harness": "benchmarks/batch1_decomp.py", "backend": backend,
           "config": f"{n // 1000}Kx{d}D bf16 cosine batch-1 top-{k}",
           "protocol": ("wall = blocking single-shot p50 (dispatch + D2H "
                        "per rep, rides the ~30ms tunnel RTT); device = "
                        "chain-folded min-of-3, 10 dependent steps per "
                        "dispatched program; tunnel = wall - device"),
           "reference_row_ms": 2.28}

    # ---- exact fused scan, batch-1
    log("exact: building db")
    db = _normal_db(n_pad, d)
    engine = _engine(jnp.int32(n), k, "cosine", block=min(block, n_pad))
    q1 = _queries(1, d)
    dev_s = _measure_chain(engine, q1, db, 50)
    log(f"exact device: {dev_s * 1e3:.3f} ms")
    w50 = wall_p50(lambda: engine(q1, db), args.wall_reps)
    log(f"exact wall p50: {w50:.3f} ms")
    out["exact"] = {
        "device_ms": round(dev_s * 1e3, 3),
        "wall_ms_p50": round(w50, 3),
        "tunnel_ms": round(w50 - dev_s * 1e3, 3),
        "colocated_projection_ms": round(dev_s * 1e3 + 0.1, 3),
    }
    del db

    # ---- IVF probe, batch-1 (clustered regime, same as bench config #3)
    from tpu_vector_db.index.ivf import IVFIndex, _select_and_probe
    log("ivf: building clustered db")
    db = _clustered_db(n_pad, d)
    idx = IVFIndex(dim=d, metric="cosine",
                   nprobe=64 if backend == "tpu" else 8,
                   n_clusters=None if backend == "tpu" else 256)
    t0 = time.perf_counter()
    stats = idx.build(db, n)
    log(f"ivf built in {time.perf_counter() - t0:.0f}s "
        f"({stats['clusters']} clusters)")
    idx.search(np.asarray(q1, np.float32), db, n, k=k)  # compile + mirror
    dev = idx._dev
    nprobe = idx.nprobe
    layout = "pallas" if backend == "tpu" else "xla"

    def ivf_engine(q, cents, bclust, csq, buckets, ids, fills, sqn):
        return _select_and_probe(q, cents, bclust, csq, buckets, ids,
                                 fills, sqn, None, None, nprobe,
                                 "cosine", k, layout)

    iargs = (dev["centroids"], dev["bucket_cluster"], dev["c_sqnorms"],
             dev["buckets"], dev["ids"], dev["fills"], dev.get("sqnorms"))
    dev_s = _measure_step_chain(_topk_step(ivf_engine), q1, iargs, 50)
    log(f"ivf device: {dev_s * 1e3:.3f} ms")
    w50 = wall_p50(lambda: ivf_engine(q1, *iargs), args.wall_reps)
    log(f"ivf wall p50 (fused single program): {w50:.3f} ms")
    # the production path: search() = fused program + final D2H
    qh = np.asarray(q1, np.float32)
    ts = []
    for _ in range(args.wall_reps):
        t0 = time.perf_counter()
        idx.search(qh, db, n, k=k)
        ts.append(time.perf_counter() - t0)
    search_w50 = float(np.percentile(np.asarray(ts) * 1e3, 50))
    log(f"ivf store-path wall p50: {search_w50:.3f} ms")
    out["ivf"] = {
        "nprobe": nprobe,
        "clusters": stats["clusters"],
        "device_ms": round(dev_s * 1e3, 3),
        "wall_ms_p50": round(w50, 3),
        "search_wall_ms_p50": round(search_w50, 3),
        "tunnel_ms": round(w50 - dev_s * 1e3, 3),
        "colocated_projection_ms": round(dev_s * 1e3 + 0.1, 3),
        "dispatch_audit": ("search() is ONE device program "
                           "(_select_and_probe) + one D2H"),
    }

    out["projection_note"] = (
        "colocated = device_ms + 0.1 ms local dispatch allowance (a "
        "locally-attached PJRT host dispatches in tens of microseconds; "
        "0.1 ms is conservative). The reference's 2.28 ms was measured "
        "host-attached, so the apples-to-apples comparison is against "
        "the colocated projection, not the tunnel wall.")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
