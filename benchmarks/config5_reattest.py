#!/usr/bin/env python
"""Config-5 slice re-attestation with drift bars (r4 verdict item 5).

The "sub-ms exact on v5e-8" projection for BASELINE config #5 (10M x
128D batch-1 across 8 chips) rests on the per-shard slice measurement
1.25M x 128D batch-1. r3 measured 0.843 ms; the r4 driver suite showed
1.179-1.272 ms — but those were SEPARATE processes, and the chip drifts
±25-30% across minutes (CLAUDE.md). A/B comparisons are only valid
within one process: this harness measures the slice N times in ONE
process (each rep its own chain-folded min-of-3, the same protocol as
bench.py's config5_shard_slice row) and reports min/median/max, which
IS the drift bar the projection needs.

  python benchmarks/config5_reattest.py [--reps 3]

The cross-shard merge increment is measured separately on the 8-device
CPU mesh by benchmarks/config5_full_shape.py --isolate-merge.
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import os  # noqa: E402

if os.environ.get("VDB_FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

from bench import (_engine, _measure_chain, _normal_db,  # noqa: E402
                   _queries)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    n, d, k, batch = 1_250_000, 128, 10, 1
    block = 2 ** 19
    n_pad = ((n + block - 1) // block) * block
    backend = jax.default_backend()
    if backend != "tpu":
        n = 100_000
        n_pad = ((n + block - 1) // block) * block
    log(f"backend={backend} rows={n}")
    db = _normal_db(n_pad, d)
    engine = _engine(jnp.int32(n), k, "cosine", block=min(block, n_pad))
    q1 = _queries(batch, d)

    times = []
    for r in range(args.reps):
        dt = _measure_chain(engine, q1, db, 50)
        times.append(dt * 1e3)
        log(f"rep {r + 1}: {dt * 1e3:.3f} ms")
        time.sleep(5)
    arr = np.asarray(times)
    slice_min = float(arr.min())
    out = {
        "harness": "benchmarks/config5_reattest.py",
        "backend": backend,
        "config": f"{n // 1000}Kx{d}D bf16 cosine batch-1 top-{k} "
                  "(config-5 per-shard slice, 10M/8)",
        "reps_ms": [round(t, 3) for t in arr.tolist()],
        "min_ms": round(slice_min, 3),
        "median_ms": round(float(np.median(arr)), 3),
        "max_ms": round(float(arr.max()), 3),
        "drift_pct": round(100.0 * (arr.max() - arr.min()) / arr.min(), 1),
        "note": ("same-process reps, each a chain-folded min-of-3; "
                 "cross-process comparisons are invalid (±25-30% chip "
                 "drift). Projection: v5e-8 batch-1 = slice + ICI k*P "
                 "merge increment (measured by config5_full_shape.py "
                 "--isolate-merge on the CPU mesh; the merge moves "
                 "k*P*16B over ICI — negligible vs the slice scan)."),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
