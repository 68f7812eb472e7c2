#!/usr/bin/env python
"""Same-process A/B of the Pallas scan block height at batch-1 (round 5).

pick_block_rows budgets VMEM for the merge branch at Q=64 (41 bytes per
row-query, measured from the compiler's scoped-allocation report) — so
batch-1 inherits Q=64's block: 2048 rows at d=768, 4096 at d=128. But at
Q=1 the merge term is ~nothing and the block could be 4096 (d=768) or
16384 (d=128). Per-step arithmetic from the r5 decomposition says the
step overhead dominates small-d blocks: the 1.25Mx128D slice measures
1.155 ms over 320 steps (3.6 us/step) while the DMA is only 1.28 us/step
at 4096 rows — quadrupling the block should land ~0.6 ms. At d=768 the
DMA is 3.8 us/step against ~5.6 us/step measured, so doubling the block
projects ~2.3 ms (vs the reference's 2.28 co-located).

Everything is measured IN ONE PROCESS (chip drifts +-25-30% across
minutes; cross-process A/B is meaningless — CLAUDE.md r4) with the
chain-folded protocol (10 dependent steps per dispatched program).

  python benchmarks/b1_block_ab.py [--wall-reps 0]

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

from bench import _measure_chain, _normal_db, _queries  # noqa: E402
from tpu_vector_db.ops.pallas_scan import pallas_flat_topk  # noqa: E402


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def run_case(n, d, q_n, blocks, k=10):
    n_pad = ((n + 131071) // 131072) * 131072
    log(f"case {n // 1000}Kx{d}D Q={q_n}: building db ({n_pad} rows)")
    db = _normal_db(n_pad, d)
    q = _queries(q_n, d)
    rows = {}
    for block in blocks:
        if n_pad % block:
            log(f"  block {block}: skipped (n_pad % block != 0)")
            continue

        def engine(qq, dd, _block=block):
            return pallas_flat_topk(qq, dd, jnp.int32(n), k,
                                    metric="cosine", block_rows=_block)

        dev_s = _measure_chain(engine, q, db, 50)
        log(f"  block {block}: {dev_s * 1e3:.3f} ms "
            f"({n_pad // block} grid steps)")
        rows[str(block)] = {
            "device_ms": round(dev_s * 1e3, 3),
            "grid_steps": n_pad // block,
        }
    del db
    return rows


def main():
    ap = argparse.ArgumentParser()
    args = ap.parse_args()
    backend = jax.default_backend()
    log(f"backend={backend}")
    out = {"harness": "benchmarks/b1_block_ab.py", "backend": backend,
           "protocol": ("chain-folded min-of-3 (10 dependent steps per "
                        "dispatched program), all variants in ONE process "
                        "(chip drift makes cross-process A/B meaningless)"),
           "cases": {}}
    # headline config: exact batch-1 at 1M x 768D (reference row 2.28 ms)
    out["cases"]["1Mx768D_b1"] = run_case(
        1_000_000, 768, 1, [2048, 4096])
    # config-5 per-chip slice: 1.25M x 128D batch-1 (v5e-8 projection row)
    out["cases"]["1250Kx128D_b1"] = run_case(
        1_250_000, 128, 1, [4096, 8192, 16384])
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
