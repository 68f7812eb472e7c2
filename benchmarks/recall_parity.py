#!/usr/bin/env python
"""Recall parity harness: beam-graph and IVF vs a reference HNSW.

BASELINE.md's acceptance bound is "ANN recall within measured reference
HNSW recall at equal ef/M". hnswlib isn't installable here, so the yardstick
is benchmarks/hnsw_reference.py (faithful scalar Malkov-Yashunin HNSW).
This CLI measures recall@10 on the three regimes from round-1 BENCHMARKS:

  uniform 20K x 64      (mild distance concentration)
  uniform 100K x 64     (harder)
  clustered 300K x 768  (the regime ANN serves in practice)

and prints a markdown table for BENCHMARKS.md. Runs on CPU; the scalar
HNSW build dominates wall-clock (~minutes at 100K+).

  python benchmarks/recall_parity.py [--quick]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from benchmarks.hnsw_reference import ReferenceHNSW  # noqa: E402
from tpu_vector_db.index.beam_graph import BeamGraphIndex  # noqa: E402
from tpu_vector_db.index.ivf import IVFIndex  # noqa: E402
from tpu_vector_db.ops import distance as D  # noqa: E402
from tpu_vector_db.ops.scan import flat_scan_topk  # noqa: E402

M, EFC, EF, K = 16, 200, 100, 10


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def make_data(kind: str, n: int, d: int, rng):
    if kind == "uniform":
        x = rng.standard_normal((n, d)).astype(np.float32)
    elif kind == "tight":
        # the adversarial serving regime from benchmarks/beam_build_tpu.py:
        # ~1K rows per cluster, 0.15 noise, unit-normalized — same-cluster
        # neighbors nearly tie, cluster-bridging edges are scarce
        centers = max(n // 1000, 64)
        mu = rng.standard_normal((centers, d)).astype(np.float32)
        x = (mu[rng.integers(0, centers, n)]
             + 0.15 * rng.standard_normal((n, d))).astype(np.float32)
        x /= np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
    else:
        centers = max(n // 2000, 32)
        mu = rng.standard_normal((centers, d)).astype(np.float32) * 3
        x = (mu[rng.integers(0, centers, n)]
             + rng.standard_normal((n, d))).astype(np.float32)
    q = x[rng.choice(n, 100, replace=False)] + \
        0.05 * rng.standard_normal((100, d)).astype(np.float32)
    return x, q.astype(np.float32)


def ground_truth(x, q):
    db = D.pad_dim(D.l2_normalize(jnp.asarray(x)))
    qq = D.pad_dim(D.l2_normalize(jnp.asarray(q)))
    block = min(db.shape[0], 131072)
    n_pad = -(-db.shape[0] // block) * block  # scan needs whole blocks
    if n_pad != db.shape[0]:
        db = jnp.concatenate(
            [db, jnp.zeros((n_pad - db.shape[0], db.shape[1]), db.dtype)])
    _, idx = flat_scan_topk(qq, db, jnp.int32(len(x)), K, metric="cosine",
                            db_normalized=True, block_rows=block)
    return np.asarray(idx), db, qq


def recall(found, gt):
    hits = sum(len(set(map(int, f)) & set(map(int, g)))
               for f, g in zip(found, gt))
    return hits / gt.size


def run_case(kind, n, d, rng):
    x, q = make_data(kind, n, d, rng)
    gt, db, qq = ground_truth(x, q)
    row = {"case": f"{kind} {n//1000}K x {d}"}

    t0 = time.perf_counter()
    hnsw = ReferenceHNSW(dim=d, metric="cosine", M=M, ef_construction=EFC)
    hnsw.add(x)
    t_build = time.perf_counter() - t0
    found = [hnsw.search(qi, K, ef_search=EF)[0] for qi in q]
    row["hnsw_ref"] = recall(found, gt)
    log(f"{row['case']}: HNSW ref recall {row['hnsw_ref']:.4f} "
        f"(build {t_build:.0f}s)")

    bg = BeamGraphIndex(dim=d, metric="cosine", M=M, ef_construction=EFC)
    t0 = time.perf_counter()
    bg.build(db, n)
    t_bg = time.perf_counter() - t0
    ids, _ = bg.search(qq, db, n, k=K, ef_search=EF)
    row["beam_graph"] = recall(ids, gt)
    log(f"{row['case']}: beam graph recall {row['beam_graph']:.4f} "
        f"(build {t_bg:.0f}s)")

    ivf = IVFIndex(dim=d, metric="cosine", nprobe=32)
    t0 = time.perf_counter()
    ivf.build(db, n)
    t_ivf = time.perf_counter() - t0
    ids, _ = ivf.search(qq, db, n, k=K, nprobe=32)
    row["ivf_np32"] = recall(ids, gt)
    log(f"{row['case']}: IVF nprobe=32 recall {row['ivf_np32']:.4f} "
        f"(build {t_ivf:.0f}s)")
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="small sizes for a smoke run")
    ap.add_argument("--case", type=int, default=None,
                    help="run only case N (0-based) of the full set")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    cases = ([("uniform", 5000, 64), ("clustered", 20000, 128)]
             if args.quick else
             [("uniform", 20000, 64), ("uniform", 100000, 64),
              ("clustered", 300000, 768), ("tight", 300000, 768)])
    if args.case is not None:
        cases = [cases[args.case]]
    rows = [run_case(kind, n, d, rng) for kind, n, d in cases]
    print(f"\n| case | HNSW ref (M={M}, ef={EF}) | beam graph (same) "
          f"| IVF (nprobe=32) |")
    print("|---|---|---|---|")
    for r in rows:
        print(f"| {r['case']} | {r['hnsw_ref']:.4f} | "
              f"{r['beam_graph']:.4f} | {r['ivf_np32']:.4f} |")


if __name__ == "__main__":
    main()
