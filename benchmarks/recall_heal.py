#!/usr/bin/env python
"""Default-config self-healing recall attestation (r4 verdict item 1).

The r4 finding: at fast-build defaults a default-config store on uniform
100Kx64 served recall 0.917 (beam) / 0.440 (IVF nprobe=32) — below the
HNSW yardstick's 0.958 — and the sampled-recall self-check only warned.
Round 5 wires the check to auto-remediate (vector_store.py
_remediate_low_recall): IVF escalates nprobe x2 up to full probe, the
beam graph reruns full-budget refine passes, both until the estimate
clears remediate_target (default 0.98 — the estimator's bf16 tie
tolerance reads ~1-2 points above strict id-recall, so 0.97 could land
strict recall just under the 0.958 bar; 0.98 keeps the healed strict
number above it, measured 0.974/0.983 in RECALL_PARITY_r05.json).

This harness attests the healed operating point at the real scale, with
ZERO knobs — `VectorStoreConfig(dimension=d, enable_ann=True)` and
nothing else (the beam case sets only index_type, which is the workload
choice, not a tuning knob):

  case ivf_default     uniform 100Kx64, default store (auto -> IVF)
  case beam_default    uniform 100Kx64, index_type=beam_graph, fast
                       build defaults (the 0.917 regime)
  case clustered_ivf   clustered 150Kx128, default store — healthy
                       regime: escalation must NOT fire
  case clustered_beam  clustered 100Kx64, index_type=beam_graph —
                       healthy regime: no refine passes, build time
                       unchanged

Strict id-recall@10 is measured against the store's own exact scan
(use_ann=False) on held-out perturbed queries — same protocol as
benchmarks/recall_parity.py. Acceptance (VERDICT r4 item 1): healed
default-config recall >= 0.958 (the yardstick's uniform operating
point, RECALL_PARITY_r04.json) on the degraded regimes, and zero
remediation events on the clustered ones.

  python benchmarks/recall_heal.py [--cases ivf_default,beam_default]

Runs on CPU (recall is a data property, not a device property); writes
rows to stdout as JSON.
"""

import argparse
import json
import sys
import tempfile
import time
import zlib

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from benchmarks.recall_parity import make_data  # noqa: E402
from tpu_vector_db.store import TPUVectorStore, VectorStoreConfig  # noqa: E402

K = 10


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def run_store_case(name, kind, n, d, ann_params, rng, scratch):
    x, q = make_data(kind, n, d, rng)
    cfg = VectorStoreConfig(dimension=d, enable_ann=True,
                            persist_mode="off", ann_params=dict(ann_params))
    store = TPUVectorStore(f"{scratch}/{name}", cfg)

    # count remediation events without changing behavior
    events = []
    orig = store._remediate_low_recall

    def recording(est, target, estimate):
        events.append(est)
        return orig(est, target, estimate)

    store._remediate_low_recall = recording

    t0 = time.perf_counter()
    store.add_vectors(x)
    build_s = time.perf_counter() - t0

    stats = store.get_stats()
    # strict id-recall@10 vs the store's own exact scan, batch-1 queries
    # (auto-mode batch routing would send a 100-query batch to the flat
    # scan — the point here is the ANN serving path)
    hits = 0
    for qi in q:
        exact_ids, _, _ = store.query(qi, k=K, use_ann=False)
        ann_ids, _, _ = store.query(qi, k=K, use_ann=True)
        hits += len(set(exact_ids) & set(ann_ids))
    rec = hits / float(len(q) * K)

    row = {
        "case": name,
        "data": f"{kind} {n // 1000}K x {d}",
        "ann_params_in": dict(ann_params),
        "index_type_resolved": stats.get("index_type"),
        "build_plus_heal_s": round(build_s, 1),
        "remediation_events": len(events),
        "est_before_heal": round(events[0], 4) if events else None,
        "sampled_recall_estimate": round(
            stats.get("ann_recall_estimate") or -1, 4),
        "nprobe_final": store.config.ann_params.get("nprobe"),
        "strict_id_recall_at_10": round(rec, 4),
    }
    log(f"{name}: recall {rec:.4f}, events {len(events)}, "
        f"nprobe {row['nprobe_final']}, build+heal {build_s:.0f}s")
    store.close()
    return row


CASES = {
    "ivf_default": ("uniform", 100_000, 64, {}),
    "beam_default": ("uniform", 100_000, 64, {"index_type": "beam_graph"}),
    "clustered_ivf": ("clustered", 150_000, 128, {}),
    "clustered_beam": ("clustered", 100_000, 64,
                       {"index_type": "beam_graph"}),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", default=",".join(CASES),
                    help="comma-separated subset of: " + ",".join(CASES))
    ap.add_argument("--quick", action="store_true",
                    help="shrink sizes 20x for a smoke run")
    args = ap.parse_args()
    if args.quick:
        for name, (kind, n, d, params) in list(CASES.items()):
            CASES[name] = (kind, max(n // 20, 2000), d, params)
    rows = []
    with tempfile.TemporaryDirectory() as scratch:
        for name in args.cases.split(","):
            name = name.strip()
            kind, n, d, params = CASES[name]
            # per-case rng (stable hash: str hash is per-process salted):
            # results don't depend on which subset runs
            rng = np.random.default_rng(zlib.crc32(name.encode()))
            rows.append(run_store_case(name, kind, n, d, params, rng,
                                       scratch))
            print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"rows": rows}, indent=1))


if __name__ == "__main__":
    main()
