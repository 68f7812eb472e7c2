#!/usr/bin/env python
"""BASELINE config #5 at its TRUE shape: 10M x 128D sharded over an
8-device mesh, merged top-k checked exactly against the single-device
flat scan of the same bf16 rows (VERDICT r3 item 6 — until r4 the sub-ms
projection rested on a 1.25M single-chip slice plus a toy-shape merge
proof; this executes the full sharded shape end to end).

Runs on the 8-virtual-device CPU mesh by default (correctness + shape
feasibility; latency on the CPU mesh is meaningless and recorded only as
wall time). Writes CONFIG5_FULLSHAPE.json at the repo root.

Usage: python benchmarks/config5_full_shape.py [n_devices]
"""

import json
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

n_devices = int(sys.argv[1]) if len(sys.argv) > 1 else 8

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from __graft_entry__ import full_shape_config5  # noqa: E402

res = full_shape_config5(n_devices)
out = ROOT / "CONFIG5_FULLSHAPE.json"
out.write_text(json.dumps(res, indent=1))
print(f"wrote {out}")
