"""Sharded flat scan: per-chip local top-k, cross-chip merge over ICI.

The distributed query engine (SURVEY.md §2.2 table): every chip scans its row
shard with the same blockwise kernel used single-chip (ops/scan.py), produces
k local winners, and ONE all-gather of the (Q, k) winner sets — k·P candidates,
a few KB — crosses the interconnect; every chip then merges to the identical
global top-k. No score matrix, no row data, ever leaves a chip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from tpu_vector_db.ops.scan import flat_scan_topk
from tpu_vector_db.parallel.mesh import REPLICA_AXIS, SHARD_AXIS


def make_serving_query_fn(mesh: Mesh, k: int, metric: str = "cosine",
                          db_normalized: bool = True,
                          block_rows: int = 8192,
                          replica_axis: str = REPLICA_AXIS,
                          shard_axis: str = SHARD_AXIS):
    """2-D data-parallel serving step over a (replica, shard) mesh.

    queries (Q_total, d) split across `replica` groups; db rows sharded over
    `shard` and replicated over `replica`. Each group computes its queries'
    global top-k with the local-scan + shard-axis all-gather merge; results
    come back sharded over `replica` — no cross-group traffic at all.
    """
    def core(queries, db, count):
        rows_local = db.shape[0]
        shard_id = jax.lax.axis_index(shard_axis)
        offset = shard_id * rows_local
        local_count = jnp.clip(count - offset, 0, rows_local).astype(jnp.int32)
        keys, idx = flat_scan_topk(
            queries, db, local_count, k, metric=metric,
            db_normalized=db_normalized, block_rows=block_rows)
        gidx = idx + offset
        all_keys = jax.lax.all_gather(keys, shard_axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(gidx, shard_axis, axis=1, tiled=True)
        vals, sel = jax.lax.top_k(all_keys, k)
        return vals, jnp.take_along_axis(all_idx, sel, axis=-1)

    sharded = jax.shard_map(
        core, mesh=mesh,
        in_specs=(P(replica_axis, None), P(shard_axis, None), P()),
        out_specs=(P(replica_axis, None), P(replica_axis, None)),
        check_vma=False)
    return jax.jit(sharded)


def make_sharded_query_fn(mesh: Mesh, k: int, metric: str = "cosine",
                          db_normalized: bool = True,
                          with_sqnorms: bool = False,
                          with_filter: bool = False,
                          with_scales: bool = False,
                          block_rows: int = 8192,
                          axis_name: str = SHARD_AXIS):
    """Build a jitted (queries, db, count[, sqnorms][, mask][, scales])
    -> (keys, idx).

    - queries: (Q, d_pad) replicated
    - db: (N_pad_total, d_pad) row-sharded; N_pad_total % n_devices == 0 and
      each shard a multiple of block_rows (the store guarantees this).
      int4 capacity mode: (N_pad_total, d_pad//2) uint8-packed rows
      (with_scales=True) — 2x int8's rows per chip sweep the mesh with the
      same k·P merge.
    - count: global live-row count, replicated scalar (int32 array)
    - sqnorms (euclidean) / filter mask / int4 scales: row-sharded like db
      when present
    Returns replicated (Q, k) keys + global indices (identical on all chips).
    """
    n_dev = mesh.devices.size

    def core(queries, db, count, sqnorms, mask, scales):
        rows_local = db.shape[0]  # per-shard rows under shard_map
        shard_id = jax.lax.axis_index(axis_name)
        offset = shard_id * rows_local
        local_count = jnp.clip(count - offset, 0, rows_local).astype(jnp.int32)
        keys, idx = flat_scan_topk(
            queries, db, local_count, k, metric=metric,
            db_normalized=db_normalized, db_sqnorms=sqnorms,
            filter_mask=mask, block_rows=block_rows, db_scales=scales)
        gidx = idx + offset
        # ICI: k·P candidates per query, the only cross-chip traffic
        all_keys = jax.lax.all_gather(keys, axis_name, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(gidx, axis_name, axis=1, tiled=True)
        vals, sel = jax.lax.top_k(all_keys, k)
        return vals, jnp.take_along_axis(all_idx, sel, axis=-1)

    row = P(axis_name)

    def fn(queries, db, count, *rest):
        it = iter(rest)
        sq = next(it) if with_sqnorms else None
        m = next(it) if with_filter else None
        scl = next(it) if with_scales else None
        return core(queries, db, count, sq, m, scl)

    n_row_args = int(with_sqnorms) + int(with_filter) + int(with_scales)
    in_specs = (P(), P(axis_name, None), P()) + (row,) * n_row_args

    sharded = jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                            out_specs=(P(), P()), check_vma=False)
    return jax.jit(sharded), n_dev
