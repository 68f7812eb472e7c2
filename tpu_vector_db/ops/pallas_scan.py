"""Fused Pallas flat-scan kernel: distance + running top-k in one HBM sweep.

The stage-3 kernel from SURVEY.md §7: the database streams HBM -> VMEM in
blocks (Pallas double-buffers via the BlockSpec pipeline); each block hits
the MXU once (queries stay VMEM-resident); a (Q, k) running top-k lives in
VMEM scratch across grid steps, merged per block by k rounds of
max-extract-mask on the VPU. Nothing but the final (Q, k) winners is ever
written back to HBM — the XLA scan path materializes (Q, block)+top_k merge
chains through HBM instead.

k-pass extraction costs k * (Q x (B + k)) VPU ops per block, which stays
under the matmul's shadow for k <= ~32; the store dispatches here for small
k on TPU and to ops/scan.py otherwise.

L2 trick: ||q - x||^2 ranks identically to (2 q.x - ||x||^2) for a fixed
query, so the kernel only needs the cross term + row sqnorms; the caller
re-adds -||q||^2 to the returned keys to recover true -(dist^2).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")

# per-buffer VMEM budget for the streamed db block
_BLOCK_VMEM_BYTES = 4 * 2**20
MAX_PALLAS_K = 32


def pick_block_rows(d_pad: int, itemsize: int) -> int:
    """Power of two (divides any pow2-padded capacity), VMEM-budgeted.

    Block height is capped at 4096: the merge branch's (Q, B) working set
    lives in scoped VMEM (16MB limit — 8192 rows OOMed at Q=64). Small-d
    efficiency comes from the lazy threshold-gated merge instead."""
    rows = _BLOCK_VMEM_BYTES // (d_pad * itemsize)
    block = 512
    while block * 2 <= min(rows, 4096):
        block *= 2
    return block


def _scan_kernel(count_ref, q_ref, db_ref, sq_ref, mask_ref, vals_ref,
                 idx_ref, best_vals, best_idx, *, k: int, block_rows: int,
                 metric: str, filtered: bool):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        best_vals[:] = jnp.full_like(best_vals, NEG_INF)
        best_idx[:] = jnp.zeros_like(best_idx)

    q = q_ref[:]                                   # (Q, d) VMEM
    block = db_ref[:]                              # (B, d) VMEM (pipelined)
    cross = jnp.dot(q, block.T, preferred_element_type=jnp.float32)
    if metric == "euclidean":
        scores = 2.0 * cross - sq_ref[:][None, :]  # rank-equivalent key
    else:
        scores = cross

    count = count_ref[0]
    base = i * block_rows
    local = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    gids = base + local
    live = gids < count
    if filtered:  # metadata filter mask, streamed per block like sqnorms
        # f32 mask: Mosaic can't change bitwidth on 1-D int8 VMEM refs
        live = jnp.logical_and(live, mask_ref[:][None, :] > 0.5)
    scores = jnp.where(live, scores, NEG_INF)

    # LAZY MERGE: the k-pass extraction costs k passes over (Q, B) on the
    # VPU — the kernel bottleneck for small d. A block only needs merging
    # if some query has a candidate above its current k-th best; after the
    # first few blocks that's rare, so most steps pay one max+compare pass.
    # Skipping when nothing beats the threshold is exact.
    threshold = best_vals[:, k - 1]                          # (Q,)
    needs_merge = jnp.any(scores > threshold[:, None])

    @pl.when(needs_merge)
    def _merge():
        comb_vals = jnp.concatenate([best_vals[:], scores], axis=1)
        comb_idx = jnp.concatenate([best_idx[:], gids], axis=1)
        width = comb_vals.shape[1]
        col = jax.lax.broadcasted_iota(jnp.int32, comb_vals.shape, 1)
        for j in range(k):
            m = jnp.max(comb_vals, axis=1, keepdims=True)    # (Q, 1)
            is_max = comb_vals == m
            # tie-break to the first occurrence via min column id (Mosaic
            # has no cumsum primitive)
            cand_col = jnp.where(is_max, col, width)
            sel_col = jnp.min(cand_col, axis=1, keepdims=True)
            first = cand_col == sel_col
            best_vals[:, j] = m[:, 0]
            best_idx[:, j] = jnp.sum(
                jnp.where(first, comb_idx, 0), axis=1)
            comb_vals = jnp.where(first, NEG_INF, comb_vals)

    @pl.when(i == n_blocks - 1)
    def _emit():
        vals_ref[:] = best_vals[:]
        idx_ref[:] = best_idx[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block_rows", "interpret"))
def pallas_flat_topk(queries, db, count, k: int, metric: str = "cosine",
                     db_sqnorms=None, filter_mask=None,
                     block_rows: int | None = None,
                     interpret: bool = False):
    """Exact top-k over prepared (cosine: pre-normalized) db rows.

    Returns (keys (Q, k) f32, indices (Q, k) i32) in the same maximize-key
    convention as ops/scan.flat_scan_topk. Padding rows (>= count) never
    appear unless fewer than k rows are live.
    """
    if k > MAX_PALLAS_K:
        raise ValueError(f"pallas path supports k <= {MAX_PALLAS_K}")
    n_pad, d_pad = db.shape
    q_n = queries.shape[0]
    block = block_rows or pick_block_rows(d_pad, db.dtype.itemsize)
    assert n_pad % block == 0, (n_pad, block)
    n_blocks = n_pad // block

    q = queries.astype(db.dtype)
    if db_sqnorms is None:
        # dummy streamed input keeps the kernel signature uniform
        db_sqnorms = jnp.zeros((n_pad,), jnp.float32)
    filtered = filter_mask is not None
    mask = (filter_mask.astype(jnp.float32) if filtered
            else jnp.zeros((n_pad,), jnp.float32))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((q_n, d_pad), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),      # queries: resident
            pl.BlockSpec((block, d_pad), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),      # db: streamed
            pl.BlockSpec((block,), lambda i, s: (i,),
                         memory_space=pltpu.VMEM),      # sqnorms: streamed
            pl.BlockSpec((block,), lambda i, s: (i,),
                         memory_space=pltpu.VMEM),      # filter: streamed
        ],
        out_specs=[
            pl.BlockSpec((q_n, k), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_n, k), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((q_n, k), jnp.float32),
            pltpu.VMEM((q_n, k), jnp.int32),
        ],
    )

    kernel = functools.partial(_scan_kernel, k=k, block_rows=block,
                               metric=metric, filtered=filtered)
    vals, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q_n, k), jnp.float32),
            jax.ShapeDtypeStruct((q_n, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_n * n_pad * d_pad,
            bytes_accessed=n_pad * d_pad * db.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray([count], jnp.int32), q, db, db_sqnorms, mask)

    if metric == "euclidean":
        q_sq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1,
                       keepdims=True)
        live = vals > NEG_INF
        vals = jnp.where(live, vals - q_sq, NEG_INF)
    return vals, idx
