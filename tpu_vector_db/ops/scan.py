"""Blockwise flat scan + partial top-k (the XLA baseline query engine).

This is the TPU-native replacement for the reference's brute-force path
(``service/optimized_vector_store.py:149-192``): instead of materializing the
full (Q, N) score matrix and argsorting it, the database streams through the
MXU in row blocks; each block's scores feed a running top-k merge held in
registers/VMEM by XLA. Memory high-water is O(Q * block) instead of O(Q * N),
so 10M-row stores scan with a constant footprint.

A fused Pallas kernel with explicit HBM->VMEM double buffering lives in
``ops/pallas_scan.py``; this module is the portable baseline (CPU-runnable for
tests, and already MXU-bound on TPU for large d).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_vector_db.ops import distance
from tpu_vector_db.ops.topk import NEG_INF, merge_topk

# Rows per block in the streamed scan. 8192 x 768 bf16 = 12 MB/block: large
# enough to keep the MXU busy, small enough that XLA double-buffers in VMEM.
DEFAULT_BLOCK_ROWS = 8192

# Below this many rows a single matmul + top_k beats the scan (no merge chain).
SMALL_N_THRESHOLD = 32768


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "db_normalized", "block_rows"),
)
def flat_scan_topk(
    queries: jnp.ndarray,       # (Q, d_pad)
    db: jnp.ndarray,            # (N_pad, d_pad), rows >= count are zero pad
    count,                      # scalar int32: live rows
    k: int,
    metric: str = "cosine",
    db_normalized: bool = False,
    db_sqnorms: jnp.ndarray | None = None,   # (N_pad,) cached ||x||^2 for L2
    filter_mask: jnp.ndarray | None = None,  # (N_pad,) bool metadata filter
    block_rows: int = DEFAULT_BLOCK_ROWS,
    db_scales: jnp.ndarray | None = None,    # (N_pad,) int4 dequant scales
):
    """Exact top-k over the whole store. Returns (keys (Q,k), indices (Q,k)).

    Keys follow the internal maximize convention (see ops/distance.py);
    indices are global row ids. Padding and filtered-out rows can appear only
    when fewer than k rows are live — callers clamp with ``count``.

    int4 capacity mode: db as (N_pad, d_pad//2) uint8 (ops/quant4.pack_int4)
    with db_scales — each block unpacks to bf16 on the fly (O(Q*B) extra
    work, the packed rows stay the only HBM-resident copy), mirroring the
    Pallas quant4 kernel's math exactly.
    """
    quant4 = db.dtype == jnp.uint8
    if quant4 and db_scales is None:
        raise ValueError("uint8-packed int4 db needs db_scales")
    n_pad = db.shape[0]
    q = queries.shape[0]
    k = min(k, n_pad)

    if metric == "cosine" and not db_normalized and not quant4:
        db = distance.l2_normalize(db)
        db_normalized = True
    qn = distance.l2_normalize(queries) if metric == "cosine" else queries
    # score in the storage dtype (bf16 storage => bf16 MXU passes, f32
    # accumulation): mixed f32xbf16 inputs silently upcast to f32 matmuls.
    # int8 storage keeps f32 queries (casting unit-norm queries to int8
    # would floor them to zero); XLA upcasts the int8 operand instead.
    if db.dtype != jnp.int8 and not quant4:
        qn = qn.astype(db.dtype)
    if quant4:
        # offset-8 folded out of the matmul: q.(n-8)s = s(q.n) - 8s sum(q)
        q_bf = qn.astype(jnp.bfloat16)
        qsum8 = 8.0 * jnp.sum(qn.astype(jnp.float32), axis=1)      # (Q,)
        q_sq = jnp.sum(qn.astype(jnp.float32) ** 2, axis=1)        # (Q,)

    def block_scores(db_block, sq_block, scl_block=None):
        if quant4:
            u = db_block.astype(jnp.int32)
            nib = jnp.concatenate([u & 15, u >> 4],
                                  axis=1).astype(jnp.bfloat16)
            cross = jnp.matmul(q_bf, nib.T,
                               preferred_element_type=jnp.float32)
            cross = (cross - qsum8[:, None]) * scl_block[None, :]
            if metric == "euclidean":
                # -(||q - x||^2) with streamed dequantized-row sqnorms
                return 2.0 * cross - sq_block[None, :] - q_sq[:, None]
            return cross
        if metric == "cosine":
            return jnp.matmul(qn, db_block.T, preferred_element_type=jnp.float32)
        if metric in ("dot", "dot_product"):
            return jnp.matmul(qn, db_block.T, preferred_element_type=jnp.float32)
        return -distance.squared_l2_distances(qn, db_block, sq_block)

    if n_pad <= max(SMALL_N_THRESHOLD, block_rows):
        scores = block_scores(db, db_sqnorms, db_scales)
        valid = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1) < count
        if filter_mask is not None:
            valid = jnp.logical_and(valid, filter_mask[None, :])
        scores = jnp.where(valid, scores, NEG_INF)
        vals, idx = jax.lax.top_k(scores, k)
        return vals, idx.astype(jnp.int32)

    assert n_pad % block_rows == 0, (
        f"db rows ({n_pad}) must be padded to a multiple of block_rows "
        f"({block_rows}) by the store")
    num_blocks = n_pad // block_rows
    local_ids = jax.lax.broadcasted_iota(jnp.int32, (1, block_rows), 1)

    def body(carry, block_idx):
        best_vals, best_idx = carry
        start = block_idx * block_rows
        db_block = jax.lax.dynamic_slice_in_dim(db, start, block_rows, axis=0)
        sq_block = (jax.lax.dynamic_slice_in_dim(db_sqnorms, start, block_rows)
                    if db_sqnorms is not None else None)
        scl_block = (jax.lax.dynamic_slice_in_dim(db_scales, start, block_rows)
                     if quant4 else None)
        scores = block_scores(db_block, sq_block, scl_block)  # (Q, B)
        ids = start + local_ids                               # (1, B)
        valid = ids < count
        if filter_mask is not None:
            fm = jax.lax.dynamic_slice_in_dim(filter_mask, start, block_rows)
            valid = jnp.logical_and(valid, fm[None, :])
        scores = jnp.where(valid, scores, NEG_INF)
        ids_b = jnp.broadcast_to(ids, (q, block_rows))
        best_vals, best_idx = merge_topk(best_vals, best_idx, scores, ids_b, k)
        return (best_vals, best_idx), None

    init = (jnp.full((q, k), NEG_INF, jnp.float32),
            jnp.zeros((q, k), jnp.int32))
    (vals, idx), _ = jax.lax.scan(body, init, jnp.arange(num_blocks))
    return vals, idx
