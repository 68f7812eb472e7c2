"""IVF probe scan: stream ONLY the probed buckets through the MXU.

The IVF index (index/ivf.py) lays the store out cluster-major in fixed-size
buckets (NB, Bc, d). A query probes `nprobe` buckets chosen by centroid
score; this kernel walks grid (Q, nprobe) and uses Pallas scalar prefetch to
drive the db BlockSpec index_map with the selected bucket id — the HBM
traffic is exactly the probed rows (contiguous 0.5-2MB blocks, DMA-friendly,
double-buffered by the pipeline), never the whole store. The per-bucket
merge is the same lazy k-pass running top-k as ops/pallas_scan.py.

Mosaic constraint that shaped the interface: 2-D per-bucket side arrays
(ids, sqnorms) can't stream as (1, Bc) blocks (sublane dim must divide 8),
so the kernel carries NO side streams — winners are reported as flat
positions (bucket * Bc + slot) computed from the prefetched bucket id, dead
tail slots are masked via per-bucket FILL COUNTS (scalar-prefetched, the
layout fills buckets front-to-back), and one (Q, k) gather outside the
kernel maps positions to global row ids. Cosine/dot only; euclidean uses
the XLA fallback below (still probe-local traffic).

The reference's equivalent hot loop is hnswlib's pointer-chasing knn_query
(performance/hnsw_index.py:79-103) — latency-bound random access with no
efficient TPU analog; bucketized probing replaces it with dense streaming.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_vector_db.ops.topk import merge_topk

NEG_INF = float("-inf")
MAX_IVF_PALLAS_K = 32


def _ivf_kernel(sel_ref, fills_ref, q_ref, db_ref, vals_ref, pos_ref,
                best_vals, best_pos, *, k: int, bc: int):
    qi = pl.program_id(0)
    p = pl.program_id(1)
    n_probe = pl.num_programs(1)

    @pl.when(p == 0)
    def _init():
        best_vals[:] = jnp.full_like(best_vals, NEG_INF)
        best_pos[:] = jnp.zeros_like(best_pos)

    # whole query batch stays VMEM-resident; dynamic SUBLANE slice picks
    # this step's row (a (1, d) per-query block would violate Mosaic's
    # sublane-divisibility rule whenever Q > 1). The ref is kept float32:
    # bf16 packs 2 rows per sublane and Mosaic then requires the dynamic
    # row index to be provably even — f32 packs 1, so any index is legal.
    block = db_ref[0]                              # (Bc, d)
    q = q_ref[pl.ds(qi, 1)].astype(block.dtype)    # (1, d)
    scores = jnp.dot(q, block.T, preferred_element_type=jnp.float32)
    b = sel_ref[qi, p]
    slot = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    live = slot < fills_ref[b]                     # buckets fill front-to-back
    scores = jnp.where(live, scores, NEG_INF)
    flat_pos = b * bc + slot                       # (1, Bc)

    threshold = best_vals[0, k - 1]
    needs_merge = jnp.any(scores > threshold)

    @pl.when(needs_merge)
    def _merge():
        comb_vals = jnp.concatenate([best_vals[:], scores], axis=1)
        comb_pos = jnp.concatenate([best_pos[:], flat_pos], axis=1)
        width = comb_vals.shape[1]
        col = jax.lax.broadcasted_iota(jnp.int32, comb_vals.shape, 1)
        for j in range(k):
            m = jnp.max(comb_vals, axis=1, keepdims=True)
            is_max = comb_vals == m
            cand_col = jnp.where(is_max, col, width)
            sel_col = jnp.min(cand_col, axis=1, keepdims=True)
            first = cand_col == sel_col
            best_vals[:, j] = m[:, 0]
            best_pos[:, j] = jnp.sum(jnp.where(first, comb_pos, 0), axis=1)
            comb_vals = jnp.where(first, NEG_INF, comb_vals)

    @pl.when(p == n_probe - 1)
    def _emit():
        vals_ref[pl.ds(qi, 1)] = best_vals[:]
        pos_ref[pl.ds(qi, 1)] = best_pos[:]


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def ivf_probe_topk_pallas(queries, db_buckets, bucket_ids, bucket_fills,
                          sel, k: int, interpret: bool = False):
    """Cosine/dot probe scan. Returns (keys (Q, k) f32, global ids (Q, k)
    i32); key NEG_INF marks an empty slot. queries prepared like bucket
    rows."""
    if k > MAX_IVF_PALLAS_K:
        raise ValueError(f"pallas IVF path supports k <= {MAX_IVF_PALLAS_K}")
    q_n, d_pad = queries.shape
    nb, bc, _ = db_buckets.shape
    n_probe = sel.shape[1]
    q = queries.astype(jnp.float32)  # f32 VMEM residency: see _ivf_kernel

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(q_n, n_probe),
        in_specs=[
            pl.BlockSpec((q_n, d_pad), lambda qi, p, s, f: (0, 0),
                         memory_space=pltpu.VMEM),   # queries: resident
            pl.BlockSpec((1, bc, d_pad), lambda qi, p, s, f: (s[qi, p], 0, 0),
                         memory_space=pltpu.VMEM),   # the probed bucket
        ],
        out_specs=[
            pl.BlockSpec((q_n, k), lambda qi, p, s, f: (0, 0),
                         memory_space=pltpu.VMEM),   # resident; row qi
            pl.BlockSpec((q_n, k), lambda qi, p, s, f: (0, 0),
                         memory_space=pltpu.VMEM),   # written at emit
        ],
        scratch_shapes=[
            pltpu.VMEM((1, k), jnp.float32),
            pltpu.VMEM((1, k), jnp.int32),
        ],
    )
    kernel = functools.partial(_ivf_kernel, k=k, bc=bc)
    vals, pos = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q_n, k), jnp.float32),
            jax.ShapeDtypeStruct((q_n, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_n * n_probe * bc * d_pad,
            bytes_accessed=q_n * n_probe * bc * d_pad
            * db_buckets.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(sel.astype(jnp.int32), bucket_fills.astype(jnp.int32), q, db_buckets)
    ids = bucket_ids.reshape(-1)[pos]              # flat position -> row id
    ids = jnp.where(vals > NEG_INF, ids, -1)
    return vals, ids


def _finish_euclidean(vals, idx, queries, metric):
    if metric == "euclidean":
        q_sq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1,
                       keepdims=True)
        vals = jnp.where(vals > NEG_INF, vals - q_sq, NEG_INF)
    return vals, idx


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def ivf_probe_topk_gather(queries, db_flat, bucket_ids, sel, k: int,
                          metric: str = "cosine", db_scales=None):
    """Probe scan that GATHERS the probed rows from the store's FLAT
    matrix instead of a bucketized copy — zero extra vector memory.

    This is the serving path for the int8/int4 capacity modes (16M/32M x
    768D on one 16 GB chip), where duplicating rows into (NB, Bc, d)
    buckets cannot fit: the index holds only the (NB, Bc) id table (+
    centroids), and each probe step gathers `bucket_ids[sel[:, p]]` rows
    from db_flat. Rows are 768B-contiguous, so the gather runs near DMA
    bandwidth while touching ~nprobe*Bc/N of the store (~0.8% at 16M,
    C=16K, nprobe=64) — vs the full-sweep exact kernel's 25-37 ms.

    db_flat: (N_pad, d) bf16/int8 rows, or (N_pad, d/2) uint8-packed int4
    with db_scales (per-row dequant scales). int8 keys come back in the
    raw x127 quantizer scale — the caller divides, exactly like the flat
    engine (store/vector_store.py _flat_topk). Cosine/dot only (the
    quantized capacity modes are cosine-only by config).

    Reference contrast: hnswlib's random-access knn_query
    (performance/hnsw_index.py:79-103) is the latency analog; here the
    random access is amortized to whole-bucket row gathers.
    """
    if metric == "euclidean":
        raise ValueError("gather-layout probes are cosine/dot only "
                         "(quantized capacity modes are cosine by config)")
    q_n = queries.shape[0]
    nb, bc = bucket_ids.shape
    n_probe = sel.shape[1]
    k_eff = min(k, n_probe * bc)
    quant4 = db_flat.dtype == jnp.uint8
    if quant4 and db_scales is None:
        raise ValueError("uint8-packed int4 db needs db_scales")
    q = queries.astype(jnp.bfloat16 if db_flat.dtype.itemsize == 1
                       else db_flat.dtype)

    def body(carry, p):
        best_vals, best_idx = carry
        b = sel[:, p]                                  # (Q,)
        gids = bucket_ids[b]                           # (Q, Bc)
        safe = jnp.maximum(gids, 0)
        rows = db_flat[safe]                           # (Q, Bc, cols)
        if quant4:
            u = rows.astype(jnp.int32)
            lo = ((u & 15) - 8).astype(jnp.bfloat16)
            hi = ((u >> 4) - 8).astype(jnp.bfloat16)
            cross = (jnp.einsum("qd,qbd->qb", q[:, : lo.shape[-1]], lo,
                                preferred_element_type=jnp.float32)
                     + jnp.einsum("qd,qbd->qb", q[:, lo.shape[-1]:], hi,
                                  preferred_element_type=jnp.float32))
            scores = cross * db_scales[safe]
        else:
            scores = jnp.einsum(
                "qd,qbd->qb", q, rows.astype(q.dtype),
                preferred_element_type=jnp.float32)
        scores = jnp.where(gids >= 0, scores, NEG_INF)
        best_vals, best_idx = merge_topk(best_vals, best_idx, scores, gids,
                                         k_eff)
        return (best_vals, best_idx), None

    init = (jnp.full((q_n, k_eff), NEG_INF, jnp.float32),
            jnp.zeros((q_n, k_eff), jnp.int32))
    (vals, idx), _ = jax.lax.scan(body, init, jnp.arange(n_probe))
    if k_eff < k:
        vals = jnp.concatenate(
            [vals, jnp.full((q_n, k - k_eff), NEG_INF, jnp.float32)], axis=1)
        idx = jnp.concatenate(
            [idx, jnp.zeros((q_n, k - k_eff), jnp.int32)], axis=1)
    idx = jnp.where(vals > NEG_INF, idx, -1)
    return vals, idx


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def ivf_probe_topk_xla(queries, db_buckets, bucket_ids, sel, k: int,
                       metric: str = "cosine", bucket_sqnorms=None):
    """XLA fallback: lax.scan over probes, per-step bucket gather + matmul +
    top-k merge. Used on CPU, for k > 32, and for euclidean (per-row
    sqnorms stream freely in XLA)."""
    q_n, d_pad = queries.shape
    nb, bc, _ = db_buckets.shape
    n_probe = sel.shape[1]
    k_eff = min(k, n_probe * bc)
    q = queries.astype(db_buckets.dtype)
    if bucket_sqnorms is None:
        bucket_sqnorms = jnp.zeros((nb, bc), jnp.float32)

    def body(carry, p):
        best_vals, best_idx = carry
        b = sel[:, p]                                  # (Q,)
        block = db_buckets[b]                          # (Q, Bc, d) gather
        gids = bucket_ids[b]                           # (Q, Bc)
        cross = jnp.einsum("qd,qbd->qb", q, block,
                           preferred_element_type=jnp.float32)
        if metric == "euclidean":
            scores = 2.0 * cross - bucket_sqnorms[b]
        else:
            scores = cross
        scores = jnp.where(gids >= 0, scores, NEG_INF)
        best_vals, best_idx = merge_topk(best_vals, best_idx, scores, gids,
                                         k_eff)
        return (best_vals, best_idx), None

    init = (jnp.full((q_n, k_eff), NEG_INF, jnp.float32),
            jnp.zeros((q_n, k_eff), jnp.int32))
    (vals, idx), _ = jax.lax.scan(body, init, jnp.arange(n_probe))
    if k_eff < k:  # pad to the requested k for a uniform caller contract
        pad_v = jnp.full((q_n, k - k_eff), NEG_INF, jnp.float32)
        pad_i = jnp.zeros((q_n, k - k_eff), jnp.int32)
        vals = jnp.concatenate([vals, pad_v], axis=1)
        idx = jnp.concatenate([idx, pad_i], axis=1)
    idx = jnp.where(vals > NEG_INF, idx, -1)
    return _finish_euclidean(vals, idx, queries, metric)
