"""Fused Pallas flat-scan kernel: distance + running top-k in one HBM sweep.

The stage-3 kernel from SURVEY.md §7: the database streams HBM -> VMEM in
blocks (Pallas double-buffers via the BlockSpec pipeline); each block hits
the MXU once (queries stay VMEM-resident); a (Q, k) running top-k lives in
VMEM scratch across grid steps, merged per block by k rounds of
max-extract-mask on the VPU. Nothing but the final (Q, k) winners is ever
written back to HBM — the XLA scan path materializes (Q, block)+top_k merge
chains through HBM instead.

k-pass extraction costs k * (Q x (B + k)) VPU ops per block, which stays
under the matmul's shadow for k <= 32; past that a second kernel variant
(_scan_kernel_bigk) keeps a SORTED running buffer and merges blocks via
segment-winner extraction + bitonic merge — O(passes) independent of k —
covering BASELINE config #2's top-100 up to k=1024. The store dispatches
here on TPU and to ops/scan.py otherwise.

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
MAX_PALLAS_K = 32          # k-pass extraction kernel (fastest for small k)
MAX_PALLAS_K_BIG = 1024    # bitonic-merge kernel (32 < k <= 1024)


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def pick_block_rows(d_pad: int, itemsize: int, q_n: int = 64) -> int:
    """Power of two (divides any pow2-padded capacity), VMEM-budgeted.

    Two VMEM terms bound the block height B (scoped limit 16MB):
    the double-buffered db block (2·B·d·itemsize) and the merge branch's
    (Q, B) working set (~41 bytes per row·query at Q=64 — measured from
    the compiler's scoped-allocation report: d=384 bf16 at B=4096 demanded
    16.79MB and OOMed by 812KB, while d=768 at B=2048 and d=128 at B=4096
    fit). Budgeting both terms to 14.5MB keeps every measured config's
    block unchanged and drops only 384D to 2048.

    q_n-aware (r5): the merge term scales with the ACTUAL query count
    (floored at 8 — Mosaic pads the sublane dim, so a (1, B) f32 buffer
    occupies 8 sublanes), so batch-1 gets 2-4x taller blocks: 4096 at
    d=768, 16384 at d=128. Fewer grid steps matters precisely at small
    Q/d where the per-step overhead (~2 us) rivals the block's DMA time
    (1.28 us at d=128/B=4096); Q=64 picks are unchanged everywhere."""
    budget = int(14.5 * 2**20)
    q_eff = max(q_n, 8)
    block = 512
    while block * 2 <= 16384 and \
            (2 * block * 2 * d_pad * itemsize + 41 * q_eff * block * 2) \
            <= budget:
        block *= 2
    return block


def _cross_block(q, block, scl_ref, quant4: bool):
    """(Q, d) x (B, d|d/2) -> (Q, B) f32 cross term, widening
    int8/int4 capacity-mode blocks in VMEM.

    int8: the DMA moved half the bytes of bf16; the VPU widens in VMEM
    (int8 values are integers <= 127, exact in bf16) and the MXU runs
    bf16 as usual. The XLA scan converted through HBM and ran
    conversion-bound at ~197 GB/s (VERDICT r2).

    int4 (quant4): the (B, d/2) uint8 block packs column j's LOW nibble as
    component j and its HIGH nibble as component j + d/2 — so unpacking is
    one i32 widen + two nibble ops + one LANE concatenate in natural
    column order (an interleaved layout would need a lane-splitting
    reshape Mosaic rejects; uint8->bf16 casts and 8-bit vector shifts
    don't lower). The offset-8 is folded OUT of the per-element path:
    q . (n - 8) s = s (q . n) - 8 s sum(q), so the VPU never touches the
    (B, d) tensor beyond the unpack itself. Returns the true cross term
    of the dequantized rows.
    """
    if quant4:
        u = block.astype(jnp.int32)
        lo = (u & 15).astype(jnp.bfloat16)          # components 0..d/2
        hi = (u >> 4).astype(jnp.bfloat16)          # components d/2..d
        dh = lo.shape[1]
        # two half-width matmuls instead of a lane concatenate + one: the
        # unpack is the kernel's VPU bottleneck and the concat is pure
        # data movement; the MXU runs far under its roofline here
        cross = (jnp.dot(q[:, :dh], lo.T,
                         preferred_element_type=jnp.float32)
                 + jnp.dot(q[:, dh:], hi.T,
                           preferred_element_type=jnp.float32))
        qsum8 = 8.0 * jnp.sum(q.astype(jnp.float32), axis=1)   # (Q,)
        return (cross - qsum8[:, None]) * scl_ref[:][None, :]
    if block.dtype == jnp.int8:
        block = block.astype(jnp.bfloat16)
    return jnp.dot(q, block.T, preferred_element_type=jnp.float32)


def _scan_kernel(count_ref, q_ref, db_ref, sq_ref, mask_ref, scl_ref,
                 vals_ref, idx_ref, best_vals, best_idx, *, k: int,
                 block_rows: int, metric: str, filtered: bool,
                 quant4: bool):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)

    @pl.when(i == 0)
    def _init():
        best_vals[:] = jnp.full_like(best_vals, NEG_INF)
        best_idx[:] = jnp.zeros_like(best_idx)

    q = q_ref[:]                                   # (Q, d) VMEM
    cross = _cross_block(q, db_ref[:], scl_ref, quant4)
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


# --------------------------------------------------------------- big-k path
#
# For k > 32 the k-pass max-extraction merge stops hiding under the matmul
# (k passes over (Q, B+k) per merging block). The big-k kernel instead keeps
# the running (Q, Kp) buffer SORTED descending and merges each block in
# rounds:
#   1. split the block's scores into S = B/128 segments of exactly one lane
#      tile (128) each and extract every segment's max (+ first-occurrence
#      id) — 2 VPU passes over (Q, B);
#   2. bitonic-sort the S segment winners, pad to Kp, bitonic-merge into the
#      sorted buffer — O(log^2 Kp) roll/select passes over (Q, 2 Kp), tiny;
#   3. mask the extracted winners and repeat while any unmasked score still
#      beats the running k-th best.
# Exact: an element can only be hidden behind a LARGER element in its own
# segment, and that larger one is extracted this round — the loop re-checks
# the threshold after every round, so nothing above the final k-th best is
# ever dropped. Rounds per block ~1 in practice (only elements that belong
# in the current top-k force another round).
#
# Mosaic notes: the segment view (Q, S, 128) keeps the minor dim a full lane
# tile (Mosaic rejects lane-splitting reshapes like (Q, 512) -> (Q, 128, 4));
# the bitonic networks use jnp.roll with static shifts (lowers to
# concatenate of lane slices) instead of pair-reshapes.

_SEG = 128  # segment width = one lane tile


def _compare_swap(vals, ids, j: int, desc_i):
    """One compare-exchange stage at pair distance j along axis 1, via rolls.

    desc_i: (1, W) int32 0/1 — 1 where the element's group sorts descending.
    Element i pairs with i^j; the lower index keeps the max in a descending
    group. Direction masks stay int32 because Mosaic cannot select between
    i1 vectors (i8->i1 truncation is unsupported)."""
    w = vals.shape[1]
    # pltpu.roll: jnp.roll semantics but lowers to the native lane rotate
    # (jnp.roll becomes a lane-slice concatenate Mosaic rejects)
    shifted_m = pltpu.roll(vals, w - j, 1)   # value of i + j
    shifted_p = pltpu.roll(vals, j, 1)       # value of i - j
    sid_m = pltpu.roll(ids, w - j, 1)
    sid_p = pltpu.roll(ids, j, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    upper_i = col % (2 * j) // j             # 1: partner is at i - j
    upper = upper_i == 1
    pv = jnp.where(upper, shifted_p, shifted_m)
    pi = jnp.where(upper, sid_p, sid_m)
    # keep-the-max side: lower element of a descending pair (ties keep own)
    want_max = (upper_i + desc_i) == 1
    take_partner = jnp.logical_or(
        jnp.logical_and(want_max, pv > vals),
        jnp.logical_and(jnp.logical_not(want_max), pv < vals))
    nv = jnp.where(take_partner, pv, vals)
    ni = jnp.where(take_partner, pi, ids)
    return nv, ni


def bitonic_sort(vals, ids, descending: bool):
    """Full bitonic sort along axis 1 (width must be a power of two)."""
    w = vals.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, w), 1)
    size = 2
    while size <= w:
        # classic network: the (i & size) bit flips the group direction
        bit_i = col % (2 * size) // size
        desc_i = bit_i if not descending else 1 - bit_i
        j = size // 2
        while j >= 1:
            vals, ids = _compare_swap(vals, ids, j, desc_i)
            j //= 2
        size *= 2
    return vals, ids


def bitonic_merge_desc(vals, ids):
    """Merge a bitonic sequence (desc half ++ asc half) into descending
    order along axis 1 (width must be a power of two)."""
    w = vals.shape[1]
    ones = jnp.ones((1, w), jnp.int32)
    j = w // 2
    while j >= 1:
        vals, ids = _compare_swap(vals, ids, j, ones)
        j //= 2
    return vals, ids


def _scan_kernel_bigk(count_ref, q_ref, db_ref, sq_ref, mask_ref, scl_ref,
                      vals_ref, idx_ref, best_vals, best_idx, sc_ref, *,
                      k: int, kp: int, block_rows: int, metric: str,
                      filtered: bool, quant4: bool):
    i = pl.program_id(0)
    n_blocks = pl.num_programs(0)
    q_n = q_ref.shape[0]
    n_seg = block_rows // _SEG

    @pl.when(i == 0)
    def _init():
        best_vals[:] = jnp.full_like(best_vals, NEG_INF)
        best_idx[:] = jnp.zeros_like(best_idx)

    q = q_ref[:]
    cross = _cross_block(q, db_ref[:], scl_ref, quant4)
    if metric == "euclidean":
        scores = 2.0 * cross - sq_ref[:][None, :]
    else:
        scores = cross

    count = count_ref[0]
    base = i * block_rows
    gids_flat = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    live = gids_flat < count
    if filtered:
        live = jnp.logical_and(live, mask_ref[:][None, :] > 0.5)
    masked0 = jnp.where(live, scores, NEG_INF)
    sc_ref[:] = masked0
    thr0 = best_vals[:, k - 1]
    # the continue-condition is always computed from the in-register masked
    # values: re-reading the (Q, B) scratch per round would add ~2 VPU
    # passes per block (measured ~1ms at 1M x 128D k=100)
    need0 = jnp.any(masked0 > thr0[:, None])

    def round_body(_):
        sv = sc_ref[:].reshape(q_n, n_seg, _SEG)
        m = jnp.max(sv, axis=2)                               # (Q, S)
        li = jax.lax.broadcasted_iota(jnp.int32, sv.shape, 2)
        cand = jnp.where(sv == m[:, :, None], li, _SEG)
        sel = jnp.min(cand, axis=2)                           # first occurrence
        seg_base = jax.lax.broadcasted_iota(jnp.int32, (q_n, n_seg), 1) * _SEG
        win_ids = base + seg_base + sel
        # mask the extracted winners in place
        masked = jnp.where(li == sel[:, :, None], NEG_INF, sv)
        sc_ref[:] = masked.reshape(q_n, block_rows)
        # sort winners ascending; left-pad with -inf up to kp so
        # [buffer desc | pad asc-prefix | winners asc] stays bitonic
        wv, wi = bitonic_sort(m, win_ids, descending=False)
        if n_seg < kp:
            pad = kp - n_seg
            wv = jnp.concatenate(
                [jnp.full((q_n, pad), NEG_INF, wv.dtype), wv], axis=1)
            wi = jnp.concatenate(
                [jnp.zeros((q_n, pad), wi.dtype), wi], axis=1)
        cv = jnp.concatenate([best_vals[:], wv], axis=1)      # bitonic, 2*kp
        ci = jnp.concatenate([best_idx[:], wi], axis=1)
        cv, ci = bitonic_merge_desc(cv, ci)
        best_vals[:] = cv[:, :kp]
        best_idx[:] = ci[:, :kp]
        thr = cv[:, k - 1]
        # compare in 2-D: the 3-D form thr[:, None, None] asks Mosaic to
        # broadcast across sublanes AND lanes at Q=1 ("Not implemented:
        # Broadcast in both sublanes and lanes"); (Q, B) vs (Q, 1) is the
        # same lane-only pattern the need0 check uses
        return jnp.any(masked.reshape(q_n, block_rows) > thr[:, None])

    jax.lax.while_loop(lambda more: more, round_body, need0)

    @pl.when(i == n_blocks - 1)
    def _emit():
        vals_ref[:] = best_vals[:, :k]
        idx_ref[:] = best_idx[:, :k]


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "block_rows", "interpret"))
def pallas_flat_topk(queries, db, count, k: int, metric: str = "cosine",
                     db_sqnorms=None, filter_mask=None, db_scales=None,
                     block_rows: int | None = None,
                     interpret: bool = False):
    """Exact top-k over prepared (cosine: pre-normalized) db rows.

    Returns (keys (Q, k) f32, indices (Q, k) i32) in the same maximize-key
    convention as ops/scan.flat_scan_topk. Padding rows (>= count) never
    appear unless fewer than k rows are live.

    int4 capacity mode: pass db as (N, d_pad//2) uint8 (ops/quant4.pack_int4)
    with db_scales = per-row f32 dequant scales; keys are the true scores
    of the dequantized rows. Requires d_pad % 256 == 0 (the packed minor
    dim must stay a lane-tile multiple).
    """
    if k > MAX_PALLAS_K_BIG:
        raise ValueError(f"pallas path supports k <= {MAX_PALLAS_K_BIG}")
    quant4 = db.dtype == jnp.uint8
    n_pad, d_cols = db.shape
    d_pad = d_cols * 2 if quant4 else d_cols
    if quant4 and d_pad % 256:
        raise ValueError(f"int4 mode needs d_pad % 256 == 0, got {d_pad}")
    if db_scales is not None and not quant4:
        raise ValueError("db_scales is only meaningful for uint8-packed "
                         "int4 databases")
    q_n = queries.shape[0]
    # int8/int4 stream fewer bytes than bf16 but materialize a widened
    # bf16 copy of the block in VMEM (_cross_block) — budget the block
    # like bf16 (itemsize 2 covers stream + widened copy for both)
    block = block_rows or pick_block_rows(
        d_pad, max(db.dtype.itemsize, 2), q_n)
    # a q_n-aware pick can exceed what the capacity padding divides
    # (e.g. cap padded to 4096-row multiples, batch-1 picks 16384):
    # shrink to the largest divisor — never larger than the caller asked
    while block > 512 and n_pad % block:
        block //= 2
    assert n_pad % block == 0, (n_pad, block)
    n_blocks = n_pad // block
    bigk = k > MAX_PALLAS_K
    kp = max(_next_pow2(k), 128) if bigk else k
    assert not bigk or block // _SEG <= kp, (block, kp)

    # int8/int4 capacity modes keep queries bf16 (casting unit-norm queries
    # to int8 would floor them to zero); the kernel widens the db in VMEM
    q = queries.astype(jnp.bfloat16 if db.dtype.itemsize == 1 else db.dtype)
    if db_sqnorms is None:
        # dummy streamed input keeps the kernel signature uniform
        db_sqnorms = jnp.zeros((n_pad,), jnp.float32)
    filtered = filter_mask is not None
    mask = (filter_mask.astype(jnp.float32) if filtered
            else jnp.zeros((n_pad,), jnp.float32))
    if db_scales is None:
        db_scales = jnp.zeros((n_pad,), jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((q_n, d_pad), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),      # queries: resident
            pl.BlockSpec((block, d_cols), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),      # db: streamed
            pl.BlockSpec((block,), lambda i, s: (i,),
                         memory_space=pltpu.VMEM),      # sqnorms: streamed
            pl.BlockSpec((block,), lambda i, s: (i,),
                         memory_space=pltpu.VMEM),      # filter: streamed
            pl.BlockSpec((block,), lambda i, s: (i,),
                         memory_space=pltpu.VMEM),      # scales: streamed
        ],
        out_specs=[
            pl.BlockSpec((q_n, k), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q_n, k), lambda i, s: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=(
            [pltpu.VMEM((q_n, kp), jnp.float32),
             pltpu.VMEM((q_n, kp), jnp.int32),
             pltpu.VMEM((q_n, block), jnp.float32)]
            if bigk else
            [pltpu.VMEM((q_n, k), jnp.float32),
             pltpu.VMEM((q_n, k), jnp.int32)]
        ),
    )

    if bigk:
        kernel = functools.partial(_scan_kernel_bigk, k=k, kp=kp,
                                   block_rows=block, metric=metric,
                                   filtered=filtered, quant4=quant4)
    else:
        kernel = functools.partial(_scan_kernel, k=k, block_rows=block,
                                   metric=metric, filtered=filtered,
                                   quant4=quant4)
    vals, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((q_n, k), jnp.float32),
            jax.ShapeDtypeStruct((q_n, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * q_n * n_pad * d_pad,
            bytes_accessed=n_pad * d_cols * db.dtype.itemsize,
            transcendentals=0),
        interpret=interpret,
    )(jnp.asarray([count], jnp.int32), q, db, db_sqnorms, mask, db_scales)

    if metric == "euclidean":
        q_sq = jnp.sum(queries.astype(jnp.float32) ** 2, axis=-1,
                       keepdims=True)
        live = vals > NEG_INF
        vals = jnp.where(live, vals - q_sq, NEG_INF)
    return vals, idx
