"""Device k-means (blocked Lloyd iterations) — the IVF coarse quantizer.

The reference had no trainable index stage (hnswlib builds its graph on the
CPU, performance/hnsw_index.py:44-77); on TPU a k-means coarse quantizer is
the natural ANN partitioner because every step is a large MXU matmul:

* assignment: blockwise (B, d) x (d, C) score matmul + argmax — the same
  shape as the query scan, so it rides the MXU at full tilt;
* update: per-block one-hot (B, C) matmuls accumulate centroid sums
  (block^T @ onehot) and counts — no scatters, no host round-trips;
* a 1M x 768D x 4096-centroid training run is ~10 matmul-bound iterations,
  seconds on a v5e vs the ~hour-scale graph build.

Cosine uses spherical k-means (centroids re-normalized each iteration);
euclidean uses the ||x||^2 - 2 x.c + ||c||^2 expansion. Empty clusters are
re-seeded from the rows worst-served by their current centroid, which keeps
cluster sizes usable for the IVF bucket layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


def _compute_dtype(db_dtype):
    """MXU dtype for a storage dtype: quantized rows widen to bf16."""
    if db_dtype in (jnp.int8, jnp.uint8):
        return jnp.bfloat16
    return db_dtype


def _widen_block(block, scales_block):
    """Quantized capacity-mode blocks -> matmul-ready rows.

    int8: plain widen (values <= 127 exact in bf16; the uniform x127 row
    scale cancels in cosine argmax and normalizes out of centroids).
    uint8 = packed int4: dequantize with the per-row scales
    (ops/quant4.unpack_int4). Other dtypes pass through."""
    if block.dtype == jnp.uint8:
        from tpu_vector_db.ops.quant4 import unpack_int4
        return unpack_int4(block, scales_block).astype(jnp.bfloat16)
    if block.dtype == jnp.int8:
        return block.astype(jnp.bfloat16)
    return block


def _seed_rows(db, idx, db_scales):
    """Gather seed/reseed centroid rows in f32 (dequantized for int4).

    int8 rows divide their fixed x127 scale back out: RESEEDS mix with
    surviving centroids that the cosine Lloyd step has normalized to unit
    norm, and a x127-magnitude reseed would capture every row whose
    cosine beats best/127 — i.e. the whole corpus (review finding)."""
    if db.dtype == jnp.uint8:
        from tpu_vector_db.ops.quant4 import unpack_int4
        return unpack_int4(db[idx], db_scales[idx])
    rows = db[idx].astype(jnp.float32)
    if db.dtype == jnp.int8:
        rows = rows * (1.0 / 127.0)
    return rows


def _block_layout(n_pad: int, block_rows: int) -> tuple[int, int]:
    """(num_blocks, block_rows) covering ALL n_pad rows.

    num_blocks = ceil(n_pad / block_rows); the last block's start is
    clamped back to n_pad - block_rows, so it overlaps the previous
    block instead of reading out of bounds. Callers mask the re-read
    overlap rows out (review finding: floor-division silently dropped
    the tail for non-divisible row counts, e.g. a last IVF shard of
    140001 rows — training lost rows and assign crashed on reshape).
    """
    block_rows = min(block_rows, n_pad)
    num_blocks = -(-n_pad // block_rows)
    return num_blocks, block_rows


def _scores(block, centroids, metric, c_sqnorms):
    """(B, C) maximize-keys between data block and centroids."""
    cross = jnp.matmul(block, centroids.T,
                       preferred_element_type=jnp.float32)
    if metric == "euclidean":
        return 2.0 * cross - c_sqnorms[None, :]
    return cross  # cosine (rows pre-normalized) and dot


@functools.partial(jax.jit, static_argnames=("metric", "block_rows"))
def assign_clusters(db, count, centroids, metric: str = "cosine",
                    block_rows: int = 65536, db_scales=None):
    """(N_pad,) int32 cluster id per row (padding rows get cluster 0).
    db_scales: per-row dequant scales, required for uint8-packed int4."""
    n_pad = db.shape[0]
    c_sq = jnp.sum(centroids.astype(jnp.float32) ** 2, -1)
    cents = centroids.astype(_compute_dtype(db.dtype))
    num_blocks, block_rows = _block_layout(n_pad, block_rows)

    def body(_, idx):
        start = jnp.minimum(idx * block_rows, n_pad - block_rows)
        block = jax.lax.dynamic_slice_in_dim(db, start, block_rows, axis=0)
        scl = (jax.lax.dynamic_slice_in_dim(db_scales, start, block_rows)
               if db_scales is not None else None)
        s = _scores(_widen_block(block, scl), cents, metric, c_sq)
        return None, jnp.argmax(s, axis=-1).astype(jnp.int32)

    _, assign = jax.lax.scan(body, None, jnp.arange(num_blocks))
    if num_blocks * block_rows == n_pad:
        return assign.reshape(n_pad)
    # last block was clamped back by `overlap` rows: its first `overlap`
    # entries duplicate the previous block's tail — drop them (static trim)
    overlap = num_blocks * block_rows - n_pad
    head = assign[:-1].reshape(-1)
    return jnp.concatenate([head, assign[-1, overlap:]])


@functools.partial(jax.jit, static_argnames=("metric", "block_rows"))
def _lloyd_step(db, count, centroids, metric: str, block_rows: int,
                db_scales=None):
    """One Lloyd iteration: returns (new_centroids, counts, mean_key)."""
    n_pad = db.shape[0]
    d = db.shape[1] * 2 if db.dtype == jnp.uint8 else db.shape[1]
    c = centroids.shape[0]
    c_sq = jnp.sum(centroids.astype(jnp.float32) ** 2, -1)
    cents = centroids.astype(_compute_dtype(db.dtype))
    num_blocks, block_rows = _block_layout(n_pad, block_rows)

    def body(carry, idx):
        sums, counts, key_acc = carry
        logical = idx * block_rows
        start = jnp.minimum(logical, n_pad - block_rows)
        raw = jax.lax.dynamic_slice_in_dim(db, start, block_rows, axis=0)
        scl = (jax.lax.dynamic_slice_in_dim(db_scales, start, block_rows)
               if db_scales is not None else None)
        block = _widen_block(raw, scl)
        s = _scores(block, cents, metric, c_sq)             # (B, C)
        row = start + jax.lax.broadcasted_iota(
            jnp.int32, (block_rows, 1), 0)
        # mask padding AND rows re-read in the clamped last block's overlap
        live = (row < count) & (row >= logical)
        best = jnp.argmax(s, axis=-1)                        # (B,)
        key = jnp.max(s, axis=-1, keepdims=True)
        onehot = jax.nn.one_hot(best, c, dtype=jnp.float32) * live
        sums = sums + jnp.matmul(block.astype(jnp.float32).T, onehot,
                                 preferred_element_type=jnp.float32)
        counts = counts + jnp.sum(onehot, axis=0)
        key_acc = key_acc + jnp.sum(jnp.where(live, key, 0.0))
        return (sums, counts, key_acc), None

    init = (jnp.zeros((d, c), jnp.float32), jnp.zeros((c,), jnp.float32),
            jnp.float32(0))
    (sums, counts, key_acc), _ = jax.lax.scan(
        body, init, jnp.arange(num_blocks))
    new = (sums / jnp.maximum(counts[None, :], 1.0)).T       # (C, d)
    # empty clusters keep their old centroid (re-seeding handled outside)
    new = jnp.where(counts[:, None] > 0, new, centroids.astype(jnp.float32))
    if metric == "cosine":
        norm = jnp.linalg.norm(new, axis=-1, keepdims=True)
        new = new / jnp.maximum(norm, 1e-8)
    mean_key = key_acc / jnp.maximum(count.astype(jnp.float32), 1.0)
    return new, counts, mean_key


def train_kmeans(db, count, n_clusters: int, metric: str = "cosine",
                 iters: int = 10, block_rows: int = 65536, seed: int = 0,
                 db_scales=None):
    """Train the coarse quantizer on the store's prepared device matrix.

    db: (N_pad, d_pad) prepared rows (cosine: normalized), padding zeroed;
    int8 rows (fixed x127 scale) and uint8-packed int4 rows (+ db_scales)
    train directly — blocks widen/dequantize on the fly.
    Returns (centroids (C, d_pad) f32, counts (C,) f32 from the last
    iteration).
    """
    count = jnp.asarray(count, jnp.int32)
    # deterministic strided init over live rows: cheap, reproducible, and
    # spread across the (arbitrary) insert order
    idx = (jnp.arange(n_clusters, dtype=jnp.int32)
           * jnp.maximum(count // n_clusters, 1)) % jnp.maximum(count, 1)
    centroids = _seed_rows(db, idx, db_scales)
    counts = None
    key = jax.random.PRNGKey(seed)
    for i in range(iters):
        centroids, counts, mean_key = _lloyd_step(
            db, count, centroids, metric, block_rows, db_scales=db_scales)
        # re-seed empty clusters from random live rows so the bucket layout
        # never carries dead buckets
        if i < iters - 1:
            key, sub = jax.random.split(key)
            rand_rows = jax.random.randint(
                sub, (n_clusters,), 0, jnp.maximum(count, 1))
            reseed = _seed_rows(db, rand_rows, db_scales)
            centroids = jnp.where((counts > 0)[:, None], centroids, reseed)
    return centroids, counts
