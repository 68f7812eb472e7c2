"""int4 vector packing for the capacity-mode flat scan.

Doubles int8 capacity mode's rows-per-chip (the reference tops out at 1M
rows on 32-64 GB unified memory, README.md:63-68; int8 already serves 16M
x 768D on one 16 GB chip): each component quantizes to an offset-8 nibble
with ONE f32 scale per row, packed two-components-per-byte.

Layout contract (shared with ops/pallas_scan._cross_block): packed column
j holds component j in its LOW nibble and component j + d/2 in its HIGH
nibble. Unpacking is then two nibble ops + a lane-dim concatenate in
natural column order — an interleaved pairwise layout would need a
lane-splitting reshape Mosaic rejects.

Score semantics: the scan returns the TRUE cosine/L2 key of the
dequantized rows — scales are chosen so the dequantized row is
unit-norm for cosine (the row's quantization error moves the point on
the sphere instead of biasing its norm). Quantization noise on cosine
scores is ~0.005 at 768D (per-component step ~= max|x|/7); callers that
need exact ranking should oversample (k x 4) and re-rank, the same
regime as bf16 tie-ambiguity (CLAUDE.md r2 lessons).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("normalize",))
def pack_int4(x: jnp.ndarray, normalize: bool = True):
    """(n, d) f32 rows -> ((n, d//2) uint8 packed, (n,) f32 scales).

    d must be even. normalize=True rescales so the DEQUANTIZED row is
    exactly unit-norm (cosine stores); normalize=False keeps plain
    symmetric max-abs scaling (euclidean stores — pair with sqnorms of
    the dequantized rows from `dequant_sqnorms`)."""
    n, d = x.shape
    assert d % 2 == 0, d
    x = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(x), axis=1), 1e-12) / 7.0  # (n,)
    q = jnp.clip(jnp.round(x / scale[:, None]), -8, 7)
    if normalize:
        # fold the dequantized norm into the scale: scores come out as the
        # true cosine of the stored (on-sphere) point
        norm = jnp.sqrt(jnp.sum(q * q, axis=1)) * scale
        scale = scale / jnp.maximum(norm, 1e-12)
    u = (q + 8.0).astype(jnp.uint8)
    lo = u[:, : d // 2]
    hi = u[:, d // 2:]
    return (lo | (hi << jnp.uint8(4))), scale.astype(jnp.float32)


def quantize_unit_rows(x: jnp.ndarray, storage_dtype: str):
    """THE store quantizer for unit-norm cosine rows, shared by the store
    (vector_store._prepare_block) and the sharded IVF's training path
    (parallel/sharded_ivf.ShardedIVF._quantize) so the rows an index
    trains on can never drift from the rows the store serves.

    'int8': fixed x127 scale (no per-row scale stream; callers divide
    keys back by 127) -> ((n, d) int8, None). 'int4': pack_int4 with
    unit-norm-preserving per-row scales -> ((n, d//2) uint8, (n,) f32).
    """
    if storage_dtype == "int8":
        return (jnp.clip(jnp.round(x * 127.0), -127, 127).astype(jnp.int8),
                None)
    if storage_dtype == "int4":
        return pack_int4(x)
    raise ValueError(f"not a quantized storage dtype: {storage_dtype!r}")


@jax.jit
def unpack_int4(packed: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """((n, d//2) uint8, (n,) f32) -> (n, d) f32 dequantized rows."""
    lo = (packed & jnp.uint8(15)).astype(jnp.float32) - 8.0
    hi = (packed >> jnp.uint8(4)).astype(jnp.float32) - 8.0
    return jnp.concatenate([lo, hi], axis=1) * scales[:, None]


@jax.jit
def dequant_sqnorms(packed: jnp.ndarray, scales: jnp.ndarray) -> jnp.ndarray:
    """Squared L2 norms of the dequantized rows (euclidean scan input)."""
    lo = (packed & jnp.uint8(15)).astype(jnp.float32) - 8.0
    hi = (packed >> jnp.uint8(4)).astype(jnp.float32) - 8.0
    return (jnp.sum(lo * lo, axis=1) + jnp.sum(hi * hi, axis=1)) \
        * scales * scales
