"""Partial top-k primitives.

The reference used a full ``mx.argsort(-scores)[:k]`` (mlx_optimized.py:90-108,
optimized_vector_store.py:176-184) — O(N log N). Here top-k is partial
(`lax.top_k`, O(N log k) on TPU) and composable: blockwise winners merge via
concatenate + top_k, which is also the cross-chip merge step on a mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


@functools.partial(jax.jit, static_argnames=("k", "largest"))
def top_k(scores: jnp.ndarray, k: int, largest: bool = True):
    """Top-k along the last axis. Returns (values, indices).

    ``largest=False`` gives bottom-k (used for raw-distance ordering).
    """
    n = scores.shape[-1]
    k = min(k, n)
    if largest:
        return jax.lax.top_k(scores, k)
    vals, idx = jax.lax.top_k(-scores, k)
    return -vals, idx


def merge_topk(values_a, indices_a, values_b, indices_b, k: int):
    """Merge two top-k candidate sets (last axis) into one top-k.

    Inputs are (..., ka) and (..., kb); output (..., k). This is the single
    merge primitive reused by the blockwise scan and by the cross-shard merge
    on a device mesh (local top-k -> all_gather -> merge).
    """
    vals = jnp.concatenate([values_a, values_b], axis=-1)
    idx = jnp.concatenate([indices_a, indices_b], axis=-1)
    top_vals, sel = jax.lax.top_k(vals, min(k, vals.shape[-1]))
    top_idx = jnp.take_along_axis(idx, sel, axis=-1)
    return top_vals, top_idx


def topk_with_mask(scores: jnp.ndarray, mask: jnp.ndarray | None, k: int):
    """Top-k with an optional validity mask (invalid rows score -inf).

    Masks implement both count-vs-capacity padding and metadata filters while
    keeping all shapes static for XLA.
    """
    if mask is not None:
        scores = jnp.where(mask, scores, NEG_INF)
    return top_k(scores, k)
