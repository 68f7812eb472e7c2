"""Distance / similarity scoring kernels (XLA, MXU-friendly).

Capability parity with the reference kernels in
``performance/mlx_optimized.py:26-156`` (cosine single/batch, euclidean, dot,
normalize) — redesigned for TPU:

* every scoring path is a single large matmul so XLA tiles it onto the MXU
  (euclidean uses the ||q||^2 - 2 q.x + ||x||^2 expansion instead of the
  reference's broadcast-subtract-square, which would be VPU/HBM bound);
* all shapes are padded to lane multiples (last dim 128) once at store build
  time, never per query;
* matmuls accumulate in float32 via ``preferred_element_type`` regardless of
  storage dtype (bf16 storage is the fast path on TPU).

Score conventions are canonical across the whole framework (the reference had
two coexisting conventions, see SURVEY.md §2.C):

  metric      raw score s          similarity          distance
  cosine      cos(q, x)            s                   1 - s
  dot         <q, x>               s                   -s
  euclidean   ||q - x||_2          1 / (1 + s)         s

Internally search always maximizes a key: cosine/dot use s, euclidean uses
-||q-x||^2 (sqrt deferred to the final k results).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

EPS = 1e-8
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pad_dim(x: jnp.ndarray, multiple: int = LANE) -> jnp.ndarray:
    """Zero-pad the last (feature) dim to a lane multiple.

    Zero columns are exact no-ops for cosine/dot/L2 scoring, so padding once
    at ingest keeps every later matmul MXU-aligned.
    """
    d = x.shape[-1]
    d_pad = _round_up(d, multiple)
    if d_pad == d:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, d_pad - d)]
    return jnp.pad(x, pad)


def pad_rows(x: jnp.ndarray, multiple: int) -> jnp.ndarray:
    """Zero-pad the row (database) dim to a block multiple."""
    n = x.shape[0]
    n_pad = _round_up(n, multiple)
    if n_pad == n:
        return x
    pad = [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("eps",))
def l2_normalize(x: jnp.ndarray, eps: float = EPS) -> jnp.ndarray:
    """Row-wise L2 normalization with an eps clamp (ref mlx_optimized.py:110-125)."""
    norm = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True)
    return (x.astype(jnp.float32) / jnp.maximum(norm, eps)).astype(x.dtype)


def cosine_scores(queries: jnp.ndarray, db: jnp.ndarray,
                  db_normalized: bool = False) -> jnp.ndarray:
    """(Q,d) x (N,d) -> (Q,N) cosine similarity (ref mlx_optimized.py:26-88).

    When the store pre-normalizes rows at add time (the fast path),
    ``db_normalized=True`` turns this into a pure matmul.
    """
    q = l2_normalize(queries)
    d = db if db_normalized else l2_normalize(db)
    return jnp.matmul(q, d.T, preferred_element_type=jnp.float32)


def dot_scores(queries: jnp.ndarray, db: jnp.ndarray) -> jnp.ndarray:
    """(Q,d) x (N,d) -> (Q,N) inner products (ref mlx_optimized.py:150-156)."""
    return jnp.matmul(queries, db.T, preferred_element_type=jnp.float32)


def squared_l2_distances(queries: jnp.ndarray, db: jnp.ndarray,
                         db_sqnorms: jnp.ndarray | None = None) -> jnp.ndarray:
    """(Q,d) x (N,d) -> (Q,N) squared L2, via the matmul expansion.

    ||q - x||^2 = ||q||^2 - 2<q,x> + ||x||^2. The ||x||^2 term is O(N) and the
    store caches it; the cross term is the one MXU matmul.
    """
    qf = queries.astype(jnp.float32)
    q_sq = jnp.sum(qf * qf, axis=-1, keepdims=True)  # (Q,1)
    if db_sqnorms is None:
        dbf = db.astype(jnp.float32)
        db_sqnorms = jnp.sum(dbf * dbf, axis=-1)  # (N,)
    cross = jnp.matmul(queries, db.T, preferred_element_type=jnp.float32)
    return jnp.maximum(q_sq - 2.0 * cross + db_sqnorms[None, :], 0.0)


def euclidean_distances(queries: jnp.ndarray, db: jnp.ndarray,
                        db_sqnorms: jnp.ndarray | None = None) -> jnp.ndarray:
    """(Q,d) x (N,d) -> (Q,N) L2 distances (ref mlx_optimized.py:139-148)."""
    return jnp.sqrt(squared_l2_distances(queries, db, db_sqnorms))


def score_matrix(queries: jnp.ndarray, db: jnp.ndarray, metric: str,
                 db_normalized: bool = False,
                 db_sqnorms: jnp.ndarray | None = None) -> jnp.ndarray:
    """(Q,N) maximize-key score matrix for any metric.

    cosine/dot: the raw score. euclidean: NEGATED squared distance, so that
    top-k under "largest" semantics is correct for every metric.
    """
    if metric == "cosine":
        return cosine_scores(queries, db, db_normalized=db_normalized)
    if metric == "dot_product" or metric == "dot":
        return dot_scores(queries, db)
    if metric == "euclidean" or metric == "l2":
        return -squared_l2_distances(queries, db, db_sqnorms)
    raise ValueError(f"unknown metric: {metric!r}")


def key_to_raw_score(key: jnp.ndarray, metric: str) -> jnp.ndarray:
    """Convert the internal maximize-key back to the canonical raw score."""
    if metric in ("euclidean", "l2"):
        return jnp.sqrt(jnp.maximum(-key, 0.0))
    return key


def raw_score_to_similarity_distance(score, metric: str):
    """Canonical (similarity, distance) pair from a raw score.

    ONE convention for every path (the reference mixed two: see
    api/routes/vectors.py:236-258 vs :303-308 in the reference tree).
    """
    if metric == "cosine":
        return score, 1.0 - score
    if metric in ("dot_product", "dot"):
        return score, -score
    if metric in ("euclidean", "l2"):
        return 1.0 / (1.0 + score), score
    raise ValueError(f"unknown metric: {metric!r}")
