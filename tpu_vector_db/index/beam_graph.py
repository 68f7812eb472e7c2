"""BeamGraphIndex — HNSW-class ANN as TPU batched beam search.

Same contract as the reference's hnswlib wrapper (performance/hnsw_index.py:
M / ef_construction / ef_search knobs, build/search/save/load, metric-aware)
but a TPU-native algorithm:

SEARCH (jitted, fully batched): a flat navigable graph lives in a dense
(N, R) int32 neighbor table. Each iteration expands the best `beam_width`
unexpanded beam entries at once: one gather pulls their neighbor rows, one
gather + einsum scores all candidates against all queries on the MXU, a
broadcast-compare dedups candidates against the beam (replacing hnswlib's
per-query visited set — a revisit can only waste a slot, never corrupt the
result), and a top-k merge keeps the best `ef`. Everything is static-shaped;
the whole batch of queries advances in lockstep.

BUILD (batched insertion, Vamana-flavored): nodes insert in batches; each
batch beam-searches the current graph for its ef_construction nearest, then
an ON-DEVICE alpha-pruning pass (greedy diversity rule over the candidates'
pairwise distances, lax.scan) picks up to R diverse neighbors. Reverse edges
go through a host-side edge table that tracks per-edge keys (worst-edge
replacement), mirrored to the device incrementally — no full rebuild on add,
fixing the reference's rebuild-every-add flaw
(service/optimized_vector_store.py:110-113).
"""

from __future__ import annotations

import functools
import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_vector_db.utils.fs import atomic_save_npz

logger = logging.getLogger(__name__)

NEG_INF = float("-inf")
GRAPH_FILE = "ann_graph.npz"


# ----------------------------------------------------------------- scoring

def _score_ids(queries, db, ids, metric: str, sqnorms):
    """Keys (maximize convention) between each query and its candidate ids.

    queries: (Q, d) f32 — prepared (normalized for cosine, padded)
    db:      (N, d) storage dtype — prepared the same way
    ids:     (Q, C) int32, -1 = invalid (scored but masked by caller)
    """
    safe = jnp.maximum(ids, 0)
    rows = db[safe]  # (Q, C, d) gather
    cross = jnp.einsum("qd,qcd->qc", queries, rows,
                       preferred_element_type=jnp.float32)
    if metric == "euclidean":
        q_sq = jnp.sum(queries.astype(jnp.float32) ** 2, -1, keepdims=True)
        return -(q_sq - 2.0 * cross + sqnorms[safe])
    return cross


# ------------------------------------------------------------------ search

@functools.partial(
    jax.jit,
    static_argnames=("k", "ef", "beam_width", "iters", "metric"))
def beam_search(queries, db, graph, entries, count, k: int, ef: int,
                beam_width: int, iters: int, metric: str, sqnorms=None):
    """Batched best-first beam search. Returns (ids (Q,k), keys (Q,k));
    id -1 marks an empty slot (fewer than k reachable rows)."""
    q_n = queries.shape[0]
    r = graph.shape[1]
    c = beam_width * r
    row_idx = jnp.arange(q_n)[:, None]

    # ---- init beam from entry points
    init_ids = jnp.broadcast_to(entries[None, :], (q_n, entries.shape[0]))
    init_valid = (init_ids >= 0) & (init_ids < count)
    init_keys = _score_ids(queries, db, init_ids, metric, sqnorms)
    init_keys = jnp.where(init_valid, init_keys, NEG_INF)
    pad = max(ef - init_ids.shape[1], 0)
    beam_ids = jnp.concatenate(
        [init_ids, jnp.full((q_n, pad), -1, jnp.int32)], axis=1)
    beam_keys = jnp.concatenate(
        [init_keys, jnp.full((q_n, pad), NEG_INF)], axis=1)
    beam_keys, order = jax.lax.top_k(beam_keys, ef)
    beam_ids = jnp.take_along_axis(beam_ids, order, axis=1)
    expanded = beam_keys == NEG_INF  # invalid slots never expand

    tril = jnp.tril(jnp.ones((c, c), jnp.bool_), k=-1)

    def body(state, _):
        beam_ids, beam_keys, expanded = state
        sel_keys = jnp.where(expanded, NEG_INF, beam_keys)
        f_keys, f_pos = jax.lax.top_k(sel_keys, beam_width)   # (Q, BW)
        frontier = jnp.take_along_axis(beam_ids, f_pos, axis=1)
        f_valid = f_keys > NEG_INF
        expanded = expanded.at[row_idx, f_pos].max(f_valid)

        neigh = graph[jnp.maximum(frontier, 0)]               # (Q, BW, R)
        neigh = jnp.where(f_valid[:, :, None], neigh, -1)
        cand = neigh.reshape(q_n, c)
        valid = (cand >= 0) & (cand < count)
        keys = _score_ids(queries, db, cand, metric, sqnorms)
        # dedup: against current beam, and earlier duplicates in this batch
        dup_beam = (cand[:, :, None] == beam_ids[:, None, :]).any(-1)
        dup_self = ((cand[:, :, None] == cand[:, None, :]) & tril[None]).any(-1)
        keys = jnp.where(valid & ~dup_beam & ~dup_self, keys, NEG_INF)

        all_keys = jnp.concatenate([beam_keys, keys], axis=1)
        all_ids = jnp.concatenate([beam_ids, cand], axis=1)
        all_exp = jnp.concatenate([expanded, keys == NEG_INF], axis=1)
        beam_keys, pos = jax.lax.top_k(all_keys, ef)
        beam_ids = jnp.take_along_axis(all_ids, pos, axis=1)
        expanded = jnp.take_along_axis(all_exp, pos, axis=1)
        return (beam_ids, beam_keys, expanded), None

    (beam_ids, beam_keys, _), _ = jax.lax.scan(
        body, (beam_ids, beam_keys, expanded), None, length=iters)
    ids = jnp.where(beam_keys[:, :k] == NEG_INF, -1, beam_ids[:, :k])
    return ids, beam_keys[:, :k]


# ------------------------------------------------------------ alpha pruning

@functools.partial(jax.jit, static_argnames=("R", "metric", "alpha"))
def alpha_prune(queries, db, cand_ids, cand_keys, R: int, metric: str,
                sqnorms=None, alpha: float = 1.0):
    """Greedy diversity pruning (Vamana robust-prune) on device.

    Candidates arrive key-sorted (best first). Walking best-to-worst, keep a
    candidate unless some already-kept neighbor is closer to it than the base
    node is (scaled by alpha). Returns ((B, R) neighbor ids, (B, R) keys),
    -1/-inf padded.
    """
    b, efc = cand_ids.shape
    # greedy order matters: ensure best-first
    cand_keys, order = jax.lax.top_k(cand_keys, efc)
    cand_ids = jnp.take_along_axis(cand_ids, order, axis=1)
    safe = jnp.maximum(cand_ids, 0)
    rows = db[safe].astype(jnp.float32)                    # (B, efc, d)
    cross = jnp.einsum("bcd,bed->bce", rows, rows,
                       preferred_element_type=jnp.float32)
    if metric == "euclidean":
        sq = sqnorms[safe]                                  # (B, efc)
        pdist = sq[:, :, None] - 2.0 * cross + sq[:, None, :]
        base_dist = -cand_keys                              # key = -dist^2
    elif metric == "cosine":
        pdist = 1.0 - cross
        base_dist = 1.0 - cand_keys
    else:  # dot
        pdist = -cross
        base_dist = -cand_keys

    width = cand_ids.shape[1]
    valid = cand_ids >= 0
    col = jnp.arange(width)

    def make_body(a):
        def body(kept, i):
            # violation: some kept j has a * d(j, i) <= d(base, i)
            viol = (kept & (a * pdist[:, :, i] <= base_dist[:, i][:, None])
                    ).any(axis=1)
            ok = valid[:, i] & ~viol & (jnp.sum(kept, axis=1) < R)
            kept = kept.at[:, i].max(ok)  # bool OR: stays kept once kept
            return kept, None
        return body

    # TWO-PHASE prune (Vamana/DiskANN): pass 1 at alpha=1 builds the sparse
    # RNG skeleton — on clustered data it covers away most same-cluster
    # candidates, leaving slots for cluster-bridging edges; pass 2 at
    # alpha>1 relaxes coverage to fill remaining slots with shortcuts.
    # Single-phase alpha>1 filled every slot with near neighbors and
    # disconnected clusters (measured recall 0.61 vs entry-coverage bound).
    kept, _ = jax.lax.scan(
        make_body(1.0), jnp.zeros((b, width), jnp.bool_), col)
    if alpha > 1.0:
        kept, _ = jax.lax.scan(make_body(alpha), kept, col)

    sort_key = jnp.where(kept, cand_keys, NEG_INF)
    top_keys, pos = jax.lax.top_k(sort_key, R)
    top_ids = jnp.take_along_axis(cand_ids, pos, axis=1)
    top_ids = jnp.where(top_keys == NEG_INF, -1, top_ids)
    return top_ids, top_keys


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_graph_rows(graph, rows, offset):
    return jax.lax.dynamic_update_slice(graph, rows, (offset, 0))


@functools.partial(jax.jit, donate_argnums=(0,))
def _scatter_graph_rows(graph, row_ids, rows):
    return graph.at[row_ids].set(rows)


# ------------------------------------------------------------------- index

class BeamGraphIndex:
    """Owns the GRAPH only; vector data stays in the store's device buffer
    (no duplicate (N, d) copy — the reference's hnswlib kept its own)."""

    def __init__(self, dim: int, metric: str = "cosine", M: int = 16,
                 ef_construction: int = 200, entry_count: int = 8,
                 alpha: float = 1.2, batch_size: int = 256,
                 seed: int = 0) -> None:
        self.dim = dim
        self.metric = metric
        self.M = int(M)
        self.R = 2 * int(M)          # max degree, hnswlib level-0 convention
        self.ef_construction = int(ef_construction)
        self.entry_count = int(entry_count)
        self.alpha = float(alpha)
        self.batch_size = int(batch_size)
        self._seed = seed

        self._n = 0                  # rows currently in the graph
        self._cap = 0
        self._graph: np.ndarray | None = None      # (cap, R) int32, host
        self._edge_keys: np.ndarray | None = None  # (cap, R) f32, host
        self._graph_dev: jnp.ndarray | None = None
        self._entries: np.ndarray | None = None
        self.build_time_s = 0.0

    # ------------------------------------------------------------- plumbing

    @property
    def built(self) -> bool:
        return self._n > 0

    @property
    def size(self) -> int:
        return self._n

    def _ensure_cap(self, n: int) -> None:
        if self._graph is not None and self._cap >= n:
            return
        cap = max(1024, self._cap or 1024)
        while cap < n:
            cap *= 2
        graph = np.full((cap, self.R), -1, np.int32)
        keys = np.full((cap, self.R), NEG_INF, np.float32)
        if self._graph is not None:
            graph[: self._n] = self._graph[: self._n]
            keys[: self._n] = self._edge_keys[: self._n]
        self._graph, self._edge_keys, self._cap = graph, keys, cap
        self._graph_dev = jnp.asarray(graph)

    def _entry_target(self) -> int:
        """Entry-point count scales with N (power-of-two bucketed so the
        search jit only recompiles on doublings). A large, spread entry set
        is this index's coarse routing level — the role HNSW's upper layers
        play. With few fixed entries, well-separated clusters in high
        dimension become unreachable islands (measured: recall@10 collapsed
        to 0.22 on 300K x 768D clustered data with 8 entries)."""
        target = max(self.entry_count, min(1024, self._n // 64))
        bucket = self.entry_count
        while bucket * 2 <= target:
            bucket *= 2
        return bucket

    def _refresh_entries(self) -> None:
        n = max(self._n, 1)
        count = min(self._entry_target(), n)
        self._entries = np.unique(
            np.linspace(0, n - 1, count).astype(np.int32))

    def _sync_dev_rows(self, row_ids: np.ndarray) -> None:
        """Mirror updated host rows to the device graph."""
        if len(row_ids) == 0:
            return
        rows = jnp.asarray(self._graph[row_ids])
        self._graph_dev = _scatter_graph_rows(
            self._graph_dev, jnp.asarray(row_ids), rows)

    # ----------------------------------------------------------------- build

    def build(self, db, count: int, sqnorms=None,
              refine_passes: int = 1) -> dict:
        """Full (re)build from the store's prepared device matrix."""
        t0 = time.perf_counter()
        self._n = 0
        self._graph = None
        self._cap = 0
        self._ensure_cap(count)
        self._insert_range(db, 0, count, sqnorms)
        if refine_passes:
            self.refine(db, sqnorms=sqnorms, passes=refine_passes)
        self.build_time_s = time.perf_counter() - t0
        logger.info("beam graph built: %d nodes in %.1fs (M=%d efc=%d)",
                    count, self.build_time_s, self.M, self.ef_construction)
        return {"nodes": count, "build_time_s": self.build_time_s}

    def build_cpu(self, host_vectors: np.ndarray, count: int) -> dict:
        """Full build on the host via the native C++ builder
        (native/graph_builder.cpp) — same graph format and pruning rule as
        the on-device build, no TPU program compilation on the build path.
        host_vectors: RAW (count, d) float32; prepared here."""
        from tpu_vector_db.index import native
        t0 = time.perf_counter()
        prepared = np.ascontiguousarray(host_vectors[:count], np.float32)
        if self.metric == "cosine":
            norms = np.linalg.norm(prepared, axis=1, keepdims=True)
            prepared = prepared / np.maximum(norms, 1e-8)
        graph, keys, entries = native.build_graph(
            prepared, self.metric, self.R, self.ef_construction, self.alpha,
            entry_count=self.entry_count)
        self.install_graph(graph, keys, entries)
        self.build_time_s = time.perf_counter() - t0
        logger.info("native graph build: %d nodes in %.1fs", count,
                    self.build_time_s)
        return {"nodes": count, "build_time_s": self.build_time_s,
                "backend": "cpu-native"}

    def install_graph(self, graph: np.ndarray, edge_keys: np.ndarray,
                      entries: np.ndarray | None = None) -> None:
        n = graph.shape[0]
        if graph.shape[1] != self.R:
            raise ValueError(f"graph degree {graph.shape[1]} != R {self.R}")
        self._n = 0
        self._graph = None
        self._cap = 0
        self._ensure_cap(n)
        self._graph[:n] = graph
        self._edge_keys[:n] = edge_keys
        self._n = n
        # always size the routing set by _entry_target (a too-small entry
        # set fragments recall on clustered data); provided entries are only
        # kept when larger
        if entries is not None and len(entries) >= self._entry_target():
            self._entries = entries.astype(np.int32)
        else:
            self._refresh_entries()
        self._graph_dev = jnp.asarray(self._graph)

    def add(self, db, old_count: int, new_count: int, sqnorms=None) -> dict:
        """Incremental insertion of rows [old_count, new_count)."""
        t0 = time.perf_counter()
        self._ensure_cap(new_count)
        self._insert_range(db, old_count, new_count, sqnorms)
        dt = time.perf_counter() - t0
        self.build_time_s += dt
        return {"nodes": new_count - old_count, "build_time_s": dt}

    def _insert_range(self, db, start: int, end: int, sqnorms) -> None:
        if start != self._n:
            raise ValueError(
                f"insert must continue from {self._n}, got {start}")
        if start == 0:
            boot = min(end, self.R + 1)
            ids = np.arange(boot)
            for i in range(boot):
                others = ids[ids != i][: self.R]
                self._graph[i, : len(others)] = others
                # bootstrap edges are arbitrary: key -inf makes them the
                # first to be replaced by real reverse edges
                self._edge_keys[i, : len(others)] = NEG_INF
            self._n = boot
            self._sync_dev_rows(ids)
            self._refresh_entries()
            start = boot

        while start < end:
            # batch ramps with graph size (inserting 512 nodes against a
            # 17-node graph would give them all bootstrap-only neighbors);
            # power-of-two steps bound the number of jit variants
            step = 32
            while step * 2 <= min(self.batch_size, self._n):
                step *= 2
            bend = min(start + step, end)
            batch_ids = np.arange(start, bend, dtype=np.int32)
            self._insert_batch(db, batch_ids, sqnorms, exclude_self=False)
            self._n = bend
            self._refresh_entries()  # routing set must track graph growth
            start = bend

    def _insert_batch(self, db, batch_ids: np.ndarray, sqnorms,
                      exclude_self: bool) -> None:
        """Search + alpha-prune + write rows + reverse edges for one batch."""
        efc = self.ef_construction
        ids_dev = jnp.asarray(batch_ids)
        queries = db[ids_dev].astype(jnp.float32)
        iters = max(efc // 4, 6)
        cand_ids, cand_keys = beam_search(
            queries, db, self._graph_dev,
            jnp.asarray(self._entries), np.int32(self._n),
            k=efc, ef=efc, beam_width=4, iters=iters,
            metric=self.metric, sqnorms=sqnorms)
        if exclude_self:  # refine pass: a node must not choose itself
            self_mask = cand_ids == ids_dev[:, None]
            cand_keys = jnp.where(self_mask, NEG_INF, cand_keys)
            cand_ids = jnp.where(self_mask, -1, cand_ids)
            # union with the node's EXISTING edges: reverse edges carry the
            # long-range links that keep distant clusters reachable; a
            # search-only candidate set would overwrite them with nearest
            # neighbors and disconnect the graph (measured: refine without
            # this dropped clustered recall 0.90 -> 0.61)
            cur_ids = jnp.asarray(self._graph[batch_ids])       # (B, R)
            cur_keys = jnp.asarray(self._edge_keys[batch_ids])
            dup = (cur_ids[:, :, None] == cand_ids[:, None, :]).any(-1)
            cur_keys = jnp.where(dup | (cur_ids < 0), NEG_INF, cur_keys)
            cur_ids = jnp.where(dup, -1, cur_ids)
            cand_ids = jnp.concatenate([cand_ids, cur_ids], axis=1)
            cand_keys = jnp.concatenate([cand_keys, cur_keys], axis=1)
        n_ids, n_keys = alpha_prune(
            queries, db, cand_ids, cand_keys, self.R,
            self.metric, sqnorms=sqnorms, alpha=self.alpha)
        n_ids = np.asarray(n_ids)
        n_keys = np.asarray(n_keys)

        self._graph[batch_ids] = n_ids
        self._edge_keys[batch_ids] = n_keys
        if (np.diff(batch_ids) == 1).all():
            self._graph_dev = _write_graph_rows(
                self._graph_dev, jnp.asarray(n_ids), int(batch_ids[0]))
        else:
            self._graph_dev = _scatter_graph_rows(
                self._graph_dev, ids_dev, jnp.asarray(n_ids))
        touched = self._reverse_edges(db, batch_ids, n_ids, n_keys, sqnorms)
        self._sync_dev_rows(touched)

    def refine(self, db, sqnorms=None, passes: int = 1) -> None:
        """Vamana-style improvement passes: every node re-searches the FULL
        graph and re-prunes its neighborhood. One pass typically lifts
        recall several points over pure incremental insertion."""
        for _ in range(passes):
            for start in range(0, self._n, self.batch_size):
                ids = np.arange(start, min(start + self.batch_size, self._n),
                                dtype=np.int32)
                self._insert_batch(db, ids, sqnorms, exclude_self=True)

    # extra backlink slots considered per row per batch before re-pruning
    _REVERSE_EXTRA = 16

    def _reverse_edges(self, db, batch_ids, n_ids, n_keys,
                       sqnorms) -> np.ndarray:
        """u->v edges induce v->u backlinks; every touched row is RE-PRUNED
        on device with the same alpha-diversity rule as forward edges
        (HNSW's neighbor heuristic applied to backlinks — plain worst-edge
        replacement measurably hurts recall). The candidate keys from the
        search double as backlink keys (symmetric metrics), so no new
        distance computations happen on the host."""
        m = self.M
        us = np.repeat(batch_ids, m)
        vs = n_ids[:, :m].ravel()
        ks = n_keys[:, :m].ravel()
        keep = vs >= 0
        us, vs, ks = us[keep], vs[keep], ks[keep].astype(np.float32)
        if len(vs) == 0:
            return np.empty((0,), np.int64)

        order = np.argsort(vs, kind="stable")
        us, vs, ks = us[order], vs[order], ks[order]
        unique_vs, starts = np.unique(vs, return_index=True)
        ends = np.append(starts[1:], len(vs))

        width = self.R + self._REVERSE_EXTRA
        n_rows = len(unique_vs)
        # pad the row count to a power of two: unique_vs length is
        # data-dependent and every distinct shape would recompile the prune
        padded = 32
        while padded < n_rows:
            padded *= 2
        cand_ids = np.full((padded, width), -1, np.int32)
        cand_keys = np.full((padded, width), NEG_INF, np.float32)
        cand_ids[:n_rows, : self.R] = self._graph[unique_vs]
        cand_keys[:n_rows, : self.R] = self._edge_keys[unique_vs]
        for i, (s, e) in enumerate(zip(starts, ends)):
            extra = min(e - s, self._REVERSE_EXTRA)
            cand_ids[i, self.R: self.R + extra] = us[s: s + extra]
            cand_keys[i, self.R: self.R + extra] = ks[s: s + extra]

        vs_padded = np.zeros((padded,), np.int32)
        vs_padded[:n_rows] = unique_vs
        new_ids, new_keys = alpha_prune(
            db[jnp.asarray(vs_padded)].astype(jnp.float32), db,
            jnp.asarray(cand_ids), jnp.asarray(cand_keys),
            self.R, self.metric, sqnorms=sqnorms, alpha=self.alpha)
        self._graph[unique_vs] = np.asarray(new_ids)[:n_rows]
        self._edge_keys[unique_vs] = np.asarray(new_keys)[:n_rows]
        return unique_vs.astype(np.int64)

    # ---------------------------------------------------------------- search

    def search(self, queries, db, count: int, k: int,
               ef_search: int = 100, sqnorms=None):
        """(Q, k) global ids + keys. queries must be PREPARED like db rows
        (store normalizes/pads). -1 ids mark unreachable slots."""
        if not self.built:
            raise RuntimeError("index not built")
        ef = max(ef_search, k)
        # 2*ef expansions: past that, recall saturates at fixed pool size
        # (measured 0.899 -> 0.914 @ ef=100 on 20K x 64D; flat beyond).
        # beam_width=8 halves the sequential iteration count at equal
        # recall (300K x 768D: 19.4 -> 15.1 ms/batch, same 0.897/0.992)
        bw = 8
        iters = max(ef // bw * 2, 8)
        ids, keys = beam_search(
            jnp.asarray(queries, jnp.float32), db, self._graph_dev,
            jnp.asarray(self._entries), np.int32(min(self._n, count)),
            k=k, ef=ef, beam_width=bw, iters=iters,
            metric=self.metric, sqnorms=sqnorms)
        return np.asarray(ids), np.asarray(keys)

    # ----------------------------------------------------------- persistence

    def save(self, directory: str | Path) -> None:
        if self._graph is None:
            return
        atomic_save_npz(
            Path(directory) / GRAPH_FILE,
            graph=self._graph[: self._n],
            edge_keys=self._edge_keys[: self._n],
            entries=self._entries,
            meta=np.array([self._n, self.M, self.ef_construction,
                           self.dim], np.int64))

    def load(self, directory: str | Path) -> bool:
        path = Path(directory) / GRAPH_FILE
        if not path.exists():
            return False
        try:
            with np.load(path) as z:
                graph = z["graph"]
                keys = z["edge_keys"]
                entries = z["entries"]
                n, m, efc, dim = z["meta"]
            if dim != self.dim or graph.shape[1] != 2 * m:
                raise ValueError("graph metadata mismatch")
            self.M = int(m)
            self.R = 2 * self.M
            self.ef_construction = int(efc)
            self._n = 0
            self._graph = None
            self._cap = 0
            self._ensure_cap(int(n))
            self._graph[: n] = graph
            self._edge_keys[: n] = keys
            self._n = int(n)
            self._entries = entries.astype(np.int32)
            self._graph_dev = jnp.asarray(self._graph)
            return True
        except Exception:  # noqa: BLE001 — corrupt graph -> rebuild
            logger.exception("corrupt ANN graph at %s; will rebuild", path)
            return False

    def get_stats(self) -> dict:
        degrees = None
        if self._graph is not None and self._n:
            degrees = (self._graph[: self._n] >= 0).sum(axis=1)
        return {
            "type": "beam_graph",
            "nodes": self._n,
            "M": self.M,
            "R": self.R,
            "ef_construction": self.ef_construction,
            "alpha": self.alpha,
            "avg_degree": float(degrees.mean()) if degrees is not None else 0,
            "build_time_s": round(self.build_time_s, 3),
            "memory_mb": round((self._cap * self.R * 8) / 2**20, 2),
        }
