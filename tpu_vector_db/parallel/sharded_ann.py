"""Sharded ANN: independent per-shard beam-graph subgraphs + ICI merge.

A capability beyond both the reference (single device, SURVEY.md §2.2) and
classical HNSW deployments: each mesh shard owns an independent beam-graph
over its local rows; a query runs the SAME batched beam search on every
shard in parallel under shard_map (all gathers stay shard-local), and the
per-shard top-k merge with one k·P all-gather — identical communication
pattern to the sharded flat scan. Union-of-local-top-k equals global top-k
whenever each local search recalls its shard's true local winners, so
global recall matches single-shard recall on the same data.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_vector_db.index.beam_graph import BeamGraphIndex, beam_search
from tpu_vector_db.parallel.mesh import SHARD_AXIS

logger = logging.getLogger(__name__)


class ShardedBeamGraph:
    """P independent subgraphs over contiguous row ranges of a sharded
    store. Built host-side with the native C++ builder (one subgraph per
    shard); searched on the mesh."""

    def __init__(self, dim: int, metric: str, mesh: Mesh, M: int = 16,
                 ef_construction: int = 200, alpha: float = 1.2,
                 axis_name: str = SHARD_AXIS) -> None:
        self.dim = dim
        self.metric = metric
        self.mesh = mesh
        self.axis_name = axis_name
        self.n_dev = mesh.devices.size
        self.M = int(M)
        self.R = 2 * int(M)
        self.ef_construction = int(ef_construction)
        self.alpha = float(alpha)
        self._graph_dev = None       # (cap, R) int32, row-sharded
        self._entries_dev = None     # (P, E) int32, sharded on axis 0
        self._scatter_jit = None     # memoized (fresh jit per call would
        #                              recompile on every add)
        self._graphs_host = None     # (cap, R) int32 — incremental state
        self._keys_host = None       # (cap, R) f32
        self._entry_lists: list[np.ndarray] = []
        self._rows_per_shard = 0
        self._count = 0
        self.build_time_s = 0.0

    @property
    def built(self) -> bool:
        return self._graph_dev is not None

    @property
    def size(self) -> int:
        return self._count

    def _prepare(self, host_vectors: np.ndarray) -> np.ndarray:
        prepared = np.ascontiguousarray(host_vectors, np.float32)
        if self.metric == "cosine":
            norms = np.linalg.norm(prepared, axis=1, keepdims=True)
            prepared = prepared / np.maximum(norms, 1e-8)
        return prepared

    def _entry_target(self, local_n: int) -> int:
        """Mirror BeamGraphIndex._entry_target's scaling: the 4096 cap
        past 512K rows is a measured >0.13-recall lever at 1M tight
        clusters, and add() regenerates a shard's entry list with THIS
        function — a lower cap here silently shrank a big shard's routing
        set on the first incremental add (review finding)."""
        cap = 1024 if local_n < (1 << 19) else 4096
        return int(min(cap, max(8, local_n // 64)))

    def _place_entries(self) -> None:
        e_max = 1
        while e_max < max((len(e) for e in self._entry_lists), default=1):
            e_max *= 2
        entries = np.full((self.n_dev, e_max), -1, np.int32)
        for s, e in enumerate(self._entry_lists):
            entries[s, : len(e)] = e
        self._entries_dev = jax.device_put(
            jnp.asarray(entries),
            NamedSharding(self.mesh, P(self.axis_name, None)))

    def build(self, host_vectors: np.ndarray, count: int,
              capacity: int) -> dict:
        """host_vectors: RAW (count, d) f32. capacity: the sharded store's
        device capacity (multiple of n_dev)."""
        import time
        t0 = time.perf_counter()
        assert capacity % self.n_dev == 0
        rows = capacity // self.n_dev
        graphs = np.full((capacity, self.R), -1, np.int32)
        keys = np.full((capacity, self.R), -np.inf, np.float32)
        entry_lists: list[np.ndarray] = []
        sub = BeamGraphIndex(dim=self.dim, metric=self.metric, M=self.M,
                             ef_construction=self.ef_construction,
                             alpha=self.alpha)
        for s in range(self.n_dev):
            lo = s * rows
            hi = min(count, lo + rows)
            local_n = max(hi - lo, 0)
            if local_n > 0:
                sub.build_cpu(host_vectors[lo:hi], local_n)
                graphs[lo: lo + local_n] = sub._graph[:local_n]
                keys[lo: lo + local_n] = sub._edge_keys[:local_n]
                entry_lists.append(sub._entries.copy())
            else:
                entry_lists.append(np.empty((0,), np.int32))

        # host state retained so appends EXTEND subgraphs (native
        # extend_graph) instead of rebuilding — round-1 finding #4
        self._graphs_host = graphs
        self._keys_host = keys
        self._entry_lists = entry_lists
        self._rows_per_shard = rows
        self._count = count
        self._graph_dev = jax.device_put(
            jnp.asarray(graphs),
            NamedSharding(self.mesh, P(self.axis_name, None)))
        self._place_entries()
        self.build_time_s = time.perf_counter() - t0
        return {"nodes": count, "shards": self.n_dev,
                "build_time_s": self.build_time_s}

    def add(self, host_vectors: np.ndarray, old_count: int,
            new_count: int) -> dict:
        """Insert rows [old_count, new_count) into their shards' existing
        subgraphs — O(batch * ef) per shard, no rebuild. Touched graph rows
        (new + re-pruned reverse edges) scatter to the device copy."""
        import time
        from tpu_vector_db.index import native
        t0 = time.perf_counter()
        if not self.built or old_count != self._count:
            raise ValueError(
                f"add must continue from {self._count}, got {old_count}")
        rows = self._rows_per_shard
        first = old_count // rows
        last = (new_count - 1) // rows
        touched_all: list[np.ndarray] = []
        for s in range(first, last + 1):
            lo = s * rows
            hi = min(new_count, lo + rows)
            local_old = max(old_count - lo, 0)
            local_n = hi - lo
            if local_n <= local_old:
                continue
            prepared = self._prepare(host_vectors[lo:hi])
            g, k, _ = native.extend_graph(
                prepared, local_old,
                self._graphs_host[lo: lo + local_old],
                self._keys_host[lo: lo + local_old],
                self.metric, self.R, self.ef_construction, self.alpha,
                entry_count=self._entry_target(local_n))
            old_g = self._graphs_host[lo: lo + local_n].copy()
            self._graphs_host[lo: lo + local_n] = g
            self._keys_host[lo: lo + local_n] = k
            changed = np.nonzero((g != old_g).any(axis=1))[0] + lo
            touched_all.append(changed.astype(np.int32))
            # entries are LOCAL row ids (the search fn offsets per shard)
            tgt = min(self._entry_target(local_n), local_n)
            self._entry_lists[s] = np.unique(
                np.linspace(0, local_n - 1, tgt).astype(np.int32))
        self._count = new_count
        if touched_all:
            ids = np.concatenate(touched_all)
            if self._scatter_jit is None:
                sharding = NamedSharding(self.mesh,
                                         P(self.axis_name, None))
                self._scatter_jit = jax.jit(
                    lambda g, i, r: g.at[i].set(r, out_sharding=sharding),
                    donate_argnums=(0,), out_shardings=sharding)
            self._graph_dev = self._scatter_jit(
                self._graph_dev, jnp.asarray(ids),
                jnp.asarray(self._graphs_host[ids]))
            self._place_entries()
        dt = time.perf_counter() - t0
        self.build_time_s += dt
        return {"nodes": new_count - old_count, "build_time_s": dt,
                "touched_rows": int(sum(len(t) for t in touched_all))}

    def make_search_fn(self, k: int, ef_search: int, with_sqnorms: bool):
        """(queries, db, count[, sqnorms]) -> replicated (keys, gids)."""
        ef = max(ef_search, k)
        # single-chip contract: ~2*ef expansions before recall saturates
        # (beam_graph.py search, measured 0.899 -> 0.914 at ef=100); the
        # former ef//8 gave per-shard searches HALF the single-chip
        # budget at equal knobs (review finding)
        iters = max(ef // 8 * 2, 8)
        axis = self.axis_name
        metric = self.metric

        def core(queries, db, count, graph, entries, sqnorms):
            rows_local = db.shape[0]
            shard_id = jax.lax.axis_index(axis)
            offset = shard_id * rows_local
            local_count = jnp.clip(count - offset, 0,
                                   rows_local).astype(jnp.int32)
            ids, keys = beam_search(
                queries, db, graph, entries.reshape(-1), local_count,
                k=k, ef=ef, beam_width=8, iters=iters, metric=metric,
                sqnorms=sqnorms)
            gids = jnp.where(ids >= 0, ids + offset, -1)
            all_keys = jax.lax.all_gather(keys, axis, axis=1, tiled=True)
            all_ids = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
            vals, sel = jax.lax.top_k(all_keys, k)
            return vals, jnp.take_along_axis(all_ids, sel, axis=-1)

        row = P(axis)
        if with_sqnorms:
            fn = core
            in_specs = (P(), P(axis, None), P(), P(axis, None),
                        P(axis, None), row)
        else:
            fn = lambda q, db, c, g, e: core(q, db, c, g, e, None)  # noqa: E731
            in_specs = (P(), P(axis, None), P(), P(axis, None),
                        P(axis, None))
        sharded = jax.shard_map(fn, mesh=self.mesh, in_specs=in_specs,
                                out_specs=(P(), P()), check_vma=False)
        return jax.jit(sharded)

    # ----------------------------------------------------------- persistence

    SHARDED_GRAPH_FILE = "ann_sharded_graph.npz"

    def save(self, directory) -> None:
        from pathlib import Path

        from tpu_vector_db.utils.fs import atomic_save_npz
        if not self.built:
            return
        e_max = max((len(e) for e in self._entry_lists), default=1)
        entries = np.full((self.n_dev, e_max), -1, np.int32)
        for s, e in enumerate(self._entry_lists):
            entries[s, : len(e)] = e
        atomic_save_npz(
            Path(directory) / self.SHARDED_GRAPH_FILE,
            graphs=self._graphs_host, keys=self._keys_host,
            entries=entries,
            meta=np.array([self.n_dev, self._rows_per_shard, self._count,
                           self.M, self.ef_construction, self.dim],
                          np.int64))

    def load(self, directory, capacity: int) -> bool:
        from pathlib import Path
        path = Path(directory) / self.SHARDED_GRAPH_FILE
        if not path.exists():
            return False
        try:
            with np.load(path) as z:
                n_dev, rows, count, m, efc, dim = z["meta"]
                if (n_dev != self.n_dev or dim != self.dim
                        or int(m) != self.M
                        or capacity // self.n_dev != rows
                        or z["graphs"].shape[0] != capacity):
                    raise ValueError("sharded graph layout mismatch")
                self._graphs_host = z["graphs"]
                self._keys_host = z["keys"]
                entries = z["entries"]
            self._entry_lists = [e[e >= 0] for e in entries]
            self._rows_per_shard = int(rows)
            self._count = int(count)
            self._graph_dev = jax.device_put(
                jnp.asarray(self._graphs_host),
                NamedSharding(self.mesh, P(self.axis_name, None)))
            self._place_entries()
            return True
        except Exception:  # noqa: BLE001 — corrupt graph -> rebuild
            logger.exception("corrupt sharded graph at %s; will rebuild",
                             path)
            return False

    def get_stats(self) -> dict:
        return {"type": "sharded_beam_graph", "nodes": self._count,
                "shards": self.n_dev, "M": self.M, "R": self.R,
                "ef_construction": self.ef_construction,
                "build_time_s": round(self.build_time_s, 3)}
