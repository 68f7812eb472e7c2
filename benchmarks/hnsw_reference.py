"""Scalar reference HNSW (Malkov & Yashunin 2016) — the recall yardstick.

BASELINE.md demands "ANN recall within measured reference HNSW recall at
equal ef/M", but hnswlib (the reference's C++ index,
/root/reference/performance/hnsw_index.py:14) is not installable in this
image. This is a small, faithful, dependency-free implementation of the
actual HNSW algorithm — multi-layer skip-list graph, level assignment
ml = 1/ln(M), greedy descent through upper layers, ef-bounded best-first
search at layer 0, neighbor-diversity heuristic (Algorithm 4), bidirectional
links with overflow pruning — used ONLY as the recall baseline in
benchmarks/recall_parity.py. Distances are vectorized over candidate
batches with numpy; build is otherwise scalar Python, so use it at harness
scales (<= ~300K rows), not in serving paths.
"""

from __future__ import annotations

import math

import numpy as np


class ReferenceHNSW:
    """metric: 'cosine' (expects L2-normalized rows; distance = 1 - dot)
    or 'euclidean' (distance = squared L2 — rank-equivalent)."""

    def __init__(self, dim: int, metric: str = "cosine", M: int = 16,
                 ef_construction: int = 200, seed: int = 0) -> None:
        self.dim = dim
        self.metric = metric
        self.M = M
        self.M0 = 2 * M                   # layer-0 degree, hnswlib default
        self.efc = ef_construction
        self.ml = 1.0 / math.log(M)
        self._rng = np.random.default_rng(seed)
        self._vecs: np.ndarray | None = None
        self._levels: list[int] = []
        # layers[l][u] -> list[int] neighbors of u at layer l
        self._layers: list[dict[int, list[int]]] = []
        self._entry = -1
        self._top = -1
        self._n = 0

    # ---------------------------------------------------------- distances

    def _dist(self, q: np.ndarray, ids) -> np.ndarray:
        rows = self._vecs[ids]
        if self.metric == "cosine":
            return 1.0 - rows @ q
        diff = rows - q
        return np.einsum("nd,nd->n", diff, diff)

    def _dist1(self, q: np.ndarray, v: int) -> float:
        return float(self._dist(q, np.asarray([v]))[0])

    # ---------------------------------------------------------- search core

    def _search_layer(self, q: np.ndarray, entry: int, ef: int,
                      layer: int) -> list[tuple[float, int]]:
        """Best-first ef-bounded search (Algorithm 2). Returns (dist, id)
        ascending by distance."""
        import heapq
        d0 = self._dist1(q, entry)
        visited = {entry}
        cand = [(d0, entry)]               # min-heap by distance
        result = [(-d0, entry)]            # max-heap (neg dist)
        adj = self._layers[layer]
        while cand:
            d, u = heapq.heappop(cand)
            if d > -result[0][0] and len(result) >= ef:
                break
            neigh = [v for v in adj.get(u, ()) if v not in visited]
            if not neigh:
                continue
            visited.update(neigh)
            dists = self._dist(q, np.asarray(neigh))
            for dv, v in zip(dists, neigh):
                if len(result) < ef or dv < -result[0][0]:
                    heapq.heappush(cand, (float(dv), v))
                    heapq.heappush(result, (-float(dv), v))
                    if len(result) > ef:
                        heapq.heappop(result)
        out = sorted((-nd, v) for nd, v in result)
        return out

    def _select_heuristic(self, q: np.ndarray,
                          cands: list[tuple[float, int]],
                          m: int) -> list[int]:
        """Neighbor-diversity heuristic (Algorithm 4): keep a candidate only
        if it is closer to q than to every already-kept neighbor. One
        vectorized pairwise-distance matrix per call (the scalar per-pair
        version cost ~10ms/insert)."""
        order = sorted(cands)
        ids = np.asarray([v for _, v in order])
        dq = np.asarray([d for d, _ in order])
        rows = self._vecs[ids]
        if self.metric == "cosine":
            pair = 1.0 - rows @ rows.T
        else:
            sq = np.einsum("nd,nd->n", rows, rows)
            pair = sq[:, None] - 2.0 * (rows @ rows.T) + sq[None, :]
        kept_pos: list[int] = []
        for i in range(len(ids)):
            if len(kept_pos) >= m:
                break
            if all(pair[i, j] > dq[i] for j in kept_pos):
                kept_pos.append(i)
        kept = [int(ids[i]) for i in kept_pos]
        # hnswlib keepPrunedConnections=false by default at build; fill
        # remaining slots with nearest pruned (extendCandidates variant off)
        if len(kept) < m:
            for i in range(len(ids)):
                if len(kept) >= m:
                    break
                if i not in kept_pos:
                    kept.append(int(ids[i]))
        return kept

    # --------------------------------------------------------------- build

    def _ensure_capacity(self, n: int) -> None:
        if self._vecs is None:
            self._vecs = np.empty((n, self.dim), np.float32)
        elif len(self._vecs) < n:
            grown = np.empty((max(n, 2 * len(self._vecs)), self.dim),
                             np.float32)
            grown[: self._n] = self._vecs[: self._n]
            self._vecs = grown

    def add(self, vectors: np.ndarray) -> None:
        vectors = np.ascontiguousarray(vectors, np.float32)
        if self.metric == "cosine":
            vectors = vectors / np.maximum(
                np.linalg.norm(vectors, axis=1, keepdims=True), 1e-8)
        self._ensure_capacity(self._n + len(vectors))
        for row in vectors:
            self._insert(row)

    def _insert(self, row: np.ndarray) -> None:
        u = self._n
        self._vecs[u] = row
        self._n += 1
        level = int(-math.log(max(self._rng.random(), 1e-12)) * self.ml)
        self._levels.append(level)
        while len(self._layers) <= level:
            self._layers.append({})
        for l in range(level + 1):
            self._layers[l].setdefault(u, [])
        if self._entry < 0:
            self._entry, self._top = u, level
            return
        ep = self._entry
        # greedy descent through layers above the node's level
        for l in range(self._top, level, -1):
            ep = self._search_layer(row, ep, 1, l)[0][1]
        for l in range(min(level, self._top), -1, -1):
            cands = self._search_layer(row, ep, self.efc, l)
            m = self.M0 if l == 0 else self.M
            kept = self._select_heuristic(row, cands, m)
            self._layers[l][u] = list(kept)
            for v in kept:
                nv = self._layers[l][v]
                nv.append(u)
                if len(nv) > m:
                    dv = self._dist(self._vecs[v], np.asarray(nv))
                    vc = list(zip(dv.tolist(), nv))
                    self._layers[l][v] = self._select_heuristic(
                        self._vecs[v], vc, m)
            ep = cands[0][1]
        if level > self._top:
            self._entry, self._top = u, level

    # -------------------------------------------------------------- search

    def search(self, query: np.ndarray, k: int, ef_search: int = 100):
        """Returns (ids, distances) ascending by distance."""
        q = np.asarray(query, np.float32)
        if self.metric == "cosine":
            q = q / max(float(np.linalg.norm(q)), 1e-8)
        ep = self._entry
        for l in range(self._top, 0, -1):
            ep = self._search_layer(q, ep, 1, l)[0][1]
        res = self._search_layer(q, ep, max(ef_search, k), 0)[:k]
        return [v for _, v in res], [d for d, _ in res]
