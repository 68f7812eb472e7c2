"""Sharded IVF: per-shard k-means quantizers + bucket-probe scan + ICI merge.

Companion to parallel/sharded_ann.py (beam-graph subgraphs) for the second
index family: each mesh shard trains a LOCAL k-means over its rows and owns
a local cluster-major bucket copy; a query probes nprobe buckets on every
shard in parallel under shard_map (all traffic shard-local), then the
per-shard top-k merges with one k·P all-gather — the same communication
pattern as the sharded flat scan, so scaling behavior is identical.

Coverage semantics: probing nprobe buckets PER SHARD means a P-shard mesh
scans P× the buckets of a single chip at the same nprobe — sharding
improves recall at fixed nprobe (or lets nprobe/P shrink at fixed recall).
With nprobe >= all local buckets the result equals the exact sharded flat
scan (tested in tests/test_parallel.py).

The probe scan inside shard_map uses the XLA path (ops/ivf_scan.py:
ivf_probe_topk_xla) — portable to the CPU test mesh; the Pallas bucket
streamer stays the single-chip fast path.

Reference parity: the reference has no distributed index at all (hnswlib is
single-process, performance/hnsw_index.py); this is capability beyond it.
"""

from __future__ import annotations

import logging
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_vector_db.index.ivf import IVFIndex, _next_pow2, _select_buckets
from tpu_vector_db.ops import distance as D
from tpu_vector_db.ops.ivf_scan import (ivf_probe_topk_gather,
                                        ivf_probe_topk_xla)
from tpu_vector_db.parallel.mesh import SHARD_AXIS

logger = logging.getLogger(__name__)

# spare bucket rows appended per shard at assembly so incremental adds can
# spill into new buckets without re-materializing the sharded arrays
_BUCKET_SLACK = 8


class ShardedIVF:
    """P independent local IVF indexes over contiguous row ranges of a
    sharded store, assembled into mesh-sharded device arrays."""

    def __init__(self, dim: int, metric: str, mesh: Mesh,
                 nprobe: int = 32, n_clusters: int | None = None,
                 bucket_rows: int | None = None, train_iters: int = 10,
                 storage_dtype=jnp.bfloat16, quant: str | None = None,
                 axis_name: str = SHARD_AXIS) -> None:
        self.dim = dim
        self.metric = metric
        self.mesh = mesh
        self.axis_name = axis_name
        self.n_dev = mesh.devices.size
        self.nprobe = int(nprobe)
        self.n_clusters = n_clusters
        self.bucket_rows = bucket_rows
        self.train_iters = int(train_iters)
        self.storage_dtype = storage_dtype
        # quant='int8'/'int4': GATHER mode (index/ivf.py class docstring) —
        # no sharded bucket copy; probes gather rows from the store's
        # sharded flat matrix inside shard_map. Cosine-only by store config.
        self.quant = quant
        if quant and metric == "euclidean":
            raise ValueError("quantized sharded IVF is cosine/dot only")

        self._subs: list[IVFIndex] = []
        self._dev: dict | None = None     # mesh-sharded assembled arrays
        self._scatter_jits = None         # memoized donated scatter fns
        self._nb_pad = 0
        self._bc = 0
        self._rows_per_shard = 0
        self._count = 0
        self.build_time_s = 0.0

    # ------------------------------------------------------------- plumbing

    @property
    def built(self) -> bool:
        return self._dev is not None

    @property
    def size(self) -> int:
        return self._count

    def _prepare(self, raw: np.ndarray) -> np.ndarray:
        """Host prep identical to the store's: normalize (cosine) + pad
        (int4 pads to the packed 256-multiple like the store)."""
        x = np.ascontiguousarray(raw, np.float32)
        if self.metric == "cosine":
            x = x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
        mult = 256 if self.quant == "int4" else 128
        return np.asarray(D.pad_dim(jnp.asarray(x), multiple=mult),
                          np.float32)

    def _quantize(self, prepared: np.ndarray):
        """Quantize prepared rows with the SAME helper the store's
        _prepare_block uses (ops/quant4.quantize_unit_rows) — the index
        trains on exactly the rows the store serves. Returns (device rows
        in the sub-index dtype, scales | None)."""
        if self.quant:
            from tpu_vector_db.ops.quant4 import quantize_unit_rows
            return quantize_unit_rows(jnp.asarray(prepared), self.quant)
        return jnp.asarray(prepared, self.storage_dtype), None

    # ----------------------------------------------------------------- build

    def build(self, host_vectors: np.ndarray, count: int,
              capacity: int) -> dict:
        t0 = time.perf_counter()
        assert capacity % self.n_dev == 0
        rows = capacity // self.n_dev
        per_shard = max(min(count, rows), 1)
        c = self.n_clusters or IVFIndex.auto_clusters(per_shard)
        bc = self.bucket_rows or min(
            max(_next_pow2(int(per_shard / max(c, 1) * 1.3)), 256), 8192)

        self._subs = []
        for s in range(self.n_dev):
            lo = s * rows
            hi = min(count, lo + rows)
            local_n = max(hi - lo, 0)
            sub = IVFIndex(dim=self.dim, metric=self.metric,
                           n_clusters=min(c, max(local_n, 1)),
                           nprobe=self.nprobe, bucket_rows=bc,
                           train_iters=self.train_iters, seed=s)
            if local_n > 0:
                prepared = self._prepare(host_vectors[lo:hi])
                rows_dev, scales = self._quantize(prepared)
                sub.build(rows_dev, local_n, scales=scales)
            self._subs.append(sub)

        self._bc = bc
        self._rows_per_shard = rows
        self._count = count
        self._assemble(host_vectors)
        self.build_time_s = time.perf_counter() - t0
        return {"nodes": count, "shards": self.n_dev, "clusters": c,
                "bucket_rows": bc, "build_time_s": self.build_time_s}

    def _assemble(self, host_vectors: np.ndarray) -> None:
        """Stack per-shard host layouts into uniform mesh-sharded arrays."""
        rows = self._rows_per_shard
        bc = self._bc
        built = [s for s in self._subs if s.built]
        c_max = max((len(s._centroids) for s in built), default=1)
        nb_pad = max((len(s._bucket_cluster) for s in built),
                     default=1) + _BUCKET_SLACK
        d_pad = (built[0]._centroids.shape[1] if built
                 else int(D.pad_dim(jnp.zeros((1, self.dim))).shape[1]))

        cents = np.zeros((self.n_dev, c_max, d_pad), np.float32)
        ids = np.full((self.n_dev, nb_pad, bc), -1, np.int32)
        bclust = np.full((self.n_dev, nb_pad), -1, np.int32)
        fills = np.zeros((self.n_dev, nb_pad), np.int32)
        # gather mode (quant): no bucketized row copy — probes gather from
        # the store's sharded flat matrix at query time
        buckets = (None if self.quant else
                   np.zeros((self.n_dev, nb_pad, bc, d_pad), np.float32))
        bsq = (np.zeros((self.n_dev, nb_pad, bc), np.float32)
               if self.metric == "euclidean" and not self.quant else None)

        for s, sub in enumerate(self._subs):
            if not sub.built:
                continue
            nb_s = len(sub._bucket_cluster)
            cents[s, : len(sub._centroids)] = sub._centroids
            ids[s, :nb_s] = sub._ids
            bclust[s, :nb_s] = sub._bucket_cluster
            fills[s, :nb_s] = bc - sub._free
            if buckets is None:
                continue
            lo = s * rows
            hi = min(self._count, lo + rows)
            prepared = self._prepare(host_vectors[lo:hi])
            flat = sub._ids.reshape(-1)
            safe = np.maximum(flat, 0)
            buckets[s, :nb_s] = prepared[safe].reshape(nb_s, bc, d_pad)
            if bsq is not None:
                raw = host_vectors[lo:hi].astype(np.float32)
                sq = (raw * raw).sum(-1)
                bsq[s, :nb_s] = sq[safe].reshape(nb_s, bc)

        shard1 = NamedSharding(self.mesh, P(self.axis_name, None))
        shard2 = NamedSharding(self.mesh, P(self.axis_name, None, None))
        shard3 = NamedSharding(self.mesh,
                               P(self.axis_name, None, None, None))
        self._nb_pad = nb_pad
        self._dev = {
            "centroids": jax.device_put(jnp.asarray(cents), shard2),
            "c_sqnorms": jax.device_put(
                jnp.asarray((cents ** 2).sum(-1), jnp.float32), shard1),
            "ids": jax.device_put(jnp.asarray(ids), shard2),
            "bucket_cluster": jax.device_put(jnp.asarray(bclust), shard1),
            "fills": jax.device_put(jnp.asarray(fills), shard1),
            "buckets": (jax.device_put(
                jnp.asarray(buckets, self.storage_dtype), shard3)
                if buckets is not None else None),
            "bucket_sqnorms": (jax.device_put(jnp.asarray(bsq), shard2)
                               if bsq is not None else None),
        }

    # ------------------------------------------------------------------- add

    def add(self, host_vectors: np.ndarray, old_count: int,
            new_count: int) -> dict:
        """Assign rows [old_count, new_count) to their shard's nearest
        centroids and fill bucket slots — O(batch) host work + one scatter;
        re-assembles only when a shard overflows its bucket padding."""
        t0 = time.perf_counter()
        if not self.built or old_count != self._count:
            raise ValueError(
                f"add must continue from {self._count}, got {old_count}")
        rows = self._rows_per_shard
        bc = self._bc
        overflow = False
        scat: list[tuple[int, int, int, int]] = []  # (shard, bucket, slot,
        #                                              global row)
        for s in range(old_count // rows, (new_count - 1) // rows + 1):
            lo = s * rows
            hi = min(new_count, lo + rows)
            local_old = max(old_count - lo, 0)
            local_n = hi - lo
            if local_n <= local_old:
                continue
            sub = self._subs[s]
            new_raw = host_vectors[lo + local_old: lo + local_n]
            prepared = self._prepare(new_raw)
            if not sub.built:
                rows_dev, scales = self._quantize(prepared)
                sub.build(rows_dev, local_n - local_old, scales=scales)
                overflow = True  # new shard came alive: re-assemble
                continue
            assign = sub.assign_host(prepared)
            placed = sub._place_rows(
                assign, np.arange(local_old, local_n))
            sub._n = local_n
            if len(sub._bucket_cluster) > self._nb_pad:
                overflow = True
            else:
                for (b, slot, local_row) in placed:
                    scat.append((s, b, slot, lo + local_row))
        self._count = new_count
        if overflow:
            self._assemble(host_vectors)
        elif scat:
            self._scatter(host_vectors, scat)
        dt = time.perf_counter() - t0
        self.build_time_s += dt
        return {"nodes": new_count - old_count, "build_time_s": dt,
                "reassembled": overflow, "placed": len(scat)}

    def _get_scatter_jits(self):
        """Jitted donated scatters, built ONCE per index: a fresh jax.jit
        per call would retrace + recompile on every add (jit caches key on
        function identity — review finding)."""
        if self._scatter_jits is None:
            shard1 = NamedSharding(self.mesh, P(self.axis_name, None))
            shard2 = NamedSharding(self.mesh,
                                   P(self.axis_name, None, None))
            shard3 = NamedSharding(self.mesh,
                                   P(self.axis_name, None, None, None))
            flat2 = NamedSharding(self.mesh, P(self.axis_name, None))
            flat1 = NamedSharding(self.mesh, P(self.axis_name))

            def scatter_rows(bk, pos, rws):
                p_, n_, c_, d_ = bk.shape
                flat = bk.reshape(p_ * n_ * c_, d_)
                flat = flat.at[pos].set(rws, out_sharding=flat2)
                return flat.reshape(p_, n_, c_, d_)

            def scatter_ids(idv, pos, vals):
                p_, n_, c_ = idv.shape
                flat = idv.reshape(p_ * n_ * c_)
                flat = flat.at[pos].set(vals, out_sharding=flat1)
                return flat.reshape(p_, n_, c_)

            self._scatter_jits = (
                jax.jit(scatter_rows, donate_argnums=(0,),
                        out_shardings=shard3),
                jax.jit(scatter_ids, donate_argnums=(0,),
                        out_shardings=shard2))
        return self._scatter_jits

    def _scatter(self, host_vectors: np.ndarray,
                 scat: list[tuple[int, int, int, int]]) -> None:
        bc, nb = self._bc, self._nb_pad
        shard1 = NamedSharding(self.mesh, P(self.axis_name, None))
        flat_pos = np.asarray(
            [(s * nb + b) * bc + slot for s, b, slot, _ in scat], np.int32)
        grows = np.asarray([g for _, _, _, g in scat], np.int32)
        local_ids = np.asarray(
            [g - s * self._rows_per_shard for s, _, _, g in scat],
            np.int32)
        prepared = (self._prepare(host_vectors[grows])
                    if self._dev["buckets"] is not None else None)

        scatter_rows, scatter_ids = self._get_scatter_jits()
        dev = self._dev
        if dev["buckets"] is not None:   # bucketized layout only
            dev["buckets"] = scatter_rows(
                dev["buckets"], jnp.asarray(flat_pos),
                jnp.asarray(prepared, self.storage_dtype))
        dev["ids"] = scatter_ids(
            dev["ids"], jnp.asarray(flat_pos), jnp.asarray(local_ids))
        if dev["bucket_sqnorms"] is not None:
            raw = host_vectors[grows].astype(np.float32)
            dev["bucket_sqnorms"] = scatter_ids(
                dev["bucket_sqnorms"], jnp.asarray(flat_pos),
                jnp.asarray((raw * raw).sum(-1), jnp.float32))
        # fills AND bucket_cluster refresh from host state: spill buckets
        # created by _place_rows must become probe-visible (a dev
        # bucket_cluster of -1 makes _select_buckets score them NEG_INF —
        # review finding: adds that spilled were silently unsearchable)
        fills = np.zeros((self.n_dev, nb), np.int32)
        bclust = np.full((self.n_dev, nb), -1, np.int32)
        for s, sub in enumerate(self._subs):
            if sub.built:
                nb_s = len(sub._bucket_cluster)
                fills[s, :nb_s] = bc - sub._free
                bclust[s, :nb_s] = sub._bucket_cluster
        dev["fills"] = jax.device_put(jnp.asarray(fills), shard1)
        dev["bucket_cluster"] = jax.device_put(jnp.asarray(bclust), shard1)

    # ---------------------------------------------------------------- search

    def make_search_fn(self, k: int, nprobe: int, with_sqnorms: bool):
        """(q, cents, csq, bclust, buckets, ids, fills[, bsq]) ->
        replicated (keys, global ids). Probes `nprobe` buckets PER SHARD.

        Gather mode (quant set): signature becomes
        (q, cents, csq, bclust, ids, fills, db[, scales]) — db is the
        STORE's row-sharded flat matrix; each shard's probes gather their
        rows from the local db block (ops/ivf_scan.ivf_probe_topk_gather),
        so the only cross-chip traffic stays the k·P winner all-gather."""
        axis = self.axis_name
        metric = self.metric
        rows_local = self._rows_per_shard
        p_eff = min(nprobe, self._nb_pad)

        def merge(q, keys, out):
            shard = jax.lax.axis_index(axis)
            offset = (shard * rows_local).astype(jnp.int32)
            gids = jnp.where(out >= 0, out + offset, -1)
            all_keys = jax.lax.all_gather(keys, axis, axis=1, tiled=True)
            all_ids = jax.lax.all_gather(gids, axis, axis=1, tiled=True)
            vals, selm = jax.lax.top_k(all_keys, k)
            return vals, jnp.take_along_axis(all_ids, selm, axis=-1)

        def core(q, cents, csq, bclust, buckets, ids, fills, bsq):
            sel = _select_buckets(q, cents[0], bclust[0], p_eff, metric,
                                  csq[0])
            keys, out = ivf_probe_topk_xla(
                q, buckets[0], ids[0], sel, k, metric=metric,
                bucket_sqnorms=bsq[0] if bsq is not None else None)
            return merge(q, keys, out)

        def core_gather(q, cents, csq, bclust, ids, fills, db, scales):
            sel = _select_buckets(q, cents[0], bclust[0], p_eff, metric,
                                  csq[0])
            keys, out = ivf_probe_topk_gather(
                q, db, ids[0], sel, k, metric=metric, db_scales=scales)
            return merge(q, keys, out)

        row1 = P(axis, None)
        row2 = P(axis, None, None)
        row3 = P(axis, None, None, None)
        if self.quant:
            if self.quant == "int4":
                fn = core_gather
                in_specs = (P(), row2, row1, row1, row2, row1,
                            P(axis, None), P(axis))
            else:
                fn = (lambda q, c_, cs, bc_, i_, f_, db:  # noqa: E731
                      core_gather(q, c_, cs, bc_, i_, f_, db, None))
                in_specs = (P(), row2, row1, row1, row2, row1,
                            P(axis, None))
        elif with_sqnorms:
            fn = core
            in_specs = (P(), row2, row1, row1, row3, row2, row1, row2)
        else:
            fn = (lambda q, c_, cs, bc_, bk, i_, f_:  # noqa: E731
                  core(q, c_, cs, bc_, bk, i_, f_, None))
            in_specs = (P(), row2, row1, row1, row3, row2, row1)
        sharded = jax.shard_map(fn, mesh=self.mesh, in_specs=in_specs,
                                out_specs=(P(), P()), check_vma=False)
        return jax.jit(sharded)

    def search_args(self):
        dev = self._dev
        if self.quant:
            # caller appends the store's sharded flat db (+ int4 scales)
            return [dev["centroids"], dev["c_sqnorms"],
                    dev["bucket_cluster"], dev["ids"], dev["fills"]]
        args = [dev["centroids"], dev["c_sqnorms"], dev["bucket_cluster"],
                dev["buckets"], dev["ids"], dev["fills"]]
        if dev["bucket_sqnorms"] is not None:
            args.append(dev["bucket_sqnorms"])
        return args

    # ----------------------------------------------------------- persistence

    SHARDED_IVF_FILE = "ann_sharded_ivf.npz"

    def save(self, directory) -> None:
        """One npz holding every shard's host layout; the mesh arrays
        re-assemble from host vectors at load (they are a pure function of
        the layout + rows)."""
        from pathlib import Path

        from tpu_vector_db.utils.fs import atomic_save_npz
        if not self.built:
            return
        payload = {"meta": np.array(
            [self.n_dev, self._rows_per_shard, self._count, self._bc,
             self.dim], np.int64)}
        for s, sub in enumerate(self._subs):
            payload[f"built_{s}"] = np.array([int(sub.built)])
            if sub.built:
                payload[f"cents_{s}"] = sub._centroids
                payload[f"ids_{s}"] = sub._ids
                payload[f"bclust_{s}"] = sub._bucket_cluster
                payload[f"free_{s}"] = sub._free
                payload[f"n_{s}"] = np.array([sub._n])
        atomic_save_npz(Path(directory) / self.SHARDED_IVF_FILE, **payload)

    def load(self, directory, host_vectors: np.ndarray,
             capacity: int) -> bool:
        from pathlib import Path
        path = Path(directory) / self.SHARDED_IVF_FILE
        if not path.exists():
            return False
        try:
            with np.load(path) as z:
                n_dev, rows, count, bc, dim = z["meta"]
                if (n_dev != self.n_dev or dim != self.dim
                        or capacity // self.n_dev != rows):
                    raise ValueError("sharded IVF layout mismatch")
                self._subs = []
                for s in range(self.n_dev):
                    sub = IVFIndex(dim=self.dim, metric=self.metric,
                                   nprobe=self.nprobe, bucket_rows=int(bc),
                                   train_iters=self.train_iters, seed=s)
                    if int(z[f"built_{s}"][0]):
                        sub._centroids = z[f"cents_{s}"]
                        sub._ids = z[f"ids_{s}"]
                        sub._bucket_cluster = z[f"bclust_{s}"]
                        sub._free = z[f"free_{s}"]
                        sub._n = int(z[f"n_{s}"][0])
                    self._subs.append(sub)
            self._bc = int(bc)
            self._rows_per_shard = int(rows)
            self._count = int(count)
            self._assemble(host_vectors)
            return True
        except Exception:  # noqa: BLE001 — corrupt index -> rebuild
            logger.exception("corrupt sharded IVF at %s; will rebuild",
                             path)
            return False

    def get_stats(self) -> dict:
        live = sum(int((s._ids >= 0).sum()) for s in self._subs if s.built)
        return {"type": "sharded_ivf", "nodes": self._count,
                "shards": self.n_dev, "nprobe": self.nprobe,
                "buckets_per_shard": self._nb_pad,
                "bucket_rows": self._bc,
                "fill_ratio": round(
                    live / max(self.n_dev * self._nb_pad * self._bc, 1), 3),
                "build_time_s": round(self.build_time_s, 3)}
