"""ShardedVectorStore — a TPUVectorStore whose matrix spans a device mesh.

Same API, metadata semantics, and persistence contract as the single-chip
store; only the device residency changes: rows shard across the mesh
(NamedSharding (shard, None)), queries replicate, and the query path is the
shard_map scan in parallel/sharded_scan.py (local top-k + ICI all-gather
merge). This is the 10M×128D-on-v5e-8 configuration from BASELINE.md.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_vector_db.ops import distance as D
from tpu_vector_db.parallel.mesh import (
    SHARD_AXIS, make_device_mesh, replicated, row_sharding)
from tpu_vector_db.parallel.sharded_scan import make_sharded_query_fn
from tpu_vector_db.store.config import VectorStoreConfig
from tpu_vector_db.store.vector_store import TPUVectorStore
from tpu_vector_db.utils.validation import validate_vector_shape

logger = logging.getLogger(__name__)


@jax.jit
def _pack_device(keys, idx):
    """Pack (keys f32, idx i32) into one int32 array on device.
    f32->int32 bitcast only — axon miscompiles the reverse on device
    (CLAUDE.md); the host reverses it with a numpy view."""
    keys_i = jax.lax.bitcast_convert_type(
        keys.astype(jnp.float32), jnp.int32)
    return jnp.concatenate([keys_i, idx.astype(jnp.int32)], axis=-1)


def _unpack_host(keys, idx):
    """ONE blocking D2H for (keys, indices): a tunneled-TPU transfer
    costs ~10ms, and the former two serial np.asarray calls doubled the
    sharded serving floor vs the base class's packed transfer
    (review finding; vector_store._query_packed)."""
    k = keys.shape[-1]
    host = np.asarray(_pack_device(keys, idx))  # the one blocking D2H
    return (np.ascontiguousarray(host[..., :k]).view(np.float32),
            host[..., k:])


class _CompiledFnCache:
    """Bounded LRU of compiled query fns keyed (..., capacity).

    Capacity doublings and varied k would otherwise accumulate compiled
    XLA programs forever (round-1 finding); entries for stale capacities
    are dropped eagerly on every capacity change.

    Thread-safe: queries are concurrent READERS of the store (rw.read,
    vector_store.batch_query) and get/put from multiple executor threads;
    the OrderedDict move_to_end/popitem pair is not atomic under
    concurrent mutation."""

    def __init__(self, max_entries: int = 16) -> None:
        import threading
        from collections import OrderedDict
        self._d: "OrderedDict[tuple, object]" = OrderedDict()
        self._max = max_entries
        self._mu = threading.Lock()

    def get(self, key: tuple):
        with self._mu:
            fn = self._d.get(key)
            if fn is not None:
                self._d.move_to_end(key)
            return fn

    def put(self, key: tuple, fn) -> None:
        with self._mu:
            self._d[key] = fn
            self._d.move_to_end(key)
            while len(self._d) > self._max:
                self._d.popitem(last=False)

    def drop_stale_capacity(self, cap: int) -> None:
        with self._mu:
            for key in [k for k in self._d if k[-1] != cap]:
                del self._d[key]

    def __len__(self) -> int:
        return len(self._d)


class ShardedVectorStore(TPUVectorStore):
    def __init__(self, store_path, config: VectorStoreConfig | None = None,
                 mesh=None) -> None:
        self.mesh = mesh if mesh is not None else make_device_mesh()
        self._n_dev = self.mesh.devices.size
        self._row_sharding = row_sharding(self.mesh)
        self._replicated = replicated(self.mesh)
        self._query_fns = _CompiledFnCache()
        self._ann_fns = _CompiledFnCache()
        super().__init__(store_path, config)

    # capacity must split evenly into per-shard block_rows multiples
    def _capacity_for(self, n: int) -> int:
        unit = self._block * self._n_dev
        cap = max(unit, self.config.initial_capacity)
        while cap < n:
            cap *= 2
        return ((cap + unit - 1) // unit) * unit

    def _reset_device(self, capacity: int) -> None:
        """(Re)materialize the sharded device matrix from host state.

        Appends re-place the whole buffer (one H2D per add batch). Adds are
        the cold path; queries never move row data.
        """
        self._cap = capacity
        # compiled programs for other capacities can never be used again
        self._query_fns.drop_stale_capacity(capacity)
        self._ann_fns.drop_stale_capacity(capacity)
        row_shard = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(SHARD_AXIS))
        if self._quant4:
            host = np.zeros((capacity, self._d_pad // 2), np.uint8)
            scl = np.zeros((capacity,), np.float32)
            if self._count:
                packed, scales = self._prepare_block(
                    self._host_buf[: self._count])
                host[: self._count] = np.asarray(packed)
                scl[: self._count] = np.asarray(scales)
            self._db = jax.device_put(jnp.asarray(host), self._row_sharding)
            self._scales = jax.device_put(jnp.asarray(scl), row_shard)
            self._sqnorms = None
            return
        host = np.zeros((capacity, self._d_pad), np.float32)
        if self._count:
            prepared = self._prepare_block(self._host_buf[: self._count])
            host[: self._count] = np.asarray(prepared, np.float32)
        dtype = self._dtype
        self._db = jax.device_put(jnp.asarray(host, dtype), self._row_sharding)
        self._scales = None
        if self.metric == "euclidean":
            sq = np.zeros((capacity,), np.float32)
            if self._count:
                live = self._host_buf[: self._count].astype(np.float32)
                sq[: self._count] = np.sum(live * live, axis=-1)
            self._sqnorms = jax.device_put(
                jnp.asarray(sq), jax.sharding.NamedSharding(
                    self.mesh, jax.sharding.PartitionSpec(SHARD_AXIS)))
        else:
            self._sqnorms = None

    # ------------------------------------------------------ in-place append

    def _get_write_fn(self, rows: int, nd: int):
        """Donated per-shard masked write under shard_map. Each device
        overwrites only the rows of ITS range that fall inside
        [offset, offset+rows) — the only H2D traffic is the new rows
        (replicated), not the whole matrix (round-1 finding: every add
        re-shipped the full buffer through the 0.33 GB/s tunnel). A plain
        global dynamic_update_slice is rejected under explicit sharding
        (operand row-sharded vs replicated update)."""
        key = ("write", rows, nd, self._cap)
        fn = self._query_fns.get(key)
        if fn is None:
            out_spec = P(SHARD_AXIS, None) if nd == 2 else P(SHARD_AXIS)

            def write(local_buf, block, offset):
                rows_local = local_buf.shape[0]
                i = jax.lax.axis_index(SHARD_AXIS)
                gidx = (i * rows_local
                        + jnp.arange(rows_local, dtype=jnp.int32))
                pos = gidx - offset
                in_range = (pos >= 0) & (pos < rows)
                src = block[jnp.clip(pos, 0, rows - 1)]
                if nd == 2:
                    return jnp.where(in_range[:, None], src, local_buf)
                return jnp.where(in_range, src, local_buf)

            sharded = jax.shard_map(
                write, mesh=self.mesh,
                in_specs=(out_spec, P(), P()), out_specs=out_spec,
                check_vma=False)
            fn = jax.jit(sharded, donate_argnums=(0,))
            self._query_fns.put(key, fn)
        return fn

    def _append_in_place(self, arr: np.ndarray, offset: int) -> None:
        n = arr.shape[0]
        # pad the batch to a power of two so the jitted write compiles a
        # bounded set of shapes; the pad rows are zeros landing in the dead
        # region past count (guarded by the capacity check in add_vectors)
        rows = 1
        while rows < n:
            rows *= 2
        if self._quant4:
            packed, scales = self._prepare_block(arr)
            block = np.zeros((rows, self._d_pad // 2), np.uint8)
            block[:n] = np.asarray(packed)
            blk = jax.device_put(jnp.asarray(block), self._replicated)
            self._db = self._get_write_fn(rows, 2)(
                self._db, blk, jnp.int32(offset))
            scl = np.zeros((rows,), np.float32)
            scl[:n] = np.asarray(scales)
            scl_blk = jax.device_put(jnp.asarray(scl), self._replicated)
            self._scales = self._get_write_fn(rows, 1)(
                self._scales, scl_blk, jnp.int32(offset))
            return
        block = np.zeros((rows, self._d_pad), np.float32)
        block[:n] = np.asarray(self._prepare_block(arr), np.float32)
        dtype = self._dtype
        blk = jax.device_put(jnp.asarray(block, dtype), self._replicated)
        self._db = self._get_write_fn(rows, 2)(
            self._db, blk, jnp.int32(offset))
        if self._sqnorms is not None:
            sq = np.zeros((rows,), np.float32)
            live = arr.astype(np.float32)
            sq[:n] = np.sum(live * live, axis=-1)
            sq_blk = jax.device_put(jnp.asarray(sq), self._replicated)
            self._sqnorms = self._get_write_fn(rows, 1)(
                self._sqnorms, sq_blk, jnp.int32(offset))

    def add_vectors(self, vectors, metadata=None) -> dict:
        from tpu_vector_db.utils.validation import validate_vector_shape
        arr = validate_vector_shape(vectors, self.config.dimension)
        n = arr.shape[0]
        if metadata is None:
            metadata = [{} for _ in range(n)]
        if len(metadata) != n:
            raise ValueError(f"metadata length {len(metadata)} != vectors {n}")
        # rw.write: queries are readers (base batch_query) — the donated
        # per-shard append must exclude in-flight dispatches. The sharded
        # refresh stays synchronous under the lock (its per-shard extend
        # repartitions compiled-fn caches; conservative).
        with self._lock, self._rw.write():
            old_count = self._count
            new_count = old_count + n
            self._ensure_host_cap(new_count)
            self._host_buf[old_count: new_count] = arr
            self._metadata.extend(metadata)
            self._meta_index.extend(metadata)
            self._count = new_count
            pad_rows = 1
            while pad_rows < n:
                pad_rows *= 2
            if (self._db is not None
                    and old_count + pad_rows <= self._cap):
                self._append_in_place(arr, old_count)
            else:
                self._reset_device(self._capacity_for(new_count))
            self._ann_stale = True
            self._dirty = True
            if self.config.persist_mode == "sync":
                self._save()
            if self.config.enable_ann:
                self._refresh_ann(incremental_from=old_count)
        return {"added": n, "total": self._count}

    # ------------------------------------------------------------------ ANN

    def _load_ann_sidecar(self, n: int) -> None:
        """Sharded indexes load through _refresh_ann (ShardedIVF/
        ShardedBeamGraph own their multi-shard sidecar formats); the base
        hook would load a single-chip ann_ivf.npz whose object lacks the
        sharded search interface (review finding)."""
        self._refresh_ann()

    def _auto_pick_kind(self) -> str:
        """index_type='auto' resolves to IVF on a sharded store regardless
        of row count — it must agree with _refresh_ann below (which builds
        ShardedIVF for 'auto'), or query-time k-routing (the ivf_large_k
        divert in vector_store.batch_query) and get_stats()['index_type']
        would describe an index other than the one serving."""
        return "ivf"

    def _refresh_ann(self, incremental_from=None) -> None:
        """Per-shard subgraphs (parallel/sharded_ann.py) or per-shard IVF
        quantizers (parallel/sharded_ivf.py), per ann_params.index_type.
        Appends EXTEND the existing structures (O(batch) per shard); a full
        rebuild happens only on first build or when capacity growth
        re-partitions the shard row ranges. The graph family requires the
        native builder; degrades to the sharded flat scan otherwise."""
        from tpu_vector_db.index import native
        if self._count == 0:
            return
        if self.config.ann_params.get("index_type", "auto") in ("auto",
                                                                "ivf"):
            # a sharded store exists because the corpus outgrew one chip —
            # that is exactly the N >> 1M regime where IVF wins the routing
            # table (BENCHMARKS.md), so 'auto' resolves to IVF here
            self._refresh_sharded_ivf(incremental_from)
            return
        if self.config.ann_params.get("index_type") == "flat":
            self._ann = None
            self._ann_stale = False
            return
        if not native.available():
            logger.warning("sharded ANN needs the native builder; "
                           "serving with the sharded flat scan")
            self._ann = None
            return
        from tpu_vector_db.parallel.sharded_ann import ShardedBeamGraph
        if (isinstance(self._ann, ShardedBeamGraph) and incremental_from
                and self._ann.size == incremental_from
                and self._ann._rows_per_shard == self._cap // self._n_dev):
            self._ann.add(self._host_buf, incremental_from, self._count)
            self._persist_sharded_ann()
            self._ann_stale = False
            return
        p = self.config.ann_params
        self._ann = ShardedBeamGraph(
            dim=self.config.dimension, metric=self.metric, mesh=self.mesh,
            M=p.get("M", 16),
            ef_construction=p.get("ef_construction", 200),
            alpha=p.get("alpha", 1.2))
        if not (self._ann.load(self.store_path, self._cap)
                and self._ann.size == self._count):
            self._ann.build(self._host_buf, self._count, self._cap)
            self._persist_sharded_ann()
        self._ann_stale = False
        self._ann_fns = _CompiledFnCache()

    def _persist_sharded_ann(self) -> None:
        if self.config.persist_mode != "off" and self._ann is not None:
            self._ann.save(self.store_path)

    def _refresh_sharded_ivf(self, incremental_from=None) -> None:
        from tpu_vector_db.parallel.sharded_ivf import ShardedIVF
        p = self.config.ann_params
        if (isinstance(self._ann, ShardedIVF) and incremental_from
                and self._ann.size == incremental_from
                and self._ann._rows_per_shard == self._cap // self._n_dev):
            nb_before = self._ann._nb_pad
            self._ann.add(self._host_buf, incremental_from, self._count)
            if self._ann._nb_pad != nb_before:
                # bucket table grew: cached search fns froze
                # p_eff = min(nprobe, old nb_pad) and would silently probe
                # fewer buckets than the nprobe contract (review finding)
                self._ann_fns = _CompiledFnCache()
            self._persist_sharded_ann()
            self._ann_stale = False
            return
        dtype = self._dtype
        quant = (self.config.storage_dtype
                 if self.config.storage_dtype in ("int8", "int4") else None)
        self._ann = ShardedIVF(
            dim=self.config.dimension, metric=self.metric, mesh=self.mesh,
            nprobe=p.get("nprobe", 32),
            n_clusters=p.get("n_clusters"),
            bucket_rows=p.get("bucket_rows"),
            train_iters=p.get("train_iters", 10),
            storage_dtype=dtype, quant=quant)
        if not (self._ann.load(self.store_path, self._host_buf, self._cap)
                and self._ann.size == self._count):
            self._ann.build(self._host_buf, self._count, self._cap)
            self._persist_sharded_ann()
        self._ann_stale = False
        self._ann_fns = _CompiledFnCache()

    def _ann_batch_query(self, arr: np.ndarray, k: int,
                         filter_metadata: dict | None):
        from tpu_vector_db.parallel.sharded_ivf import ShardedIVF
        from tpu_vector_db.store.vector_store import metadata_matches
        p = self.config.ann_params
        fetch_k = (min(self._count, k * 10)
                   if filter_metadata or self._deleted else k)
        q = jax.device_put(self._prepare_queries(arr), self._replicated)
        if isinstance(self._ann, ShardedIVF):
            nprobe = p.get("nprobe", 32)
            key = ("ivf", fetch_k, nprobe, self._cap)
            fn = self._ann_fns.get(key)
            if fn is None:
                fn = self._ann.make_search_fn(
                    fetch_k, nprobe,
                    with_sqnorms=(self.metric == "euclidean"))
                self._ann_fns.put(key, fn)
            args = [q, *self._ann.search_args()]
            if self._ann.quant:   # gather mode probes the flat matrix
                args.append(self._db)
                if self._ann.quant == "int4":
                    args.append(self._scales)
            keys, labels = fn(*args)
            if self._ann.quant == "int8":
                # raw x127 quantizer scale, same as the flat engine
                keys = jnp.where(jnp.isfinite(keys),
                                 keys * (1.0 / 127.0), keys)
            keys, labels = _unpack_host(keys, labels)
        else:
            ef = p.get("ef_search", 100)
            key = (fetch_k, max(ef, fetch_k), self._cap)
            fn = self._ann_fns.get(key)
            if fn is None:
                fn = self._ann.make_search_fn(
                    fetch_k, max(ef, fetch_k),
                    with_sqnorms=(self._sqnorms is not None))
                self._ann_fns.put(key, fn)
            count = jax.device_put(jnp.int32(self._count),
                                   self._replicated)
            args = [q, self._db, count, self._ann._graph_dev,
                    self._ann._entries_dev]
            if self._sqnorms is not None:
                args.append(self._sqnorms)
            keys, labels = _unpack_host(*fn(*args))
        out = []
        for row_keys, row_labels in zip(keys, labels):
            indices, scores, metas = [], [], []
            for key_v, i in zip(row_keys, row_labels):
                i = int(i)
                if i < 0 or len(indices) >= k or i in self._deleted:
                    continue
                meta = self._metadata[i]
                if filter_metadata and not metadata_matches(
                        meta, filter_metadata):
                    continue
                if self.metric == "euclidean":
                    raw = float(np.sqrt(max(-key_v, 0.0)))
                elif self.metric == "cosine":
                    raw = float(np.clip(key_v, -1.0, 1.0))
                else:
                    raw = float(key_v)
                indices.append(i)
                scores.append(raw)
                metas.append(meta)
            out.append((indices, scores, metas))
        return out

    def _filter_mask(self, filter_metadata: dict, host_mask=None):
        mask = super()._filter_mask(filter_metadata, host_mask)
        return jax.device_put(mask, jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(SHARD_AXIS)))

    def _get_query_fn(self, k: int, with_filter: bool):
        key = (k, with_filter, self._cap)
        fn = self._query_fns.get(key)
        if fn is None:
            fn, _ = make_sharded_query_fn(
                self.mesh, k, metric=self.metric,
                db_normalized=(self.metric == "cosine"),
                with_sqnorms=(self._sqnorms is not None),
                with_filter=with_filter,
                with_scales=self._quant4,
                block_rows=self._block)
            self._query_fns.put(key, fn)
        return fn

    def _flat_topk(self, queries: np.ndarray, k: int, filter_mask):
        q = jax.device_put(
            D.pad_dim(jnp.asarray(queries, jnp.float32),
                      multiple=256 if self._quant4 else 128),
            self._replicated)
        count = jax.device_put(jnp.int32(self._count), self._replicated)
        fn = self._get_query_fn(k, filter_mask is not None)
        args = [q, self._db, count]
        if self._sqnorms is not None:
            args.append(self._sqnorms)
        if filter_mask is not None:
            args.append(filter_mask)
        if self._quant4:
            args.append(self._scales)
        keys, idx = _unpack_host(*fn(*args))
        if self._dtype == jnp.int8:
            keys = keys * (1.0 / 127.0)  # undo the fixed quantizer scale
        return keys, idx

    def get_stats(self) -> dict:
        stats = super().get_stats()
        stats["sharded"] = True
        stats["n_devices"] = self._n_dev
        stats["rows_per_shard"] = self._cap // self._n_dev
        return stats
