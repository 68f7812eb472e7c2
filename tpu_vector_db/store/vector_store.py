"""TPUVectorStore — the core store: device-resident matrix, host metadata.

Capability parity with the reference's ``MLXVectorStore``
(service/optimized_vector_store.py:59-246): add_vectors / query / clear /
get_stats / persistence / metric routing / ANN-with-fallback — plus the
methods the reference's API called but never implemented (batch_query,
optimize: SURVEY.md §2.1), redesigned for TPU/XLA:

* the device matrix is CAPACITY-DOUBLED and padded to (block_rows, 128-lane)
  multiples, so appends are in-place `dynamic_update_slice` into a donated
  buffer and shapes stay static for the jitted scan (the reference
  re-concatenated the whole matrix on every add);
* for cosine the device copy is pre-normalized at add time (query = one pure
  MXU matmul); for euclidean the row squared-norms are cached; the canonical
  float32 vectors live host-side for persistence and index builds;
* metadata filters become boolean masks computed host-side and applied as
  -inf inside the scan — static shapes, no gather/compaction;
* storage dtype is configurable (bf16 halves HBM traffic, the scan's
  bottleneck).
"""

from __future__ import annotations

import functools
import logging
import math
import shutil
import threading
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_vector_db.ops import distance as D
from tpu_vector_db.ops.monitor import performance_monitor
from tpu_vector_db.ops.scan import flat_scan_topk
from tpu_vector_db.ops.topk import NEG_INF
from tpu_vector_db.store.config import VectorStoreConfig
from tpu_vector_db.store import persistence
from tpu_vector_db.utils.concurrency import RWLock
from tpu_vector_db.utils.fs import FileLock, ensure_directory
from tpu_vector_db.utils.validation import validate_vector_shape

logger = logging.getLogger(__name__)


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_rows(buf: jnp.ndarray, block: jnp.ndarray, offset) -> jnp.ndarray:
    return jax.lax.dynamic_update_slice(buf, block, (offset, 0))


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_scalars(buf: jnp.ndarray, block: jnp.ndarray, offset) -> jnp.ndarray:
    return jax.lax.dynamic_update_slice(buf, block, (offset,))


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "db_normalized", "block_rows", "engine"))
def _query_packed(queries, db, count, k, metric, db_normalized,
                  db_sqnorms, filter_mask, block_rows, engine="xla",
                  db_scales=None):
    """Scan + pack (keys, indices) into ONE array so the host does a single
    device->host transfer per query call. On a tunneled/remote TPU a D2H
    round-trip costs ~10ms, so two transfers per query would double the
    serving floor. Indices are bitcast (not cast) into the float payload —
    exact for any row id.

    engine="pallas" uses the fused single-sweep kernel (ops/pallas_scan.py,
    ~1.5x the XLA scan's QPS at 1M x 768D bf16); metadata filters stream
    into the kernel as a per-block f32 mask. int4 stores (uint8-packed db
    + db_scales) dequantize inside the kernel; the XLA fallback
    materializes the bf16 rows (CPU correctness path only)."""
    if engine == "pallas":
        from tpu_vector_db.ops.pallas_scan import pallas_flat_topk
        if metric == "cosine":
            queries = D.l2_normalize(queries)
        keys, idx = pallas_flat_topk(
            queries, db, count, k, metric=metric, db_sqnorms=db_sqnorms,
            filter_mask=filter_mask, db_scales=db_scales)
    else:
        keys, idx = flat_scan_topk(
            queries, db, count, k, metric=metric,
            db_normalized=db_normalized, db_sqnorms=db_sqnorms,
            filter_mask=filter_mask, block_rows=block_rows,
            db_scales=db_scales)
    # int32 payload: the axon TPU backend miscompiles int32->f32 bitcast
    # (returns zeros) but f32->int32 is exact.
    keys_i = jax.lax.bitcast_convert_type(keys, jnp.int32)
    return jnp.concatenate([keys_i, idx], axis=-1)


def metadata_matches(meta: dict, filt: dict) -> bool:
    """Exact-match dict-subset filter semantics (reference
    optimized_vector_store.py:131-141,160-167)."""
    return all(meta.get(k) == v for k, v in filt.items())


def _meta_hash(value) -> np.uint64:
    """Stable 64-bit hash of a metadata value (JSON canonical form)."""
    import hashlib
    import json as _json
    payload = _json.dumps(value, sort_keys=True, default=str).encode()
    return np.uint64(int.from_bytes(
        hashlib.blake2b(payload, digest_size=8).digest(), "little"))


_MISSING = np.uint64(0xFFFFFFFFFFFFFFFF)


class MetadataColumnIndex:
    """Columnar hash index over metadata for vectorized exact-match filters.

    The reference evaluated filters with a Python loop over every row's dict
    per query (optimized_vector_store.py:160-167 — O(N) interpreter work on
    the hot path). Here each metadata key becomes a uint64 hash column;
    a filter is a numpy equality AND across columns. Hash collisions are
    resolved by exact re-checking only the returned top-k."""

    def __init__(self) -> None:
        self._columns: dict[str, np.ndarray] = {}
        self._count = 0
        self._cap = 0

    def _ensure(self, key: str) -> np.ndarray:
        col = self._columns.get(key)
        if col is None:
            col = np.full(max(self._cap, 1024), _MISSING, np.uint64)
            self._columns[key] = col
        return col

    def _grow(self, n: int) -> None:
        if n <= self._cap:
            return
        cap = max(self._cap, 1024)
        while cap < n:
            cap *= 2
        for key, col in self._columns.items():
            new = np.full(cap, _MISSING, np.uint64)
            new[: len(col)] = col
            self._columns[key] = new
        self._cap = cap

    def extend(self, metadata: list[dict]) -> None:
        start = self._count
        self._count += len(metadata)
        self._grow(self._count)
        for i, meta in enumerate(metadata):
            for key, value in meta.items():
                col = self._ensure(key)
                if len(col) < self._cap:
                    new = np.full(self._cap, _MISSING, np.uint64)
                    new[: len(col)] = col
                    self._columns[key] = col = new
                col[start + i] = _meta_hash(value)

    def rebuild(self, metadata: list[dict]) -> None:
        self._columns.clear()
        self._count = 0
        self._cap = 0
        self.extend(metadata)

    def clear(self) -> None:
        self.rebuild([])

    def mask(self, filt: dict, out_size: int) -> np.ndarray:
        """(out_size,) bool; rows matching every (key, value) pair."""
        mask = np.zeros(out_size, np.bool_)
        live = min(self._count, out_size)
        if live == 0:
            return mask
        acc = np.ones(live, np.bool_)
        for key, value in filt.items():
            col = self._columns.get(key)
            if col is None:
                return mask  # key never seen -> nothing matches
            acc &= col[:live] == _meta_hash(value)
        mask[:live] = acc
        return mask


class TPUVectorStore:
    """One tenant store: (N, d) matrix + metadata list + optional ANN index."""

    def __init__(self, store_path: str | Path,
                 config: VectorStoreConfig | None = None) -> None:
        # Config resolution: the persisted manifest is authoritative for an
        # existing store. Reopening with no explicit config restores the
        # created-with settings (dimension/metric/dtype/ANN) instead of
        # process defaults — without this, a restart of a non-default-dim
        # tenant opened an empty store and the next add overwrote its data.
        manifest_cfg = persistence.load_manifest_config(store_path)
        if config is None:
            self.config = manifest_cfg or VectorStoreConfig()
        else:
            if manifest_cfg is not None:
                # metric/dtype mismatches are as destructive as dimension
                # ones: a cosine reopen of a euclidean store would serve
                # wrong scores AND persist the flipped config on the next
                # save (review finding)
                for field_ in ("dimension", "metric", "storage_dtype"):
                    have = getattr(manifest_cfg, field_)
                    want = getattr(config, field_)
                    if have != want:
                        raise persistence.StoreDimensionMismatch(
                            f"store at {store_path} was created with "
                            f"{field_}={have!r}, got config with "
                            f"{want!r}")
            self.config = config
        self.store_path = Path(store_path)
        ensure_directory(self.store_path)
        self._lock = threading.RLock()
        # queries are READERS, mutations are WRITERS: batch_query holds
        # rw.read only, so concurrent coalesced flushes overlap in the
        # device stream instead of serializing a blocking ~45ms tunnel
        # call each behind one mutex (measured: 64-client REST load
        # plateaued at 444 QPS vs the 1399 blocking-call ceiling).
        # Mutators hold _lock AND rw.write — writers still exclude each
        # other and every reader, which is what makes the donated-buffer
        # appends (_write_rows) safe. Lock order: _lock -> rw.write;
        # rw.read -> _ann_build_lock (tail refresh); never the reverse.
        self._rw = RWLock()
        # serializes ANN builds/extends SEPARATELY from the store lock so
        # queries never wait behind a seconds-scale graph insert: add_vectors
        # appends under _lock (ms), then refreshes the index under THIS lock
        # only; stale-index queries route to the exact scan (bounded: one
        # fused sweep). RLock: admin paths (optimize/compact) call
        # _refresh_ann while already holding it via nested refresh calls.
        # Lock order is always _lock -> _ann_build_lock; _refresh_ann never
        # takes _lock, so the background refresh cannot deadlock an admin
        # rebuild.
        self._ann_build_lock = threading.RLock()
        self._file_lock = FileLock(self.store_path)
        self._dirty = False

        d = self.config.dimension
        # int4 packs two components per byte along d; the packed minor dim
        # must stay a lane-tile multiple, so d pads to 256 (33% pad waste
        # at d=384 — still 1.5x int8's density there)
        self._quant4 = self.config.storage_dtype == "int4"
        pad_to = 256 if self._quant4 else 128
        self._d_pad = ((d + pad_to - 1) // pad_to) * pad_to
        self._block = int(self.config.block_rows)
        self._dtype = {"bfloat16": jnp.bfloat16,
                       "int8": jnp.int8,
                       "int4": jnp.uint8}.get(self.config.storage_dtype,
                                              jnp.float32)

        # host canonical state
        self._count = 0
        self._host_cap = 0
        self._host_buf: np.ndarray | None = None  # (host_cap, d) float32
        self._metadata: list[dict] = []
        self._meta_index = MetadataColumnIndex()
        # tombstones: per-vector deletion with STABLE ids (neither system
        # had deletes; real deployments need them). Deleted rows mask out
        # of the exact scan through the zero-cost filter-mask stream and
        # post-filter out of ANN results; compact() reclaims space with
        # an explicit id remap.
        self._deleted: set[int] = set()
        self._live_mask_version = 0
        self._live_mask_cache: tuple | None = None  # ((cap, ver), host)
        self._live_mask_dev: tuple | None = None    # ((cap, ver), device)

        # device state (created lazily in _reset_device)
        self._cap = 0
        self._db: jnp.ndarray | None = None        # (cap, d_pad) prepared
        self._sqnorms: jnp.ndarray | None = None   # (cap,) f32, euclidean only
        self._scales: jnp.ndarray | None = None    # (cap,) f32, int4 only

        # ANN index (built lazily; see index/beam_graph.py)
        self._ann = None
        self._ann_stale = True
        # auto engine selection: resolved lazily from store size, re-checked
        # on every full (re)build / optimize(); see _auto_pick_kind
        self._auto_kind: str | None = None
        # post-build sampled-recall guard (graph ANN silently degrades on
        # e.g. uniform high-dim data — distance concentration)
        self._ann_recall_estimate: float | None = None
        self._ann_low_recall = False
        self._ann_checked_at = 0

        self._load()

    # ------------------------------------------------------------------ util

    @property
    def metric(self) -> str:
        return self.config.metric

    def __len__(self) -> int:
        return self._count - len(self._deleted)

    @property
    def vector_count(self) -> int:
        """LIVE vectors (tombstoned rows excluded; ids stay stable)."""
        return self._count - len(self._deleted)

    def _capacity_for(self, n: int) -> int:
        cap = max(self._block, self.config.initial_capacity)
        while cap < n:
            cap *= 2
        return ((cap + self._block - 1) // self._block) * self._block

    def _prepare_block(self, arr: np.ndarray):
        """float32 (n,d) host rows -> query-optimized device rows
        (n, d_pad); int4 mode returns ((n, d_pad//2) packed uint8,
        (n,) f32 scales)."""
        x = jnp.asarray(arr, dtype=jnp.float32)
        if self.metric == "cosine":
            x = D.l2_normalize(x)
        x = D.pad_dim(x, multiple=256 if self._quant4 else 128)
        if self._quant4:
            from tpu_vector_db.ops.quant4 import quantize_unit_rows
            # per-row scales fold the dequantized norm back to 1, so the
            # kernel's keys are the true cosine of the stored point
            return quantize_unit_rows(x, "int4")
        if self._dtype == jnp.int8:
            from tpu_vector_db.ops.quant4 import quantize_unit_rows
            # unit-norm rows -> fixed 127 scale, no per-row scale stream;
            # _flat_topk divides scores back by 127
            return quantize_unit_rows(x, "int8")[0]
        return x.astype(self._dtype)

    def _reset_device(self, capacity: int) -> None:
        """(Re)build the device buffers from host state at a new capacity."""
        self._cap = capacity
        cols = self._d_pad // 2 if self._quant4 else self._d_pad
        self._db = jnp.zeros((capacity, cols), dtype=self._dtype)
        self._sqnorms = (jnp.zeros((capacity,), jnp.float32)
                        if self.metric == "euclidean" else None)
        self._scales = (jnp.zeros((capacity,), jnp.float32)
                        if self._quant4 else None)
        if self._count:
            live = self._host_buf[: self._count]
            block = self._prepare_block(live)
            if self._quant4:
                block, scales = block
                self._scales = _write_scalars(self._scales, scales, 0)
            self._db = _write_rows(self._db, block, 0)
            if self._sqnorms is not None:
                sq = jnp.sum(jnp.asarray(live, jnp.float32) ** 2, axis=-1)
                self._sqnorms = _write_scalars(self._sqnorms, sq, 0)

    def _ensure_host_cap(self, n: int) -> None:
        if self._host_buf is None or self._host_cap < n:
            new_cap = self._capacity_for(n)
            buf = np.zeros((new_cap, self.config.dimension), np.float32)
            if self._count:
                buf[: self._count] = self._host_buf[: self._count]
            self._host_buf = buf
            self._host_cap = new_cap

    # ------------------------------------------------------------- mutation

    def add_vectors(self, vectors, metadata: list[dict] | None = None) -> dict:
        """Append rows (+ metadata). Returns counts (reference
        optimized_vector_store.py:96-114)."""
        arr = validate_vector_shape(vectors, self.config.dimension)
        n = arr.shape[0]
        if metadata is None:
            metadata = [{} for _ in range(n)]
        if len(metadata) != n:
            raise ValueError(
                f"metadata length {len(metadata)} != vectors {n}")
        t_add = time.perf_counter()
        with self._lock, self._rw.write():
            new_count = self._count + n
            if self._db is None or new_count > self._cap:
                # fail BEFORE mutating host state: a clean capacity error
                # naming the int8/int4 modes instead of an XLA OOM
                # mid-append (config.check_device_budget)
                self.config.check_device_budget(self._capacity_for(new_count))
            self._ensure_host_cap(new_count)
            self._host_buf[self._count: new_count] = arr
            self._metadata.extend(metadata)
            self._meta_index.extend(metadata)

            if self._db is None or new_count > self._cap:
                old = self._count
                self._count = new_count
                self._reset_device(self._capacity_for(new_count))
                added_at = old
            else:
                block = self._prepare_block(arr)
                if self._quant4:
                    block, scales = block
                    self._scales = _write_scalars(
                        self._scales, scales, self._count)
                self._db = _write_rows(self._db, block, self._count)
                if self._sqnorms is not None:
                    sq = jnp.sum(jnp.asarray(arr, jnp.float32) ** 2, axis=-1)
                    self._sqnorms = _write_scalars(self._sqnorms, sq, self._count)
                added_at = self._count
                self._count = new_count

            self._ann_stale = True
            self._dirty = True
            if self.config.persist_mode == "sync":
                self._save()
        # ANN refresh runs OUTSIDE the store lock (ingest-while-serving):
        # concurrent queries proceed against either the previous index or —
        # while _ann_stale — the exact scan, which already covers the new
        # rows (a just-added vector is searchable immediately, bounded at
        # one fused-sweep latency). The caller still blocks until its rows
        # are indexed, same contract as before.
        if self.config.enable_ann:
            self._refresh_ann_tail()
        performance_monitor.record("add_vectors", time.perf_counter() - t_add)
        return {"added": n, "total": self._count}

    def _refresh_ann_tail(self) -> None:
        """Index the appended tail without holding the store lock.

        The extend range comes from the index's own size (not the caller's
        append offset): back-to-back adds queue on _ann_build_lock and the
        first holder indexes every row appended so far, letting later
        holders return immediately via the _ann_stale fast path.

        Holds rw.read for the build: queries (also readers) stay live,
        while a concurrent add_vectors (writer) waits — its donated-buffer
        append would otherwise invalidate the device matrix mid-build.
        Lock order read -> build matches _refresh_ann's admin callers
        (_lock -> write -> build): a write holder excludes every reader
        BEFORE touching the build lock, so no cycle."""
        with self._rw.read(), self._ann_build_lock:
            if not self._ann_stale:
                return  # a previous holder already covered our rows
            if (self._ann is not None and self._ann_kind != "flat"
                    and getattr(self._ann, "built", False)):
                start = self._ann.size
            else:
                start = 0
            self._refresh_ann(incremental_from=start or None)

    def delete_vectors(self, indices) -> dict:
        """Tombstone rows by id — ids stay STABLE (no reindexing).

        Deleted rows mask out of the exact scan at zero marginal cost
        (the live mask streams with the db blocks exactly like metadata
        filters — measured free, BENCHMARKS.md) and post-filter out of
        ANN results under the same k*10 oversample as filters. Space
        reclaims on compact() or optimize() (both REMAP ids). Neither the
        reference nor most single-file stores support deletion at all."""
        with self._lock, self._rw.write():
            idx = np.unique(np.asarray(indices, np.int64))
            if idx.size and (idx[0] < 0 or idx[-1] >= self._count):
                raise ValueError(
                    f"delete indices out of range [0, {self._count})")
            before = len(self._deleted)
            self._deleted.update(int(i) for i in idx)
            deleted = len(self._deleted) - before
            if deleted:
                self._live_mask_version += 1
                self._dirty = True
                if self.config.persist_mode == "sync":
                    self._save()
            return {"deleted": deleted,
                    "live": self._count - len(self._deleted)}

    def compact(self, rebuild_ann: bool = True,
                want_remap: bool = True) -> dict:
        """Physically remove tombstoned rows. Returns an id remap
        (old -> new) for callers that track external ids; rebuilds device
        buffers and any ANN index.

        The remap covers only ids that MOVED (old >= the first deleted
        id); every live id below the first tombstone is identity and is
        omitted — a full dict over a 16-32M-row capacity store costs
        multi-GB and seconds on the 1-core host (advisor finding).
        want_remap=False skips remap construction entirely (optimize()
        discards it); rebuild_ann=False defers the ANN rebuild to the
        caller (optimize() would otherwise trigger a second minutes-scale
        build right after this one)."""
        with self._lock, self._rw.write():
            if not self._deleted:
                return {"compacted": 0, "live": self._count, "remap": {}}
            live = np.ones(self._count, bool)
            live[np.fromiter(self._deleted, np.int64,
                             len(self._deleted))] = False
            keep = np.nonzero(live)[0]
            if want_remap:
                first_del = min(self._deleted)
                moved = np.nonzero(keep >= first_del)[0]
                remap = {int(keep[j]): int(j) for j in moved}
            else:
                remap = {}
            n_removed = self._count - len(keep)
            self._host_buf[: len(keep)] = self._host_buf[keep]
            self._metadata = [self._metadata[i] for i in keep]
            self._meta_index.rebuild(self._metadata)
            self._count = len(keep)
            self._deleted.clear()
            self._live_mask_version += 1
            self._live_mask_cache = None
            self._live_mask_dev = None
            # routing/recall state was derived from the pre-compact
            # corpus — re-evaluate, exactly like clear() (review finding)
            self._auto_kind = None
            self._ann_low_recall = False
            self._ann_checked_at = 0
            self._ann_recall_estimate = None
            self._ann = None
            self._ann_stale = True
            self._reset_device(self._capacity_for(max(self._count, 1)))
            if rebuild_ann and self.config.enable_ann and self._count:
                self._refresh_ann()
            self._dirty = True
            if self.config.persist_mode == "sync":
                self._save()
            return {"compacted": n_removed, "live": self._count,
                    "remap": remap}

    def _live_host_mask(self) -> np.ndarray | None:
        """(cap,) float32 0/1 mask of live rows, or None when nothing is
        deleted (the no-mask fast path stays mask-free).

        CACHED: rebuilding O(cap) + re-uploading 4 B/row per query would
        cost ~120 ms/query at 10M rows through the tunnel (review
        finding); the mask only changes on delete/compact/clear/capacity
        change, which all bump _live_mask_version."""
        if not self._deleted:
            return None
        key = (self._cap, self._live_mask_version)
        if self._live_mask_cache is None or \
                self._live_mask_cache[0] != key:
            mask = np.ones((self._cap,), np.float32)
            mask[np.fromiter(self._deleted, np.int64,
                             len(self._deleted))] = 0.0
            self._live_mask_cache = (key, mask)
        return self._live_mask_cache[1]

    def _device_live_mask(self):
        """Device-resident live mask for deletion-only queries — one H2D
        upload per (capacity, deletion-version), not per query."""
        lm = self._live_host_mask()
        if lm is None:
            return None
        key = (self._cap, self._live_mask_version)
        if self._live_mask_dev is None or self._live_mask_dev[0] != key:
            self._live_mask_dev = (key, self._filter_mask(None, lm))
        return self._live_mask_dev[1]

    def clear(self) -> None:
        """Drop all state and wipe the directory (reference :198-209)."""
        with self._lock, self._rw.write():
            if self.store_path.exists():
                shutil.rmtree(self.store_path, ignore_errors=True)
            ensure_directory(self.store_path)
            self._count = 0
            self._host_cap = 0
            self._host_buf = None
            self._metadata = []
            self._meta_index.clear()
            self._cap = 0
            self._db = None
            self._sqnorms = None
            self._scales = None
            self._ann = None
            self._ann_stale = True
            self._auto_kind = None
            # reset the recall guard: a latched low-recall verdict from
            # the PREVIOUS corpus would silently route the repopulated
            # store to the exact scan until it doubled past the old
            # checkpoint (review finding)
            self._ann_low_recall = False
            self._ann_checked_at = 0
            self._ann_recall_estimate = None
            self._deleted = set()
            self._live_mask_cache = None
            self._live_mask_dev = None
            self._dirty = False

    # ---------------------------------------------------------------- query

    def _filter_mask(self, filter_metadata: dict,
                     host_mask: np.ndarray | None = None) -> jnp.ndarray:
        if host_mask is None:
            host_mask = self._meta_index.mask(filter_metadata, self._cap)
        return jnp.asarray(host_mask)

    def _scan_block(self) -> int:
        """Scan tile for queries: as large as divides capacity, up to 128K
        rows. Small tiles make the lax.scan long (128+ iterations at 1M rows
        compiles in minutes on TPU); capacity granularity stays at
        config.block_rows independently."""
        b = self._block
        while b * 2 <= min(self._cap, 131072) and self._cap % (b * 2) == 0:
            b *= 2
        return b

    def _use_pallas(self, k: int) -> bool:
        if not getattr(self.config, "use_pallas", True):
            return False
        if jax.default_backend() != "tpu":
            return False
        from tpu_vector_db.ops.pallas_scan import (
            MAX_PALLAS_K_BIG, pick_block_rows)
        if k > MAX_PALLAS_K_BIG:
            return False
        # int8/int4 widen the block to bf16 in VMEM — budget as itemsize 2
        # (must mirror pallas_flat_topk's block pick)
        block = pick_block_rows(
            self._d_pad, max(self._db.dtype.itemsize, 2))
        return self._cap % block == 0

    def _flat_topk(self, queries: np.ndarray, k: int,
                   filter_mask: jnp.ndarray | None):
        q = D.pad_dim(jnp.asarray(queries, jnp.float32),
                      multiple=256 if self._quant4 else 128)
        engine = ("pallas" if self._use_pallas(k)
                  else "xla")
        packed = _query_packed(
            q, self._db, np.int32(self._count), k,
            metric=self.metric,
            db_normalized=(self.metric == "cosine"),
            db_sqnorms=self._sqnorms,
            filter_mask=filter_mask,
            block_rows=self._scan_block(),
            engine=engine,
            db_scales=self._scales,
        )
        packed = np.asarray(packed)  # the one blocking D2H
        kk = packed.shape[-1] // 2
        keys = np.ascontiguousarray(packed[:, :kk]).view(np.float32)
        if self._dtype == jnp.int8:
            keys = keys * (1.0 / 127.0)  # undo the fixed quantizer scale
        return keys, packed[:, kk:]

    def _format_results(self, keys_row: np.ndarray, idx_row: np.ndarray,
                        k: int, filter_metadata: dict | None = None):
        indices, scores, metas = [], [], []
        for key, i in zip(keys_row, idx_row):
            if key == NEG_INF or len(indices) >= k:
                continue
            meta = self._metadata[int(i)]
            # exact re-check: the filter mask is hash-based (collisions are
            # ~2^-64 but correctness is contractual)
            if filter_metadata and not metadata_matches(meta, filter_metadata):
                continue
            if self.metric == "euclidean":
                raw = float(np.sqrt(max(-key, 0.0)))
            elif self.metric == "cosine":
                # bf16 matmuls can round a unit self-similarity to ~1.0002;
                # cosine scores are contractually in [-1, 1]
                raw = float(np.clip(key, -1.0, 1.0))
            else:
                raw = float(key)
            indices.append(int(i))
            scores.append(raw)
            metas.append(meta)
        return indices, scores, metas

    def query(self, query_vector, k: int = 10, filter_metadata: dict | None = None,
              use_ann: bool = True, rerank: bool = False):
        """Top-k search. Returns (indices, raw_scores, metadata) — raw scores
        follow the canonical convention in ops/distance.py.

        Routing parity with the reference (optimized_vector_store.py:116-145):
        ANN when enabled/built (oversampling k*10 under filters, post-filter),
        any ANN failure falls back to the exact scan with a warning.
        rerank: see batch_query.
        """
        arr = validate_vector_shape(query_vector, self.config.dimension)
        if arr.shape[0] != 1:
            raise ValueError("query() takes one vector; use batch_query()")
        res = self.batch_query(arr, k=k, filter_metadata=filter_metadata,
                               use_ann=use_ann, rerank=rerank)
        return res[0]

    def batch_query(self, query_vectors, k: int = 10,
                    filter_metadata: dict | None = None, use_ann: bool = True,
                    rerank: bool = False):
        """Batched top-k: list of (indices, raw_scores, metadata) per query.

        This is the method the reference's /vectors/batch_query route called
        but never implemented (SURVEY.md §2.1); on TPU it is also the fast
        path — the scan amortizes one HBM sweep over the whole batch.

        rerank=True (any lossy storage dtype — int8/int4/bfloat16): the
        engine oversamples k*4 candidates from the stored rows, then the
        candidates re-score against the ORIGINAL f32 rows on the host
        (O(4k*d) per query) and the exact top-k returns. Closes the
        quantization ranking noise (~0.005 cosine at int4-768D; int8's
        1/127 score grid) AND bf16 tie-ambiguity for callers that need
        f32-exact ordering. No-op on float32 stores (already exact).
        """
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        arr = validate_vector_shape(query_vectors, self.config.dimension)
        n_q = arr.shape[0]
        # pad the query batch to a power of two: every distinct Q shape is
        # a separate compiled device program, and through the remote-compile
        # tunnel a fresh shape costs seconds to minutes (measured: the REST
        # coalescer's variable batch sizes serialized behind recompiles)
        q_pad = 1
        while q_pad < n_q:
            q_pad *= 2
        if q_pad != n_q:
            arr = np.concatenate(
                [arr, np.repeat(arr[:1], q_pad - n_q, axis=0)])
        # READ lock only: queries share the store with each other, so
        # concurrent coalesced flushes pipeline into the device stream
        # (each one blocks its own executor thread through the tunnel
        # RTT, not every other query). Mutators hold rw.write, so host
        # bookkeeping stays a consistent snapshot and donated device
        # buffers can't be yanked mid-dispatch.
        with self._rw.read():
            live_total = self._count - len(self._deleted)
            if live_total == 0:
                return [([], [], []) for _ in range(n_q)]
            k_eff = min(int(k), live_total)
            # rerank (lossy dtypes): engine oversamples, host re-scores.
            # The oversample bounds how far a true top-k row may sink in
            # the QUANTIZED ordering and still be recovered — raise it
            # (ann_params["rerank_oversample"]) when score gaps are tight
            # relative to the quantization noise (int4: ~0.005 cosine at
            # 768D, wider at low d)
            # rerank applies to every lossy storage dtype: int8/int4
            # quantization noise AND bf16 rounding — bf16 tie-ambiguity on
            # tight clusters makes "top-10 ids" arbitrary tie-breaks (a
            # perfect index measured id-recall 0.096, BENCHMARKS.md), so
            # f32-exact ordering must be reachable on bf16 stores too
            # (VERDICT r3 item 7). float32 stores are already exact.
            rerank_active = (rerank and
                             self.config.storage_dtype != "float32")
            over = int(self.config.ann_params.get("rerank_oversample", 4))
            k_engine = (min(self._count, k_eff * max(over, 1))
                        if rerank_active else k_eff)

            # routing: ANN only pays off past the fused flat scan's
            # crossover (the exact sweep does 1M rows in ~3.4ms on a v5e);
            # ann_min_rows=0 (default) preserves reference semantics
            # (always use the index when enabled)
            min_rows = self.config.ann_params.get(
                "ann_min_rows", self.config.ann_params.get("min_rows", 0))
            # IVF large-k routing: past the Pallas probe kernel's k=32 the
            # IVF fallback scans probes through XLA gathers — TPU-measured
            # 698 ms/batch-64 at 1M x 768D k=100 vs 9.4 ms for the exact
            # big-k kernel. The exact engine also handles the filtered
            # oversample (k*10) natively via its mask stream.
            # tombstones post-filter out of ANN results like metadata
            # filters, so they share the k*10 oversample — scaled up as
            # the live fraction drops (_post_filter_fetch_k)
            fetch_k = self._post_filter_fetch_k(
                k_engine, bool(filter_metadata))
            ivf_large_k = (self._ann_kind == "ivf" and fetch_k > 32)
            # pathological-selectivity routing (r3): when the filter keeps
            # few rows, the ANN k*10 oversample returns ~selectivity*10*k
            # live hits (often zero), while the masked exact scan is exact
            # at UNCHANGED latency (the mask streams with the db blocks —
            # measured free at 1M x 768D, BENCHMARKS.md "Filtered
            # queries").
            host_mask = None
            low_sel_filter = False
            if filter_metadata:
                host_mask = self._meta_index.mask(filter_metadata, self._cap)
            live_mask = self._live_host_mask()
            if live_mask is not None:
                host_mask = (live_mask if host_mask is None
                             else host_mask * live_mask)
            if filter_metadata:
                sel_threshold = self.config.ann_params.get(
                    "filter_exact_selectivity", 0.05)
                live = float(host_mask[:max(self._count, 1)].sum())
                low_sel_filter = live < sel_threshold * self._count
            elif self._deleted:
                # heavy-deletion routing (VERDICT r3 item 5): a mostly-
                # tombstoned store serves ANN results that post-filter to
                # fewer than k live hits even under the scaled oversample,
                # while the masked exact scan is exact at UNCHANGED cost
                # (the live mask streams with the db blocks — measured
                # free, BENCHMARKS.md "Filtered queries")
                live_frac = live_total / max(self._count, 1)
                low_sel_filter = live_frac < self.config.ann_params.get(
                    "deleted_exact_live_frac", 0.25)
            # auto-mode batch routing (BENCHMARKS.md): at 1M x 768D batch-64
            # the exact sweep measures 4.43 ms vs IVF's 9.59 ms — one HBM
            # sweep amortized over the batch beats 64x nprobe bucket
            # gathers below the ~10M-row crossover. Only applies when the
            # operator delegated the choice (index_type='auto').
            auto_mode = (self.config.ann_params.get("index_type", "auto")
                         == "auto")
            high_batch_flat = (
                auto_mode and n_q >= self.config.ann_params.get(
                    "auto_batch_flat_q", 32)
                and self._count <= self.config.ann_params.get(
                    "auto_batch_flat_rows", 2_000_000))
            # _ann_stale: an append's index refresh is (or is about to be)
            # running outside this lock — the index may not cover the
            # newest rows yet, but the exact scan below does, so fresh
            # vectors are searchable IMMEDIATELY at bounded (one fused
            # sweep) latency instead of blocking behind the build
            if (use_ann and self.config.enable_ann and not ivf_large_k and
                    not high_batch_flat and not low_sel_filter and
                    self._ann is not None and not self._ann_stale and
                    self._count >= min_rows and
                    not self._ann_low_recall):
                try:
                    out = self._ann_batch_query(
                        arr, k_engine, filter_metadata)[:n_q]
                    return (self._rerank_exact(arr, out, k_eff)
                            if rerank_active else out)
                except Exception:  # noqa: BLE001 — parity: fall back to exact
                    logger.warning("ANN query failed; falling back to flat scan",
                                   exc_info=True)

            t0 = time.perf_counter()
            # polymorphic: ShardedVectorStore's override device_puts the
            # mask with the shard sharding; host_mask from the selectivity
            # check above is reused so the O(cap) metadata pass runs once
            if host_mask is None:
                mask = None
            elif filter_metadata is None:
                mask = self._device_live_mask()   # cached H2D (tombstones)
            else:
                mask = self._filter_mask(filter_metadata, host_mask)
            keys, idx = self._flat_topk(arr, k_engine, mask)
            performance_monitor.record("flat_scan_topk",
                                       time.perf_counter() - t0)
            out = [self._format_results(keys[i], idx[i], k_engine,
                                        filter_metadata)
                   for i in range(n_q)]
            return (self._rerank_exact(arr, out, k_eff)
                    if rerank_active else out)

    def _rerank_exact(self, queries: np.ndarray, results: list,
                      k: int) -> list:
        """Re-score each query's candidate list against the ORIGINAL f32
        rows (host matmul, O(candidates*d) per query) and return the
        exact top-k in the store's raw-score convention (cosine: clipped
        similarity; euclidean: distance, ascending; dot: score).
        Quantized stores are cosine-only; bf16 stores rerank under any
        metric."""
        out = []
        for qi, (indices, _scores, metas) in enumerate(results):
            if not indices:
                out.append((indices, _scores, metas))
                continue
            rows = self._host_buf[np.asarray(indices)].astype(np.float32)
            q = queries[qi].astype(np.float32)
            if self.metric == "cosine":
                rows = rows / np.maximum(
                    np.linalg.norm(rows, axis=1, keepdims=True), 1e-8)
                q = q / max(float(np.linalg.norm(q)), 1e-8)
                exact = np.clip(rows @ q, -1.0, 1.0)
                order = np.argsort(-exact)[:k]
            elif self.metric == "euclidean":
                exact = np.linalg.norm(rows - q, axis=1)
                order = np.argsort(exact)[:k]
            else:  # dot
                exact = rows @ q
                order = np.argsort(-exact)[:k]
            out.append((
                [indices[j] for j in order],
                [float(exact[j]) for j in order],
                [metas[j] for j in order]))
        return out

    # ------------------------------------------------------------------ ANN

    @property
    def _ann_kind(self) -> str:
        """'beam_graph' (hnswlib-contract graph), 'ivf' (k-means inverted
        file — seconds-scale MXU build, bucket-streamed probes), or 'flat'
        (no index: the exact fused scan serves everything).

        index_type='auto' (the default) resolves from measured routing
        signals — see _auto_pick_kind. The reference auto-routed HNSW to
        brute force below a row threshold
        (service/optimized_vector_store.py:116-145); this generalizes that
        to the richer engine set."""
        requested = self.config.ann_params.get("index_type", "auto")
        if requested != "auto":
            return requested
        if self._auto_kind is None:
            self._auto_kind = self._auto_pick_kind()
        return self._auto_kind

    def _auto_pick_kind(self) -> str:
        """Routing table measured in BENCHMARKS.md ("store routing
        guidance"): flat below the exact-scan crossover (the fused kernel
        sweeps 1M x 768D in ~3.4 ms, so an index only pays off past
        ~100K rows for batch-1 latency); IVF above it (batch-1 0.94 ms @ 1M
        at recall 1.0 — beats the graph on BOTH recall and latency on every
        measured regime, incl. tight clusters where the graph needs ef=200
        for 0.95). The beam graph stays an explicit opt-in
        (index_type='beam_graph') for filtered+incremental workloads that
        want graph semantics. High-batch queries re-route to the exact scan
        at query time (batch_query) regardless of the built index.

        The quantized capacity modes (int8/int4) follow the same
        crossover: their IVF runs in GATHER layout (index/ivf.py — probes
        gather rows from the flat matrix, no bucketized copy), so batch-1
        latency at 16-32M rows drops from the full-sweep 25-37 ms to the
        probed fraction while adding only the ~4 B/row id table."""
        flat_rows = self.config.ann_params.get("auto_flat_rows", 100_000)
        if self._count < flat_rows:
            return "flat"
        return "ivf"

    def _make_ann(self):
        p = self.config.ann_params
        if self._ann_kind == "ivf":
            from tpu_vector_db.index.ivf import IVFIndex
            return IVFIndex(
                dim=self.config.dimension, metric=self.metric,
                n_clusters=p.get("n_clusters"),
                nprobe=p.get("nprobe", 32),
                bucket_rows=p.get("bucket_rows"),
                train_iters=p.get("train_iters", 10),
                # 'gather' keeps the full bf16 row ceiling (no bucket
                # copy); quantized stores gather regardless
                layout=p.get("ivf_layout", "auto"))
        from tpu_vector_db.index.beam_graph import BeamGraphIndex
        return BeamGraphIndex(
            dim=self.config.dimension, metric=self.metric,
            M=p.get("M", 16),
            ef_construction=p.get("ef_construction", 200),
            alpha=p.get("alpha", 1.2),
            entry_cap=p.get("entry_cap", 4096),
            insert_budget_div=p.get("insert_budget_div"),
            refine_budget_div=p.get("refine_budget_div"))

    def _ann_search(self, queries_prepared, fetch_k: int):
        """Uniform index dispatch: graph takes ef_search, IVF takes nprobe.
        Keys come back in the store's final convention (int8's raw x127
        quantizer scale is divided out here, mirroring _flat_topk)."""
        p = self.config.ann_params
        if self._ann_kind == "ivf":
            ids, keys = self._ann.search(
                queries_prepared, self._db, self._count, k=fetch_k,
                nprobe=p.get("nprobe"), sqnorms=self._sqnorms,
                scales=self._scales)
            if self.config.storage_dtype == "int8":
                keys = np.where(np.isfinite(keys), keys * (1.0 / 127.0),
                                keys)
            return ids, keys
        ef = max(p.get("ef_search", 100), fetch_k)
        return self._ann.search(
            queries_prepared, self._db, self._count, k=fetch_k,
            ef_search=ef, sqnorms=self._sqnorms)

    def _ann_quant_kwargs(self) -> dict:
        """Extra IVF build/add kwargs for quantized storage (the int4
        per-row scales drive k-means dequantization; graphs never get
        here — config forbids beam_graph on quantized stores)."""
        if self._ann_kind == "ivf" and self._quant4:
            return {"scales": self._scales}
        return {}

    def _refresh_ann(self, incremental_from: int | None = None) -> None:
        """Build or incrementally extend the ANN graph (true incremental
        adds — the reference rebuilt its whole HNSW on every add,
        optimized_vector_store.py:110-113). The index searches against the
        store's own device matrix; it never copies vector data.

        Runs under _ann_build_lock only (never the store lock): queries
        stay live during a build, routed to the exact scan while
        _ann_stale. Works from a count snapshot; if rows land mid-build,
        staleness is restored so the next refresh covers the new tail."""
        with self._ann_build_lock:
            count = self._count
            if count == 0:
                return
            if self.config.ann_params.get("index_type", "auto") == "auto":
                # re-evaluate the routing on every refresh: a store growing
                # past the flat crossover promotes to IVF (full build), one
                # shrinking below it (clear/rebuild) demotes back to the
                # exact scan
                new_kind = self._auto_pick_kind()
                if new_kind != self._auto_kind:
                    self._auto_kind = new_kind
                    self._ann = None
            if self._ann_kind == "flat":
                self._ann = None
                self._ann_stale = False
                return
            if self._ann is None:
                self._ann = self._make_ann()
            backend = self.config.ann_params.get("build_backend", "tpu")
            if self._ann_kind == "ivf":
                backend = "tpu"  # k-means trains on device; no native builder
            if incremental_from in (None, 0) or \
                    self._ann.size != incremental_from:
                if backend in ("cpu", "auto"):
                    from tpu_vector_db.index import native
                    if native.available():
                        self._ann.build_cpu(self._host_buf, count)
                    else:
                        if backend == "cpu":
                            logger.warning("native builder unavailable; "
                                           "falling back to TPU build")
                        self._ann.build(self._db, count,
                                        sqnorms=self._sqnorms,
                                        **self._ann_quant_kwargs())
                else:
                    self._ann.build(self._db, count, sqnorms=self._sqnorms,
                                    **self._ann_quant_kwargs())
            else:
                # incremental adds always extend on device (works on graphs
                # from either builder)
                self._ann.add(self._db, incremental_from, count,
                              sqnorms=self._sqnorms,
                              **self._ann_quant_kwargs())
            if self.config.persist_mode != "off":
                self._ann.save(self.store_path)
            # re-estimate recall after every full build, and after
            # incremental adds once the store has doubled since the last
            # estimate. Runs BEFORE the stale flag clears: concurrent
            # queries must not route to an index the remediation pass is
            # still mutating (refine rebinds graph arrays).
            if self._ann_checked_at == 0 or \
                    count >= 2 * self._ann_checked_at:
                self._ann_self_check()
            # conservative clear: if an add raced in mid-build (possible
            # only for admin callers that did not hold rw.read), restore
            # staleness so the pending _refresh_ann_tail extends over the
            # uncovered rows. Order matters — clearing after the count
            # check could erase a staleness mark for rows this build
            # never saw.
            self._ann_stale = False
            if self._count != count:
                self._ann_stale = True

    def _ann_self_check(self, sample: int = 100, k: int = 10) -> None:
        """Sampled recall@k of the ANN index vs the exact scan.

        Guard the reference never had: with ann enabled on adversarial data
        (uniform high-dim — distance concentration) a graph index can
        silently serve ~0.35 recall. Sample stored vectors, self-query both
        paths, and (a) auto-remediate below ``remediate_target`` (default
        0.98): IVF escalates nprobe in x2 steps, the beam graph runs a
        full-budget refine pass (see _remediate_low_recall); (b) warn if
        still below ``recall_warn``; (c) route queries back to the exact
        scan below
        ``recall_floor`` (default 0.50). Costs one flat batch query (~ms)
        on healthy regimes; remediation only fires on degraded ones."""
        p = self.config.ann_params
        if not p.get("self_check", True) or self._count < 2 \
                or self._ann is None:
            return
        # power-of-two sample: every distinct query-batch shape is a
        # fresh multi-minute device compile through the axon tunnel, and
        # batch_query pins serving shapes to powers of two for exactly
        # this reason — a (100, d) self-check batch compiled TWO one-off
        # programs inside the add lock (review finding)
        n = 1 << (min(sample, self._count).bit_length() - 1)
        k_eff = min(k, self._count)
        rng = np.random.default_rng(0)
        rows = np.sort(rng.choice(self._count, size=n, replace=False))
        queries = self._host_buf[rows].astype(np.float32)
        flat_keys, flat_idx = self._flat_topk(queries, k_eff, None)
        # a neighbor counts if its id is in the exact top-k OR its score
        # ties the exact k-th score within bf16 tolerance: on tightly
        # clustered data hundreds of scores collide at bf16 precision and
        # id-set recall is an arbitrary tie-break, not index quality
        # (measured: a perfect graph scored id-recall 0.096 at 300K x 768D
        # while every neighbor matched the exact 10th score — see
        # BENCHMARKS.md tie-ambiguity note)
        kth = np.asarray(flat_keys, np.float32)[:, k_eff - 1]
        tol = 0.004 * np.maximum(1.0, np.abs(kth))
        exact_sets = [{int(x) for x in flat_idx[i]} for i in range(n)]
        prepared = self._prepare_queries(queries)

        def estimate() -> float:
            labels, ann_keys = self._ann_search(prepared, k_eff)
            labels = np.asarray(labels)
            ann_keys = np.asarray(ann_keys, np.float32)
            hits = 0
            for i in range(n):
                for j in range(k_eff):
                    lab = int(labels[i, j])
                    if lab < 0:
                        continue
                    if lab in exact_sets[i] \
                            or ann_keys[i, j] >= kth[i] - tol[i]:
                        hits += 1
            return hits / float(n * k_eff)

        est = estimate()
        warn = p.get("recall_warn", 0.90)
        # remediation aims HIGHER than the warn threshold: the parity
        # contract is beating an HNSW yardstick that serves ~0.958 on
        # uniform regimes (RECALL_PARITY_r04.json), so stopping the
        # escalation at 0.90 would leave a default store below it
        target = p.get("remediate_target", 0.98)
        if est < target and p.get("auto_remediate", True):
            est = self._remediate_low_recall(est, target, estimate)
        self._ann_recall_estimate = est
        self._ann_checked_at = self._count
        floor = p.get("recall_floor", 0.50)
        was_low = self._ann_low_recall
        self._ann_low_recall = est < floor
        if self._ann_low_recall:
            logger.warning(
                "ANN sampled recall@%d = %.3f < floor %.2f at %d rows; "
                "routing queries to the exact scan (data likely lacks "
                "neighborhood structure)", k_eff, est, floor, self._count)
        elif est < warn:
            logger.warning(
                "ANN sampled recall@%d = %.3f below %.2f at %d rows; "
                "consider raising ef_search/M or using the exact scan",
                k_eff, est, warn, self._count)
        elif was_low:
            logger.info("ANN sampled recall recovered to %.3f; "
                        "index re-enabled", est)

    def _remediate_low_recall(self, est: float, target: float,
                              estimate) -> float:
        """Self-healing escalation when the sampled-recall guard trips.

        The reference shipped fixed-knob operating points
        (performance/hnsw_index.py:79) and silently degraded on hard
        regimes; here a default-config store repairs itself (r4 verdict
        item 1 — at fast-build defaults, uniform 100Kx64 served 0.917).
        Escalation runs until the estimate clears ``remediate_target``
        (default 0.98 — above the 0.958 HNSW-yardstick bar, with slack
        for the bf16 tie tolerance in the estimator):

        * IVF: recall is pure probe coverage, so double nprobe (x2 steps,
          re-estimating after each) up to ``remediate_nprobe_max``
          (default: the built cluster count — full probe is the exact
          scan, so the loop always terminates at recall 1.0; queries in
          such a regime cost the same as the flat route the floor guard
          would have picked anyway). The escalated value is written back
          to ann_params so it persists in the manifest.
        * beam graph: run full-budget refine passes over the existing
          graph (refine_budget_div=1 — the measured buy-back for the
          fast-build defaults: 0.991 vs 0.917 on uniform 100Kx64, commit
          086d48f) up to ``remediate_max_refines`` (default 2) times.

        Disabled with ann_params["auto_remediate"]=False. Never fires on
        regimes where the estimate already clears remediate_target
        (clustered 1M x 768D estimates ~0.99), so healthy build times are
        unchanged.
        """
        p = self.config.ann_params
        changed = False
        if self._ann_kind == "ivf" and hasattr(self._ann, "nprobe"):
            start = int(p.get("nprobe", self._ann.nprobe))
            cents = getattr(self._ann, "_centroids", None)
            built_clusters = 0 if cents is None else len(cents)
            cap = int(p.get("remediate_nprobe_max",
                            built_clusters or max(256, start * 8)))
            nprobe = start
            while est < target and nprobe < cap:
                nprobe = min(nprobe * 2, cap)
                self._ann.nprobe = nprobe
                p["nprobe"] = nprobe
                changed = True
                est = estimate()
                logger.warning(
                    "ANN recall remediation: nprobe %d -> %d, sampled "
                    "recall %.3f", start, nprobe, est)
        elif self._ann_kind == "beam_graph" and hasattr(self._ann, "refine"):
            max_refines = int(p.get("remediate_max_refines", 2))
            old_div = self._ann.refine_budget_div
            self._ann.refine_budget_div = 1
            try:
                for i in range(max_refines):
                    if est >= target:
                        break
                    self._ann.refine(self._db, sqnorms=self._sqnorms,
                                     passes=1)
                    changed = True
                    est = estimate()
                    logger.warning(
                        "ANN recall remediation: full-budget refine pass "
                        "%d/%d, sampled recall %.3f", i + 1, max_refines,
                        est)
            finally:
                self._ann.refine_budget_div = old_div
        # escalation mutated the index (graph edges / persisted nprobe):
        # re-write the sidecars so a reopen serves the healed index
        if changed and self.config.persist_mode != "off" and self.store_path:
            self._ann.save(self.store_path)
        return est

    def _prepare_queries(self, arr: np.ndarray) -> jnp.ndarray:
        q = jnp.asarray(arr, jnp.float32)
        if self.metric == "cosine":
            q = D.l2_normalize(q)
        # int4 stores pad d to a 256 multiple (packed minor dim stays a
        # lane tile) — queries must match the stored width
        return D.pad_dim(q, multiple=256 if self._quant4 else 128)

    def _post_filter_fetch_k(self, k: int, filtered: bool) -> int:
        """Oversampled ANN fetch size for post-filtered queries: the
        reference's k*10 heuristic (optimized_vector_store.py:123),
        scaled up as tombstone density rises — at live fraction f an ANN
        fetch post-filters to ~f*fetch live hits, so the oversample grows
        ~1/f (capped at 10x the base, i.e. live_frac floor 0.1; below
        the deleted_exact_live_frac routing threshold the masked exact
        scan serves the query instead)."""
        if not (filtered or self._deleted):
            return k
        live_frac = ((self._count - len(self._deleted))
                     / max(self._count, 1))
        return int(min(self._count,
                       math.ceil(k * 10 / max(live_frac, 0.1))))

    def _ann_batch_query(self, arr: np.ndarray, k: int,
                         filter_metadata: dict | None):
        # oversample under filters AND tombstones, parity with reference
        # k*10 heuristic (deleted ids post-filter exactly like filters),
        # scaled by tombstone density
        fetch_k = self._post_filter_fetch_k(k, bool(filter_metadata))
        labels, keys = self._ann_search(self._prepare_queries(arr), fetch_k)
        out = []
        for row_labels, row_keys in zip(labels, keys):
            indices, scores, metas = [], [], []
            for i, key in zip(row_labels, row_keys):
                i = int(i)
                if i < 0 or len(indices) >= k or i in self._deleted:
                    continue
                meta = self._metadata[i]
                if filter_metadata and not metadata_matches(meta, filter_metadata):
                    continue
                if self.metric == "euclidean":
                    raw = float(np.sqrt(max(-key, 0.0)))
                elif self.metric == "cosine":
                    # same [-1, 1] contract as the flat path; bf16 rounding
                    # can push a unit self-similarity slightly past 1
                    raw = float(np.clip(key, -1.0, 1.0))
                else:
                    raw = float(key)
                indices.append(i)
                scores.append(raw)
                metas.append(meta)
            out.append((indices, scores, metas))
        return out

    # ------------------------------------------------------------- lifecycle

    def optimize(self) -> dict:
        """Compact tombstones, re-pack device buffers to minimal capacity
        and rebuild the ANN index. Implements for real what the reference's
        /admin/optimize_store and /performance/optimize called on a
        nonexistent method (§2.1).

        NOTE: compaction REMAPS row ids (ids are positional). Callers that
        track external ids should use compact() directly for the
        old->new remap, or avoid optimize() while tombstones exist."""
        # defer the ANN rebuild to the single _refresh_ann below — compact's
        # own rebuild would double a minutes-scale TPU build (advisor
        # finding); the remap is discarded here, skip building it
        compacted = 0
        if self._deleted:
            compacted = self.compact(rebuild_ann=False,
                                     want_remap=False)["compacted"]
        t0 = time.perf_counter()
        with self._lock, self._rw.write():
            target = self._capacity_for(max(self._count, 1))
            if target != self._cap and self._count:
                self._reset_device(target)
            if self.config.enable_ann and self._count:
                self._refresh_ann()
            if self._db is not None:
                # true D2H sync: block_until_ready under-reports on axon
                # (CLAUDE.md), so the returned duration would exclude the
                # repack work still in flight
                float(jnp.sum(self._db[0, :1].astype(jnp.float32)))
        return {"optimized": True, "capacity": self._cap,
                "count": self._count, "compacted": compacted,
                "duration_ms": (time.perf_counter() - t0) * 1e3}

    def warmup(self, batch: int = 8, k: int = 10) -> dict:
        """Compile the hot query path ahead of traffic (the reference's
        ``_warmup_kernels`` was a pass stub, optimized_vector_store.py:194)."""
        with self._lock:
            if self._count == 0:
                return {"warmed": False, "reason": "empty store"}
            t0 = time.perf_counter()
            dummy = np.zeros((batch, self.config.dimension), np.float32)
            dummy[:, 0] = 1.0
            self.batch_query(dummy, k=min(k, self._count), use_ann=False)
            self.batch_query(dummy[:1], k=min(k, self._count), use_ann=False)
            if self.config.enable_ann and self._ann is not None:
                # also compile the ANN probe program — warming only the
                # exact path left the FIRST production query paying the
                # multi-minute device compile (review finding)
                self.batch_query(dummy[:1], k=min(k, self._count))
            return {"warmed": True,
                    "duration_ms": (time.perf_counter() - t0) * 1e3}

    def flush(self) -> None:
        with self._lock:
            if self._dirty and self.config.persist_mode != "off":
                self._save()

    def close(self) -> None:
        self.flush()

    def _save(self) -> None:
        live = (self._host_buf[: self._count] if self._host_buf is not None
                else np.zeros((0, self.config.dimension), np.float32))
        with self._file_lock:
            persistence.save_store(
                self.store_path, live, self._metadata, self.config)
            # tombstones persist separately so row ids stay stable across
            # reloads (atomic tmp+rename like the main files)
            tpath = self.store_path / "tombstones.npz"
            if self._deleted:
                from tpu_vector_db.utils.fs import atomic_save_npz
                atomic_save_npz(tpath, ids=np.fromiter(
                    sorted(self._deleted), np.int64, len(self._deleted)))
            elif tpath.exists():
                tpath.unlink()
        self._dirty = False

    def _load(self) -> None:
        vectors, metadata = persistence.load_store(self.store_path, self.config)
        if vectors is None or vectors.shape[0] == 0:
            return
        n = vectors.shape[0]
        self._ensure_host_cap(n)
        self._host_buf[:n] = vectors
        self._count = n
        self._metadata = metadata
        self._meta_index.rebuild(metadata)
        tpath = self.store_path / "tombstones.npz"
        if tpath.exists():
            try:
                with np.load(tpath) as z:
                    self._deleted = {int(i) for i in z["ids"]
                                     if 0 <= i < n}
            except Exception:  # noqa: BLE001 — corrupt sidecar: all live
                logger.exception("corrupt tombstones at %s; ignoring", tpath)
                self._deleted = set()
        self._reset_device(self._capacity_for(n))
        if self.config.enable_ann:
            self._load_ann_sidecar(n)

    def _load_ann_sidecar(self, n: int) -> None:
        """Reload the persisted index (or rebuild). ShardedVectorStore
        overrides this — the base path would construct a SINGLE-CHIP
        index and happily load a stale ann_ivf.npz into a sharded store,
        after which every query raised AttributeError on the missing
        make_search_fn (review finding)."""
        if self._ann_kind == "flat":   # auto below the crossover
            self._ann_stale = False
            return
        self._ann = self._make_ann()
        if self._ann.load(self.store_path) and self._ann.size == n:
            self._ann_stale = False
        else:
            self._refresh_ann()

    def get_vectors(self, indices: list[int] | None = None) -> np.ndarray:
        """Fetch rows by id (all LIVE rows when indices is None).
        Tombstoned or out-of-range ids raise KeyError — the validation
        belongs here, not in the HTTP route (review finding: library
        callers silently received deleted rows / bare IndexError)."""
        with self._lock:
            if indices is None:
                live = (self._host_buf[: self._count] if self._count else
                        np.zeros((0, self.config.dimension), np.float32))
                if not self._deleted:
                    return live.copy()
                keep = np.array([i for i in range(self._count)
                                 if i not in self._deleted], np.int64)
                return live[keep]
            idx = np.asarray(indices, np.int64)
            bad = [int(i) for i in idx
                   if i < 0 or i >= self._count or int(i) in self._deleted]
            if bad:
                raise KeyError(
                    f"ids not found (deleted or out of range): {bad[:10]}")
            return self._host_buf[idx].copy()

    def get_metadata(self, indices: list[int]) -> list[dict]:
        """Metadata for live ids (same validation as get_vectors)."""
        with self._lock:
            bad = [int(i) for i in indices
                   if i < 0 or i >= self._count or int(i) in self._deleted]
            if bad:
                raise KeyError(
                    f"ids not found (deleted or out of range): {bad[:10]}")
            return [self._metadata[int(i)] for i in indices]

    def get_stats(self) -> dict:
        with self._lock:
            device_cols = self._d_pad // 2 if self._quant4 else self._d_pad
            device_mb = (self._cap * device_cols *
                         jnp.dtype(self._dtype).itemsize) / 2**20
            host_mb = (self._host_cap * self.config.dimension * 4) / 2**20
            return {
                "vector_count": self._count - len(self._deleted),
                "deleted_count": len(self._deleted),
                "dimension": self.config.dimension,
                "metric": self.metric,
                "index_type": self._ann_kind if (self.config.enable_ann and
                                                 self._ann is not None) else "flat",
                "index_type_requested": self.config.ann_params.get(
                    "index_type", "auto"),
                "storage_dtype": self.config.storage_dtype,
                "device_capacity": self._cap,
                "ann_recall_estimate": self._ann_recall_estimate,
                # the field the reference omitted though its monitors summed
                # it (SURVEY.md §2.1)
                "memory_usage_mb": round(device_mb + host_mb, 3),
            }


def create_vector_store(store_path: str | Path,
                        dimension: int = 384, metric: str = "cosine",
                        **kwargs) -> TPUVectorStore:
    """Factory, parity with create_optimized_vector_store (reference :244)."""
    cfg = VectorStoreConfig(dimension=dimension, metric=metric, **kwargs)
    return TPUVectorStore(store_path, cfg)
