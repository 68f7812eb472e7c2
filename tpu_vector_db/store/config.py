"""Store configuration.

Parity with ``MLXVectorStoreConfig`` (reference
service/optimized_vector_store.py:51-57: dimension=384, metric="cosine",
enable_hnsw=False, jit_compile=True) plus the TPU-specific knobs the
reference had no equivalent for (storage dtype, block size, persistence
policy, sharding).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field, asdict

VALID_METRICS = ("cosine", "euclidean", "dot_product")
VALID_DTYPES = ("float32", "bfloat16", "int8", "int4")
VALID_PERSIST = ("sync", "lazy", "off")

# Device HBM budget for the capacity guard. Default: TPU v5e = 16 GiB/chip;
# override with VDB_HBM_BYTES (read at check time so tests and multi-tenant
# deployments can tune it). 15% headroom is left for XLA scratch, query
# buffers, and the scan's output tiles.
_DEFAULT_HBM_BYTES = 16 * 1024 ** 3
_HBM_USABLE_FRACTION = 0.85

_ITEM_BYTES = {"float32": 4.0, "bfloat16": 2.0, "int8": 1.0, "int4": 0.5}


class StoreCapacityError(ValueError):
    """Requested row capacity cannot fit the device HBM budget.

    Raised at store creation / capacity growth instead of the opaque XLA
    OOM the reference hit (it never validated size at all —
    service/models.py:112-127 checked only dimension ranges). The message
    names the max feasible rows and the int8/int4 capacity modes."""


@dataclass
class VectorStoreConfig:
    dimension: int = 384
    metric: str = "cosine"
    # ANN index (TPU batched-beam-search graph; reference: enable_hnsw)
    enable_ann: bool = False
    ann_params: dict = field(default_factory=lambda: {
        # same operating-point knobs as the reference's hnswlib wrapper
        # (performance/hnsw_index.py:44,79): M, ef_construction, ef_search
        "M": 16, "ef_construction": 200, "ef_search": 100,
    })
    # Other recognized ann_params keys (all optional; see vector_store.py
    # and BENCHMARKS.md for the measured trade-offs):
    #   index_type ("auto"|"flat"|"ivf"|"beam_graph"), min_rows,
    #   auto_flat_rows, auto_batch_flat_q/_rows (auto-routing crossovers),
    #   build_backend ("tpu"|"cpu"|"auto"), alpha, entry_cap,
    #   insert_budget_div / refine_budget_div (graph build budgets —
    #   defaults 3/2 are ~2x faster; set 1/1 on uniform low-dim data:
    #   0.991 vs 0.917 recall @ uniform 100Kx64),
    #   n_clusters, nprobe, bucket_rows, train_iters, ivf_layout (IVF),
    #   rerank_oversample, self_check, recall_floor, recall_warn,
    #   filter_exact_selectivity, deleted_exact_live_frac (routing guards),
    #   auto_remediate (default True: when the sampled-recall self-check
    #   lands below remediate_target (default 0.98 — above the 0.958
    #   HNSW-yardstick parity bar), IVF doubles nprobe up to
    #   remediate_nprobe_max (default: the built cluster count, i.e. full
    #   probe = exact) and the beam graph runs up to remediate_max_refines
    #   full-budget refine passes — default-config stores self-heal
    #   instead of silently serving low recall).
    # TPU storage dtype for the device-resident matrix. bf16 halves HBM
    # traffic (the flat-scan bottleneck) at ~1e-3 score error.
    storage_dtype: str = "float32"
    # rows per streamed scan block; device capacity grows in these units
    block_rows: int = 8192
    initial_capacity: int = 8192
    # "sync": write-through on every add (reference behavior,
    # optimized_vector_store.py:218-223); "lazy": dirty-flag + explicit
    # flush()/close(); "off": in-memory only.
    persist_mode: str = "sync"
    jit_compile: bool = True  # kept for config parity; scans are always jitted
    # fused Pallas scan kernel on TPU (filters stream into the kernel;
    # k <= 1024 via the bitonic big-k variant)
    use_pallas: bool = True

    def __post_init__(self) -> None:
        if self.metric not in VALID_METRICS:
            raise ValueError(
                f"metric must be one of {VALID_METRICS}, got {self.metric!r}")
        if self.storage_dtype not in VALID_DTYPES:
            raise ValueError(
                f"storage_dtype must be one of {VALID_DTYPES}, got "
                f"{self.storage_dtype!r}")
        if self.persist_mode not in VALID_PERSIST:
            raise ValueError(
                f"persist_mode must be one of {VALID_PERSIST}, got "
                f"{self.persist_mode!r}")
        if self.storage_dtype in ("int8", "int4"):
            # int8/int4 are CAPACITY modes: rows are unit-norm (int8:
            # fixed 127 scale; int4: per-row scale streamed into the
            # kernel, two nibbles per byte). Cosine-only (euclidean/dot
            # rows are unnormalized). Engines: the exact fused scan and
            # gather-layout IVF (probes gather rows from the flat matrix
            # — no bucketized copy, which could not fit at capacity
            # scale); the beam graph is not supported on quantized rows.
            if self.metric != "cosine":
                raise ValueError(
                    f"storage_dtype={self.storage_dtype!r} requires "
                    "metric='cosine' (rows must be unit-norm for the "
                    "quantizer)")
            itype = self.ann_params.get("index_type", "auto")
            if self.enable_ann and itype not in ("auto", "flat", "ivf"):
                raise ValueError(
                    f"storage_dtype={self.storage_dtype!r} supports "
                    "index_type auto|flat|ivf (gather-layout IVF); "
                    f"got {itype!r}")
        if self.dimension < 1 or self.dimension > 8192:
            raise ValueError(f"dimension out of range: {self.dimension}")
        itype = self.ann_params.get("index_type", "auto")
        if itype not in ("auto", "flat", "beam_graph", "ivf"):
            raise ValueError(
                f"index_type must be auto|flat|beam_graph|ivf, got {itype!r}")
        # HBM guard at creation: an over-budget initial_capacity fails
        # fast with remediation guidance instead of an XLA OOM later
        self.check_device_budget(self.initial_capacity)

    # ------------------------------------------------------- HBM budget

    def device_bytes_for(self, rows: int) -> int:
        """Estimated device-HBM bytes at a given row capacity.

        Terms mirror what the store actually materializes
        (vector_store.py _reset_device + the ANN device mirrors):
        padded row matrix, euclidean sqnorms, int4 per-row scales, and a
        per-row index overhead (beam graph: M*2 int32 edges + f32 edge
        keys; IVF: ~6 B/row id table with bucket slack)."""
        mult = 256 if self.storage_dtype == "int4" else 128
        d_pad = ((self.dimension + mult - 1) // mult) * mult
        per_row = _ITEM_BYTES[self.storage_dtype] * d_pad
        if self.metric == "euclidean":
            per_row += 4.0                      # f32 sqnorms
        if self.storage_dtype == "int4":
            per_row += 4.0                      # f32 per-row scales
        if self.enable_ann:
            itype = self.ann_params.get("index_type", "auto")
            if itype == "beam_graph":
                m = int(self.ann_params.get("M", 16))
                per_row += m * 2 * 8.0          # edges i32 + edge keys f32
            else:                               # IVF (auto routes here)
                per_row += 6.0                  # bucket id table + slack
        return int(rows * per_row)

    @staticmethod
    def device_budget_bytes() -> int:
        return int(int(os.environ.get("VDB_HBM_BYTES", _DEFAULT_HBM_BYTES))
                   * _HBM_USABLE_FRACTION)

    def max_feasible_rows(self, budget: int | None = None) -> int:
        budget = budget if budget is not None else self.device_budget_bytes()
        return int(budget // max(self.device_bytes_for(1), 1))

    def check_device_budget(self, rows: int,
                            budget: int | None = None) -> None:
        """Raise StoreCapacityError if ``rows`` cannot fit on-device.

        Called at store construction (initial_capacity), before every
        capacity doubling in add_vectors, and by the admin create_store
        route against the request's expected_rows — so a too-big f32
        store is a clean 4xx naming the quantized capacity modes, not an
        XLA OOM on first add (r4 verdict item 8)."""
        budget = budget if budget is not None else self.device_budget_bytes()
        need = self.device_bytes_for(rows)
        if need <= budget:
            return
        msg = (f"{rows} rows x {self.dimension}D ({self.storage_dtype}) "
               f"needs ~{need / 1024**3:.1f} GiB device HBM; budget is "
               f"{budget / 1024**3:.1f} GiB (max ~{self.max_feasible_rows(budget)} "
               f"rows at this config)")
        if self.storage_dtype in ("float32", "bfloat16"):
            # initial_capacity=1: the alt config must not itself trip the
            # creation-time guard under a tiny test budget
            alt = VectorStoreConfig(
                dimension=self.dimension, metric="cosine",
                storage_dtype="int4", enable_ann=self.enable_ann,
                ann_params={"index_type": "ivf"}, initial_capacity=1)
            msg += (". Capacity modes fit more: storage_dtype='int8' or "
                    f"'int4' (~{alt.max_feasible_rows(budget)} rows at "
                    "int4, cosine-only)")
        raise StoreCapacityError(msg)

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "VectorStoreConfig":
        known = {k: v for k, v in d.items() if k in cls.__dataclass_fields__}
        return cls(**known)
