"""Store configuration.

Parity with ``MLXVectorStoreConfig`` (reference
service/optimized_vector_store.py:51-57: dimension=384, metric="cosine",
enable_hnsw=False, jit_compile=True) plus the TPU-specific knobs the
reference had no equivalent for (storage dtype, block size, persistence
policy, sharding).
"""

from __future__ import annotations

from dataclasses import dataclass, field, asdict

VALID_METRICS = ("cosine", "euclidean", "dot_product")
VALID_DTYPES = ("float32", "bfloat16", "int8", "int4")
VALID_PERSIST = ("sync", "lazy", "off")


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
    #   filter_exact_selectivity, deleted_exact_live_frac (routing guards).
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

    def to_dict(self) -> dict:
        return asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "VectorStoreConfig":
        known = {k: v for k, v in d.items() if k in cls.__dataclass_fields__}
        return cls(**known)
