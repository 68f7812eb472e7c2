"""tpu_vector_db — a TPU-native vector index-and-query engine.

Built from scratch with the capabilities of the mlx-vector-db reference
(multi-tenant vector stores, exact + ANN search, REST serving, SDK, RAG
pipeline), redesigned idiomatically for TPUs: JAX/XLA for the compute path,
Pallas kernels for the fused distance+top-k scan, and jax.sharding meshes for
multi-chip scale-out (a capability the single-device reference never had).

Layer map (see SURVEY.md for the reference analysis this build targets):

    ops/        distance + top-k kernels (XLA baseline + Pallas fused scan)
    index/      flat scan and TPU-friendly ANN (batched beam search graph index)
    store/      vector store: device-resident matrix, metadata, persistence
    parallel/   device mesh, sharded stores, cross-chip top-k merge
    service/    error taxonomy, circuit breakers, retries, degradation, managers
    api/        aiohttp REST serving layer (routes, middleware, models)
    security/   API-key auth
    monitoring/ metrics registry (Prometheus exposition), health checks
    core/       structured logging
    sdk/        async Python client (httpx)
    pipeline/   embedding models + RAG pipeline
    utils/      shared helpers
"""

__version__ = "0.1.0"

from tpu_vector_db.core.runtime import setup_runtime as _setup_runtime

_setup_runtime()

from tpu_vector_db.store.config import VectorStoreConfig  # noqa: F401,E402
from tpu_vector_db.store.vector_store import (  # noqa: F401
    TPUVectorStore,
    create_vector_store,
)
