"""Embedding + RAG pipeline.

Counterpart of the reference's integrations/mlx_lm_pipeline.py (SURVEY.md
§2.K: model registry, compiled pooling kernels, embedding model with lazy
load + warmup, text pipeline over a store, RAG pipeline with
sentence-boundary chunking and context budgeting, factory with model
recommendation, benchmark) — rebuilt on JAX/Flax. Because this image has no
model-weight egress, the default encoder is a deterministic hashing
projection (CI-safe, dependency-free); the Flax transformer encoder loads
real weights from a local path when available.
"""

from tpu_vector_db.pipeline.encoders import (  # noqa: F401
    EncoderConfig,
    EMBEDDING_MODEL_REGISTRY,
    HashingEncoder,
    FlaxTransformerEncoder,
    create_encoder,
)
from tpu_vector_db.pipeline.pipeline import (  # noqa: F401
    EmbeddingPipeline,
    RAGPipeline,
    PipelineFactory,
    chunk_text,
)
