"""Embedding + RAG pipeline tests (reference had none for its pipeline)."""

import numpy as np
import pytest

from tpu_vector_db.pipeline import (
    EMBEDDING_MODEL_REGISTRY, EmbeddingPipeline, PipelineFactory, RAGPipeline,
    chunk_text, create_encoder)
from tpu_vector_db.store import TPUVectorStore, VectorStoreConfig

DOCS = [
    "The TPU is an accelerator for machine learning workloads. "
    "It excels at large matrix multiplications in bfloat16. "
    "The MXU systolic array performs the bulk of the FLOPs.",
    "Vector databases store embeddings and answer nearest-neighbor "
    "queries. Recall at k measures the fraction of true neighbors found. "
    "HNSW is a popular graph index for approximate search.",
    "Cooking pasta requires boiling salted water. "
    "Add the pasta and stir occasionally until al dente. "
    "Reserve some pasta water for the sauce.",
]


class TestEncoders:
    def test_hashing_encoder_deterministic(self):
        enc = create_encoder("hash-256")
        a = enc.encode(["hello world", "foo bar"])
        b = enc.encode(["hello world", "foo bar"])
        np.testing.assert_allclose(a, b, atol=1e-6)
        assert a.shape == (2, 256)
        # normalized
        np.testing.assert_allclose(np.linalg.norm(a, axis=1), 1.0, atol=1e-5)

    def test_hashing_encoder_semantics(self):
        enc = create_encoder("hash-384")
        e = enc.encode(["tpu matrix hardware", "tpu matrix hardware fast",
                        "pasta cooking recipe"])
        sim_close = float(e[0] @ e[1])
        sim_far = float(e[0] @ e[2])
        assert sim_close > sim_far

    def test_empty_text(self):
        enc = create_encoder("hash-256")
        out = enc.encode(["", "non-empty"])
        assert np.all(np.isfinite(out))

    def test_flax_encoder_tiny(self):
        enc = create_encoder("minilm-l6-384", num_layers=1, num_heads=2,
                             hidden_dim=32, mlp_dim=64, dimension=384,
                             vocab_size=1000, dtype="float32")
        out = enc.encode(["a small test"])
        assert out.shape == (1, 384)
        assert np.all(np.isfinite(out))
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0,
                                   atol=1e-4)

    def test_registry_and_stats(self):
        assert "bge-base-768" in EMBEDDING_MODEL_REGISTRY
        enc = create_encoder("hash-256")
        enc.encode(["x"])
        s = enc.get_stats()
        assert s["texts"] == 1 and s["dimension"] == 256

    def test_unknown_model_raises(self):
        with pytest.raises(KeyError):
            create_encoder("nope-123")


class TestChunker:
    def test_short_text_single_chunk(self):
        assert chunk_text("hello world", chunk_size=100) == ["hello world"]

    def test_empty(self):
        assert chunk_text("   ", chunk_size=10) == []

    def test_chunks_cover_text_with_overlap(self):
        text = ("Sentence one is here. Sentence two follows. " * 20).strip()
        chunks = chunk_text(text, chunk_size=120, overlap=30)
        assert len(chunks) > 3
        assert all(len(c) <= 120 for c in chunks)
        # sentence-boundary preference: most chunks end with punctuation
        enders = sum(1 for c in chunks[:-1] if c.rstrip()[-1] in ".!?")
        assert enders >= len(chunks) // 2

    def test_no_infinite_loop_on_unbreakable(self):
        chunks = chunk_text("x" * 1000, chunk_size=100, overlap=99)
        assert sum(len(c) for c in chunks) >= 1000


class TestPipeline:
    def test_dimension_mismatch_raises(self, tmp_store_path):
        enc = create_encoder("hash-256")
        store = TPUVectorStore(tmp_store_path, VectorStoreConfig(
            dimension=384, persist_mode="off"))
        with pytest.raises(ValueError):
            EmbeddingPipeline(enc, store)

    def test_process_and_search(self, tmp_store_path):
        enc = create_encoder("hash-384")
        store = TPUVectorStore(tmp_store_path, VectorStoreConfig(
            dimension=384, persist_mode="off"))
        pipe = EmbeddingPipeline(enc, store)
        out = pipe.process_texts(DOCS, [{"src": i} for i in range(3)])
        assert out["texts_processed"] == 3
        hits = pipe.search_similar_texts("nearest neighbor vector recall",
                                         k=2)
        assert hits[0]["text"].startswith("Vector databases")
        assert hits[0]["similarity"] >= hits[1]["similarity"]
        hits = pipe.search_similar_texts("boiling pasta water", k=1)
        assert "pasta" in hits[0]["text"]


class TestRAG:
    def test_index_and_retrieve(self, tmp_store_path):
        enc = create_encoder("hash-384")
        store = TPUVectorStore(tmp_store_path, VectorStoreConfig(
            dimension=384, persist_mode="off"))
        rag = RAGPipeline(enc, store, chunk_size=200, chunk_overlap=20)
        out = rag.index_documents(DOCS, [{"title": f"d{i}"}
                                         for i in range(3)])
        assert out["documents"] == 3
        assert out["chunks"] >= 3

        ctx = rag.retrieve_context("how does the TPU do matrix math", k=2)
        assert ctx.chunks
        assert "TPU" in ctx.chunks[0]["text"] or \
               "MXU" in ctx.chunks[0]["text"]
        assert ctx.total_chars <= 4000

        prompt = rag.format_rag_prompt("how does the TPU work?", ctx,
                                       system_prompt="Be brief.")
        assert prompt.startswith("Be brief.")
        assert "[1]" in prompt and "Question:" in prompt

    def test_context_budget(self, tmp_store_path):
        enc = create_encoder("hash-384")
        store = TPUVectorStore(tmp_store_path, VectorStoreConfig(
            dimension=384, persist_mode="off"))
        rag = RAGPipeline(enc, store, chunk_size=200)
        rag.index_documents(DOCS)
        ctx = rag.retrieve_context("vector database", k=5,
                                   max_context_chars=150)
        assert ctx.total_chars <= 150

    def test_min_similarity_filter(self, tmp_store_path):
        enc = create_encoder("hash-384")
        store = TPUVectorStore(tmp_store_path, VectorStoreConfig(
            dimension=384, persist_mode="off"))
        rag = RAGPipeline(enc, store, chunk_size=300)
        rag.index_documents(DOCS)
        ctx = rag.retrieve_context("zzz qqq completely unrelated gibberish",
                                   k=3, min_similarity=0.9)
        assert ctx.chunks == []


class TestFactory:
    def test_recommendation(self):
        name = PipelineFactory.recommend_model("retrieval")
        assert name == "bge-small-384"
        name = PipelineFactory.recommend_model("quality",
                                               memory_budget_mb=500)
        assert name == "bge-base-768"
        assert PipelineFactory.recommend_model(
            "quality", memory_budget_mb=0) == "hash-384"

    def test_create_rag_pipeline(self, tmp_path):
        rag = PipelineFactory.create_rag_pipeline(
            tmp_path / "rag", model_name="hash-256")
        out = rag.index_documents(["A tiny document about testing."])
        assert out["chunks"] == 1
