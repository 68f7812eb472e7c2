#!/usr/bin/env python
"""RAG example: index documents, retrieve context, format a prompt.

  python examples/rag_pipeline.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tpu_vector_db.pipeline import PipelineFactory  # noqa: E402

DOCUMENTS = [
    "TPUs accelerate machine learning with a systolic matrix unit (MXU). "
    "Feeding it large, batched bfloat16 matmuls is the key to performance. "
    "HBM bandwidth is usually the bottleneck for memory-bound kernels.",
    "A vector database stores embeddings and answers nearest-neighbor "
    "queries. Exact search scans every row; approximate indexes like "
    "navigable graphs trade a little recall for large speedups.",
    "Retrieval-augmented generation grounds a language model by fetching "
    "relevant chunks from an index and packing them into the prompt within "
    "a context budget.",
]


def main() -> None:
    rag = PipelineFactory.create_rag_pipeline(
        "/tmp/vdb_rag_example",
        model_name="hash-384",      # weights-free encoder; swap for a
        chunk_size=300,             # registry model with a local checkpoint
    )
    rag.pipeline.store.clear()

    stats = rag.index_documents(
        DOCUMENTS, [{"source": f"doc{i}"} for i in range(len(DOCUMENTS))])
    print("indexed:", stats)

    question = "why is HBM bandwidth important for TPU kernels?"
    ctx = rag.retrieve_context(question, k=2, max_context_chars=800)
    print(f"retrieved {len(ctx.chunks)} chunks ({ctx.total_chars} chars)")
    for c in ctx.chunks:
        print(f"  [{c['rank']}] sim={c['similarity']:.3f} "
              f"{c['text'][:60]}...")

    prompt = rag.format_rag_prompt(question, ctx,
                                   system_prompt="Answer concisely.")
    print("\n--- prompt ---\n" + prompt)


if __name__ == "__main__":
    main()
