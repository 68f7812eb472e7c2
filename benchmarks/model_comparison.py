#!/usr/bin/env python
"""Per-encoder E2E comparison table.

Parity with reference benchmarks/e2e_model_comparison.py (same pipeline per
embedding model -> comparison table). Three model sources:

* registry names (hash-384, minilm-l6-384, ...): hashing / generic Flax
  encoders (random-init; true compute cost per architecture);
* ``bert:<shape>`` (minilm-l6, bge-small, bge-base, gte-large): builds a
  random-init checkpoint in REAL HF format (config.json + weights +
  vocab.txt, via transformers, no network) and serves it through the full
  BertEncoder path — WordPiece tokenization + the faithful Flax BERT
  forward, i.e. exactly what a real pretrained checkpoint costs;
* ``mpnet:<shape>`` (base) and ``xlmr:<shape>`` (e5-small, e5-base):
  the same for the reference registry's MPNet / XLM-RoBERTa rows
  (mlx_lm_pipeline.py:74-76) — rel-pos-bias MPNet forward, Unigram
  tokenizer + 250002-vocab XLM-R respectively;
* ``hf:<dir>``: a real local HF checkpoint directory.

Append ``+int8`` or ``+int4`` to a bert:/hf: model to serve it through the
per-channel int8 / group-wise packed int4 weight quantizer
(pipeline/bert.py quantize_params).

  python benchmarks/model_comparison.py \
      --models hash-384 bert:minilm-l6 bert:minilm-l6+int8
"""

from __future__ import annotations

import os

if os.environ.get("VDB_FORCE_CPU"):  # env JAX_PLATFORMS is hijacked by the
    import jax                        # pinned TPU plugin; config API sticks
    jax.config.update("jax_platforms", "cpu")

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tpu_vector_db.pipeline import EMBEDDING_MODEL_REGISTRY, RAGPipeline, create_encoder  # noqa: E402
from tpu_vector_db.store import TPUVectorStore, VectorStoreConfig  # noqa: E402
from benchmarks.e2e_benchmark import synth_docs  # noqa: E402


# real HF-checkpoint shapes matching the registry's memory/dim metadata
BERT_SHAPES = {
    "minilm-l6": (6, 384),
    "bge-small": (12, 384),
    "bge-base": (12, 768),
    "gte-large": (24, 1024),
}
# the reference registry's non-BERT architectures
# (mlx_lm_pipeline.py:74-76): MPNet and XLM-RoBERTa at real shapes
MPNET_SHAPES = {"base": (12, 768)}
XLMR_SHAPES = {"e5-small": (12, 384), "e5-base": (12, 768)}


def ensure_hf_checkpoint(shape_name: str, base: Path) -> Path:
    """Random-init BertModel saved in HF format (cached per shape)."""
    layers, hidden = BERT_SHAPES[shape_name]
    d = base / f"hf_{shape_name}"
    if (d / "config.json").exists():
        return d
    import torch
    import transformers
    cfg = transformers.BertConfig(
        vocab_size=30522, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=max(hidden // 64, 1),
        intermediate_size=hidden * 4, max_position_embeddings=512)
    torch.manual_seed(0)
    model = transformers.BertModel(cfg)
    model.eval()
    d.mkdir(parents=True, exist_ok=True)
    model.save_pretrained(d)
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"tok{i}" for i in range(5000)]
    (d / "vocab.txt").write_text("\n".join(words) + "\n")
    return d


def ensure_mpnet_checkpoint(shape_name: str, base: Path) -> Path:
    """Random-init MPNetModel (rel-pos bias arch) in HF format."""
    layers, hidden = MPNET_SHAPES[shape_name]
    d = base / f"mpnet_{shape_name}"
    if (d / "config.json").exists():
        return d
    import torch
    import transformers
    cfg = transformers.MPNetConfig(
        vocab_size=30527, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=max(hidden // 64, 1),
        intermediate_size=hidden * 4, max_position_embeddings=514)
    torch.manual_seed(0)
    model = transformers.MPNetModel(cfg)
    model.eval()
    d.mkdir(parents=True, exist_ok=True)
    model.save_pretrained(d)
    words = ["<s>", "<pad>", "</s>", "[UNK]", "<mask>"] + [
        f"tok{i}" for i in range(5000)]
    (d / "vocab.txt").write_text("\n".join(words) + "\n")
    return d


def ensure_xlmr_checkpoint(shape_name: str, base: Path) -> Path:
    """Random-init XLMRobertaModel + a small trained Unigram
    tokenizer.json; vocab_size kept at the real 250002 so the embedding
    table cost (the e5 models' dominant parameter mass) is realistic."""
    layers, hidden = XLMR_SHAPES[shape_name]
    d = base / f"xlmr_{shape_name}"
    if (d / "config.json").exists():
        return d
    import torch
    import transformers
    from tokenizers import Tokenizer, models, normalizers, \
        pre_tokenizers, trainers
    cfg = transformers.XLMRobertaConfig(
        vocab_size=250002, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=max(hidden // 64, 1),
        intermediate_size=hidden * 4, max_position_embeddings=514,
        type_vocab_size=1, pad_token_id=1)
    torch.manual_seed(0)
    model = transformers.XLMRobertaModel(cfg)
    model.eval()
    d.mkdir(parents=True, exist_ok=True)
    model.save_pretrained(d)
    tok = Tokenizer(models.Unigram())
    tok.normalizer = normalizers.Sequence([normalizers.NFKC()])
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always")
    trainer = trainers.UnigramTrainer(
        vocab_size=400, special_tokens=["<s>", "<pad>", "</s>", "<unk>"],
        unk_token="<unk>")
    tok.train_from_iterator(synth_docs(50, np.random.default_rng(0)),
                            trainer)
    tok.save(str(d / "tokenizer.json"))
    return d


def resolve_encoder(name: str, base: Path):
    quant = "none"
    spec = name
    if spec.endswith("+int8"):
        quant, spec = "int8", spec[:-5]
    elif spec.endswith("+int4"):
        quant, spec = "int4", spec[:-5]
    if spec.startswith("bert:"):
        ckpt = ensure_hf_checkpoint(spec[5:], base)
        return create_encoder(f"hf:{ckpt}", quantize=quant)
    if spec.startswith("mpnet:"):
        ckpt = ensure_mpnet_checkpoint(spec[6:], base)
        return create_encoder(f"hf:{ckpt}", quantize=quant)
    if spec.startswith("xlmr:"):
        ckpt = ensure_xlmr_checkpoint(spec[5:], base)
        return create_encoder(f"hf:{ckpt}", quantize=quant)
    if spec.startswith("hf:"):
        return create_encoder(spec, quantize=quant)
    return create_encoder(spec)


def param_mb(encoder) -> float | None:
    params = getattr(encoder, "_params", None)
    if params is None:
        return None
    from tpu_vector_db.pipeline import bert
    try:
        return round(bert.param_bytes(params) / 2**20, 1)
    except Exception:  # noqa: BLE001 — non-tree params
        return None


def bench_model(name: str, docs: list[str], queries: int, base: Path) -> dict:
    t0 = time.perf_counter()
    encoder = resolve_encoder(name, base)
    encoder.warmup()
    init_s = time.perf_counter() - t0
    store = TPUVectorStore(base / name.replace(":", "_").replace("+", "_"),
                           VectorStoreConfig(
        dimension=encoder.dimension, persist_mode="off"))
    store.clear()
    rag = RAGPipeline(encoder, store)

    stats = rag.index_documents(docs)
    lat = []
    for i in range(queries):
        t0 = time.perf_counter()
        rag.retrieve_context(f"query about topic {i}", k=5)
        lat.append(time.perf_counter() - t0)
    lat.sort()
    enc_stats = encoder.get_stats()
    store.clear()
    return {
        "model": name,
        "dimension": encoder.dimension,
        "param_mb": param_mb(encoder),
        "init_s": round(init_s, 2),
        "docs_per_second": stats["docs_per_second"],
        "texts_per_second": round(enc_stats["texts_per_second"], 1),
        "query_ms_p50": round(lat[len(lat) // 2] * 1e3, 2),
        "qps": round(queries / sum(lat), 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models", nargs="+",
                    default=["hash-384", "minilm-l6-384", "bge-small-384"])
    ap.add_argument("--docs", type=int, default=100)
    ap.add_argument("--queries", type=int, default=50)
    ap.add_argument("--path", default="/tmp/tpu_vdb_model_cmp")
    args = ap.parse_args()

    shape_tables = {"bert:": BERT_SHAPES, "mpnet:": MPNET_SHAPES,
                    "xlmr:": XLMR_SHAPES}
    for m in args.models:
        spec = m[:-5] if m.endswith(("+int8", "+int4")) else m
        prefix = next((p for p in shape_tables if spec.startswith(p)), None)
        if prefix:
            if spec[len(prefix):] not in shape_tables[prefix]:
                sys.exit(f"unknown {prefix} shape {spec[len(prefix):]}; "
                         f"known: {sorted(shape_tables[prefix])}")
        elif not spec.startswith("hf:") and \
                spec not in EMBEDDING_MODEL_REGISTRY:
            sys.exit(f"unknown model {m}; known: "
                     f"{sorted(EMBEDDING_MODEL_REGISTRY)}, bert:<shape>, "
                     "mpnet:<shape>, xlmr:<shape>, hf:<dir>")

    rng = np.random.default_rng(0)
    docs = synth_docs(args.docs, rng)
    rows = [bench_model(m, docs, args.queries, Path(args.path))
            for m in args.models]

    cols = list(rows[0].keys())
    widths = {c: max(len(c), *(len(str(r[c])) for r in rows)) for c in cols}
    print("  ".join(c.ljust(widths[c]) for c in cols))
    for r in rows:
        print("  ".join(str(r[c]).ljust(widths[c]) for c in cols))
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
