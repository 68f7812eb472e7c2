#!/usr/bin/env python
"""Quantized BertEncoder measurement: int8 per-channel weights vs bf16/f32.

The reference's model registry served pre-baked 4-bit community checkpoints
(integrations/mlx_lm_pipeline.py:54-78) at 1,276 texts/s. Here ANY HF
checkpoint quantizes at load (pipeline/bert.py quantize_params); this
harness builds a MiniLM-L6-shaped random checkpoint in HF format (no
network) and measures encode throughput + parameter bytes for
quantize=none vs int8, plus the embedding cosine between the two.

Usage: setsid nohup python benchmarks/bert_quant_tpu.py > log 2>&1 &
Env: VDB_FORCE_CPU=1 for a host smoke run; VDB_QUANT_LAYERS/HIDDEN to
resize (default 6 x 384, MiniLM-L6 shape).
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def build_checkpoint(d, layers, hidden):
    import transformers
    import torch
    cfg = transformers.BertConfig(
        vocab_size=30522, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=max(hidden // 64, 1),
        intermediate_size=hidden * 4, max_position_embeddings=512)
    torch.manual_seed(0)
    model = transformers.BertModel(cfg)
    model.eval()
    model.save_pretrained(d)
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"] + [
        f"tok{i}" for i in range(2000)]
    (os.path.join(d, "vocab.txt"))
    with open(os.path.join(d, "vocab.txt"), "w") as f:
        f.write("\n".join(words) + "\n")
    return d


def texts_corpus(n):
    rng = np.random.default_rng(0)
    return [" ".join(f"tok{j}" for j in rng.integers(0, 2000, 16))
            for _ in range(n)]


def measure(enc, texts, iters=5):
    enc.encode(texts[:64])       # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = enc.encode(texts)
    dt = (time.perf_counter() - t0) / iters
    return len(texts) / dt, out


def main():
    layers = int(os.environ.get("VDB_QUANT_LAYERS", 6))
    hidden = int(os.environ.get("VDB_QUANT_HIDDEN", 384))
    d = tempfile.mkdtemp(prefix="quantbench_")
    build_checkpoint(d, layers, hidden)

    from tpu_vector_db.pipeline import bert
    from tpu_vector_db.pipeline.encoders import create_encoder

    texts = texts_corpus(512)
    results = {}

    enc = create_encoder(f"hf:{d}")
    tput, ref = measure(enc, texts)
    results["bf16_texts_per_s"] = round(tput, 1)
    results["bf16_param_mb"] = round(bert.param_bytes(enc._params) / 2**20, 1)

    for quant in ("int8", "int4"):
        encq = create_encoder(f"hf:{d}", quantize=quant)
        tputq, got = measure(encq, texts)
        results[f"{quant}_texts_per_s"] = round(tputq, 1)
        results[f"{quant}_param_mb"] = round(
            bert.param_bytes(encq._params) / 2**20, 1)
        cos = np.sum(ref * got, axis=-1)
        results[f"{quant}_min_cosine_vs_bf16"] = round(float(cos.min()), 5)
    print(json.dumps({"metric": f"bert_quant_L{layers}_H{hidden}_b512",
                      **results}), flush=True)


if __name__ == "__main__":
    main()
