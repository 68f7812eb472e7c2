#!/usr/bin/env python
"""XLM-R/e5-family end-to-end encode: native Unigram tokenizer vs Python.

The reference registry's multilingual entries (multilingual-e5-small/base,
integrations/mlx_lm_pipeline.py:74-75) tokenize through HF's Rust
tokenizers; this repo's equivalent host hot loop is native/unigram.cpp.
This harness builds an e5-small-shaped random XLM-RobertaModel checkpoint
in HF format (no network; synthetic 32K-piece Unigram vocab over a
multilingual word list) and measures:

- host tokenization throughput, Python Viterbi vs the C++ fast path
- end-to-end encode texts/s through the full pipeline (tokenize +
  bucketed Flax forward on the TPU) with each tokenizer

Usage: setsid nohup python benchmarks/multilingual_e2e_tpu.py > log 2>&1 &
Env: VDB_FORCE_CPU=1 for a host smoke run; VDB_ML_LAYERS/HIDDEN to resize
(default 12 x 384, e5-small shape).
"""

import json
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

WORDS = (
    "the quick brown fox jumps over lazy dog vector database index "
    "embedding similarity search züge fahren schnell durch die nacht "
    "recherche vectorielle rapide année café naïve résumé straße "
    "日本語 中文 한국어 данные поиск वेक्टर busca búsqueda").split()


def build_tokenizer_json(path, n_pieces=32_000):
    """Synthetic Unigram tokenizer.json: whole-word pieces for the corpus
    vocabulary plus sub-word/character coverage — no training, no deps."""
    rng = random.Random(0)
    pieces = [("<s>", 0.0), ("<pad>", 0.0), ("</s>", 0.0), ("<unk>", -12.0)]
    seen = {p for p, _ in pieces}

    def add(piece, score):
        if piece and piece not in seen:
            seen.add(piece)
            pieces.append((piece, score))

    for w in WORDS:
        add("▁" + w, -rng.uniform(4, 8))
        add(w, -rng.uniform(6, 10))
        for ch in w:
            add(ch, -rng.uniform(9, 11))
            add("▁" + ch, -rng.uniform(9, 11))
    # filler pieces to a realistic hash-table size
    alphabet = "abcdefghijklmnopqrstuvwxyzüßéàñ日本語中文한국어"
    while len(pieces) < n_pieces:
        ln = rng.randint(2, 8)
        add("".join(rng.choice(alphabet) for _ in range(ln)),
            -rng.uniform(8, 14))
    spec = {
        "model": {"type": "Unigram",
                  "vocab": [list(p) for p in pieces], "unk_id": 3},
        "normalizer": {"type": "Sequence",
                       "normalizers": [{"type": "NFKC"}]},
        "pre_tokenizer": {"type": "Metaspace", "replacement": "▁",
                          "prepend_scheme": "always", "split": True},
        "added_tokens": [],
    }
    with open(path, "w", encoding="utf-8") as f:
        json.dump(spec, f, ensure_ascii=False)
    return len(pieces)


def build_checkpoint(d, layers, hidden, vocab_size):
    import torch
    import transformers
    cfg = transformers.XLMRobertaConfig(
        vocab_size=vocab_size, hidden_size=hidden,
        num_hidden_layers=layers,
        num_attention_heads=max(hidden // 64, 1),
        intermediate_size=hidden * 4, max_position_embeddings=514,
        type_vocab_size=1, pad_token_id=1)
    torch.manual_seed(0)
    model = transformers.XLMRobertaModel(cfg)
    model.eval()
    model.save_pretrained(d)


def corpus(n, words_per_text=16):
    rng = random.Random(1)
    return [" ".join(rng.choices(WORDS, k=words_per_text))
            for _ in range(n)]


def main():
    layers = int(os.environ.get("VDB_ML_LAYERS", 12))
    hidden = int(os.environ.get("VDB_ML_HIDDEN", 384))
    d = tempfile.mkdtemp(prefix="mlbench_")
    n_vocab = build_tokenizer_json(os.path.join(d, "tokenizer.json"))
    build_checkpoint(d, layers, hidden, n_vocab)

    from tpu_vector_db.pipeline.encoders import create_encoder
    from tpu_vector_db.pipeline.fast_unigram import FastUnigramTokenizer
    from tpu_vector_db.pipeline.unigram import UnigramTokenizer

    texts = corpus(512)
    results = {"layers": layers, "hidden": hidden, "vocab": n_vocab}

    # host tokenization rate (batch encode, seq matching the encoder's
    # bucket for these lengths)
    fast = FastUnigramTokenizer(os.path.join(d, "tokenizer.json"))
    slow = UnigramTokenizer(os.path.join(d, "tokenizer.json"))
    assert fast.native, "native unigram must engage for this harness"
    ia, _ = fast.encode_batch(texts, 64)
    ib, _ = slow.encode_batch(texts, 64)
    np.testing.assert_array_equal(ia, ib)  # parity before speed
    for name, tok, iters in (("python", slow, 2), ("native", fast, 20)):
        t0 = time.perf_counter()
        for _ in range(iters):
            tok.encode_batch(texts, 64)
        dt = (time.perf_counter() - t0) / iters
        results[f"tokenize_{name}_texts_per_s"] = round(len(texts) / dt, 1)

    # e2e encode through the full pipeline (native tokenizer is the
    # encoder default; swap in the Python one for the comparison row)
    enc = create_encoder(f"hf:{d}")
    enc.encode(texts[:64])  # compile
    for name, tok in (("native", fast), ("python", slow)):
        enc._tokenizer = tok
        iters = 5 if name == "native" else 2
        t0 = time.perf_counter()
        for _ in range(iters):
            out = enc.encode(texts)
        dt = (time.perf_counter() - t0) / iters
        results[f"e2e_{name}_texts_per_s"] = round(len(texts) / dt, 1)
    assert out.shape == (512, hidden)
    print(json.dumps({"metric": f"multilingual_e2e_L{layers}_H{hidden}_b512",
                      **results}), flush=True)


if __name__ == "__main__":
    main()
