"""Text encoders: model registry + hashing encoder + Flax transformer.

Capability parity with the reference's embedding stack
(integrations/mlx_lm_pipeline.py:54-448): a registry of named embedding
models with dimension/memory metadata, compiled masked-mean-pool and
normalize kernels (:81-108), lazy load + JIT warmup, encode_text /
encode_batch with padding + attention masks, and perf/memory stats.

TPU-first differences: the forward pass is a jitted Flax module running in
bf16 on the MXU; batches pad to fixed BUCKET sizes so jit compiles a bounded
set of shapes; and a weights-free deterministic HashingEncoder stands in
when no checkpoint is available (this image has no model egress — the
reference hard-required mlx_embeddings and 4-bit community checkpoints,
:40-48).
"""

from __future__ import annotations

import hashlib
import logging
import re
import time
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

# shape buckets: every encode pads (batch, seq) up to one of these, so the
# jitted forward compiles a small fixed set of programs
BATCH_BUCKETS = (1, 8, 32, 128)
SEQ_BUCKETS = (32, 128, 512)


@dataclass
class EncoderConfig:
    name: str = "hash-384"
    dimension: int = 384
    max_sequence_length: int = 512
    # transformer-encoder hyperparameters (ignored by the hashing encoder)
    vocab_size: int = 30522
    num_layers: int = 6
    num_heads: int = 6
    hidden_dim: int = 384
    mlp_dim: int = 1536
    dtype: str = "bfloat16"
    # local checkpoint directory (flax msgpack / orbax); None = random init
    checkpoint_path: str | None = None
    # "none" | "int8": per-channel weight quantization at load (BertEncoder;
    # 4x smaller HBM footprint — the reference served pre-baked 4-bit
    # checkpoints, mlx_lm_pipeline.py:54-78)
    quantize: str = "none"
    memory_estimate_mb: int = 100
    use_case: str = "general"


# Named registry — same role as the reference's 7-model table (:54-78).
EMBEDDING_MODEL_REGISTRY: dict[str, EncoderConfig] = {
    "hash-256": EncoderConfig(name="hash-256", dimension=256,
                              memory_estimate_mb=1, use_case="ci"),
    "hash-384": EncoderConfig(name="hash-384", dimension=384,
                              memory_estimate_mb=1, use_case="ci"),
    "minilm-l6-384": EncoderConfig(
        name="minilm-l6-384", dimension=384, num_layers=6, num_heads=12,
        hidden_dim=384, mlp_dim=1536, memory_estimate_mb=90,
        use_case="general"),
    "bge-small-384": EncoderConfig(
        name="bge-small-384", dimension=384, num_layers=12, num_heads=12,
        hidden_dim=384, mlp_dim=1536, memory_estimate_mb=130,
        use_case="retrieval"),
    "bge-base-768": EncoderConfig(
        name="bge-base-768", dimension=768, num_layers=12, num_heads=12,
        hidden_dim=768, mlp_dim=3072, memory_estimate_mb=440,
        use_case="quality"),
    "gte-large-1024": EncoderConfig(
        name="gte-large-1024", dimension=1024, num_layers=24, num_heads=16,
        hidden_dim=1024, mlp_dim=4096, memory_estimate_mb=1340,
        use_case="quality"),
    "multilingual-512": EncoderConfig(
        name="multilingual-512", dimension=512, num_layers=12, num_heads=8,
        hidden_dim=512, mlp_dim=2048, memory_estimate_mb=470,
        use_case="multilingual"),
    # reference registry rows with non-BERT architectures
    # (mlx_lm_pipeline.py:74-76): served pretrained via hf:<dir> with
    # model_type mpnet / xlm-roberta; these entries document the shape
    # and give the random-init Flax fallback the right hyperparameters
    "mpnet-base-768": EncoderConfig(
        name="mpnet-base-768", dimension=768, num_layers=12, num_heads=12,
        hidden_dim=768, mlp_dim=3072, vocab_size=30527,
        memory_estimate_mb=420, use_case="quality"),
    "multilingual-e5-small-384": EncoderConfig(
        name="multilingual-e5-small-384", dimension=384, num_layers=12,
        num_heads=12, hidden_dim=384, mlp_dim=1536, vocab_size=250002,
        memory_estimate_mb=470, use_case="multilingual"),
    "multilingual-e5-base-768": EncoderConfig(
        name="multilingual-e5-base-768", dimension=768, num_layers=12,
        num_heads=12, hidden_dim=768, mlp_dim=3072, vocab_size=250002,
        memory_estimate_mb=1070, use_case="multilingual"),
}


# --------------------------------------------------------- pooling kernels

@jax.jit
def masked_mean_pool(hidden: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(B, S, D) x (B, S) -> (B, D), parity with reference :81-99."""
    m = mask.astype(jnp.float32)[:, :, None]
    summed = jnp.sum(hidden.astype(jnp.float32) * m, axis=1)
    denom = jnp.maximum(jnp.sum(m, axis=1), 1e-9)
    return summed / denom


@jax.jit
def l2_normalize_embeddings(x: jnp.ndarray) -> jnp.ndarray:
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(norm, 1e-12)


def _bucket(value: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if value <= b:
            return b
    return buckets[-1]


# ------------------------------------------------------------- tokenization

_TOKEN_RE = re.compile(r"[a-z0-9']+")


class HashTokenizer:
    """Deterministic hashing tokenizer (no vocab files needed)."""

    def __init__(self, vocab_size: int, max_len: int) -> None:
        self.vocab_size = vocab_size
        self.max_len = max_len

    def encode_batch(self, texts: list[str], seq_len: int):
        ids = np.zeros((len(texts), seq_len), np.int32)
        mask = np.zeros((len(texts), seq_len), np.int32)
        for i, text in enumerate(texts):
            tokens = _TOKEN_RE.findall(text.lower())[: seq_len]
            for j, tok in enumerate(tokens):
                digest = hashlib.blake2b(tok.encode(), digest_size=4).digest()
                ids[i, j] = int.from_bytes(digest, "little") % self.vocab_size
            mask[i, : len(tokens)] = 1
        return ids, mask


# ---------------------------------------------------------- base interface

class BaseEncoder:
    """encode(texts) -> (N, dim) float32 normalized embeddings."""

    config: EncoderConfig

    def __init__(self, config: EncoderConfig) -> None:
        self.config = config
        self._stats = {"texts": 0, "batches": 0, "total_time_s": 0.0}
        self._loaded = False

    @property
    def dimension(self) -> int:
        return self.config.dimension

    def load(self) -> None:  # lazy, parity with reference load_model
        self._loaded = True

    def warmup(self) -> dict:
        t0 = time.perf_counter()
        self.encode(["warmup probe text"])
        return {"warmed": True,
                "duration_ms": (time.perf_counter() - t0) * 1e3}

    #: device-batch ceiling; subclasses whose _encode pads to fixed batch
    #: buckets set this so oversized inputs chunk instead of overflowing
    _max_batch: int | None = None

    def encode(self, texts: list[str]) -> np.ndarray:
        if not self._loaded:
            self.load()
        t0 = time.perf_counter()
        mb = self._max_batch
        if mb is not None and len(texts) > mb:
            out = np.concatenate([self._encode(texts[i: i + mb])
                                  for i in range(0, len(texts), mb)])
        else:
            out = self._encode(texts)
        dt = time.perf_counter() - t0
        self._stats["texts"] += len(texts)
        self._stats["batches"] += 1
        self._stats["total_time_s"] += dt
        return out

    def _encode(self, texts: list[str]) -> np.ndarray:
        raise NotImplementedError

    def get_stats(self) -> dict:
        s = dict(self._stats)
        s["texts_per_second"] = (s["texts"] / s["total_time_s"]
                                 if s["total_time_s"] else 0.0)
        s["model"] = self.config.name
        s["dimension"] = self.dimension
        return s


# --------------------------------------------------------- hashing encoder

class HashingEncoder(BaseEncoder):
    """Deterministic random-projection embedding: hashed tokens index rows
    of a fixed seeded Gaussian table; masked mean pool + L2 normalize. Fully
    jitted; zero external weights. Semantics: real lexical overlap ->
    similar embeddings, which is enough for pipeline/RAG plumbing and CI."""

    # cap _encode batches at the largest bucket: without it, a 200-text
    # batch pads by a NEGATIVE count (no-op), hands the jit an unbucketed
    # (200, seq) shape, and every distinct oversize batch costs a fresh
    # multi-minute axon device compile (review finding; the transformer
    # encoders already set this)
    _max_batch = BATCH_BUCKETS[-1]

    def __init__(self, config: EncoderConfig, seed: int = 0) -> None:
        super().__init__(config)
        self._seed = seed
        self._table: jnp.ndarray | None = None
        self._tokenizer = HashTokenizer(config.vocab_size,
                                        config.max_sequence_length)

    def load(self) -> None:
        key = jax.random.PRNGKey(self._seed)
        self._table = jax.random.normal(
            key, (self.config.vocab_size, self.config.dimension),
            jnp.float32) / np.sqrt(self.config.dimension)
        self._loaded = True

    def _encode(self, texts: list[str]) -> np.ndarray:
        n = len(texts)
        seq = _bucket(
            max((len(_TOKEN_RE.findall(t.lower())) for t in texts),
                default=1),
            SEQ_BUCKETS)
        b = _bucket(n, BATCH_BUCKETS)
        padded = texts + [""] * (b - n)
        ids, mask = self._tokenizer.encode_batch(padded, seq)
        # fully-empty rows pool to zero; avoid NaN by forcing one live token
        mask[np.asarray(mask.sum(1) == 0), 0] = 1
        out = _hash_forward(self._table, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(out[:n])


@jax.jit
def _hash_forward(table, ids, mask):
    # table passed as an argument (a closure-captured device array would be
    # inlined as a 47MB HLO constant and stall compilation)
    hidden = table[ids]                                 # (B, S, D) gather
    pooled = masked_mean_pool(hidden, mask)
    return l2_normalize_embeddings(pooled)


# ------------------------------------------------------ flax transformer

class FlaxTransformerEncoder(BaseEncoder):
    """Real transformer encoder (Flax): token + position embeddings, N
    pre-LN self-attention blocks, masked mean pool, normalize. bf16 matmuls
    on the MXU, f32 accumulations. Random-initialized unless
    config.checkpoint_path points at a flax msgpack state."""

    _max_batch = BATCH_BUCKETS[-1]

    def __init__(self, config: EncoderConfig, seed: int = 0) -> None:
        super().__init__(config)
        self._seed = seed
        self._params = None
        self._model = None
        self._tokenizer = HashTokenizer(config.vocab_size,
                                        config.max_sequence_length)

    def load(self) -> None:
        import flax.linen as nn

        cfg = self.config
        dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

        class Block(nn.Module):
            @nn.compact
            def __call__(self, x, mask):
                h = nn.LayerNorm(dtype=jnp.float32)(x)
                h = nn.MultiHeadDotProductAttention(
                    num_heads=cfg.num_heads, dtype=dtype,
                    deterministic=True)(h, h, mask=mask)
                x = x + h
                h = nn.LayerNorm(dtype=jnp.float32)(x)
                h = nn.Dense(cfg.mlp_dim, dtype=dtype)(h)
                h = nn.gelu(h)
                h = nn.Dense(cfg.hidden_dim, dtype=dtype)(h)
                return x + h

        class Encoder(nn.Module):
            @nn.compact
            def __call__(self, ids, mask):
                x = nn.Embed(cfg.vocab_size, cfg.hidden_dim,
                             dtype=dtype)(ids)
                pos = jnp.arange(ids.shape[1])[None, :]
                x = x + nn.Embed(cfg.max_sequence_length,
                                 cfg.hidden_dim, dtype=dtype)(pos)
                attn_mask = mask[:, None, None, :].astype(bool)
                for _ in range(cfg.num_layers):
                    x = Block()(x, attn_mask)
                x = nn.LayerNorm(dtype=jnp.float32)(x)
                if cfg.hidden_dim != cfg.dimension:
                    x = nn.Dense(cfg.dimension, dtype=dtype)(x)
                return x

        self._model = Encoder()
        init_ids = jnp.zeros((1, 8), jnp.int32)
        init_mask = jnp.ones((1, 8), jnp.int32)
        self._params = self._model.init(
            jax.random.PRNGKey(self._seed), init_ids, init_mask)
        if cfg.checkpoint_path:
            self._load_checkpoint(cfg.checkpoint_path)
        self._forward = jax.jit(self._apply)
        self._loaded = True
        logger.info("encoder %s loaded (%d layers, dim %d)",
                    cfg.name, cfg.num_layers, cfg.dimension)

    def _load_checkpoint(self, path: str) -> None:
        import flax.serialization
        from pathlib import Path
        ckpt = Path(path)
        candidates = [ckpt] if ckpt.is_file() else \
            list(ckpt.glob("*.msgpack"))
        if not candidates:
            logger.warning("no checkpoint at %s; using random init", path)
            return
        raw = candidates[0].read_bytes()
        self._params = flax.serialization.from_bytes(self._params, raw)
        logger.info("loaded checkpoint %s", candidates[0])

    def _apply(self, params, ids, mask):
        hidden = self._model.apply(params, ids, mask)
        pooled = masked_mean_pool(hidden, mask)
        return l2_normalize_embeddings(pooled)

    def _encode(self, texts: list[str]) -> np.ndarray:
        n = len(texts)
        seq = _bucket(
            max((len(_TOKEN_RE.findall(t.lower())) for t in texts),
                default=1),
            SEQ_BUCKETS)
        b = _bucket(n, BATCH_BUCKETS)
        padded = texts + [""] * (b - n)
        ids, mask = self._tokenizer.encode_batch(padded, seq)
        mask[np.asarray(mask.sum(1) == 0), 0] = 1
        out = self._forward(self._params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(out[:n], np.float32)


# -------------------------------------------------- pretrained BERT encoder

class BertEncoder(BaseEncoder):
    """Serves a real pretrained transformer checkpoint from a local
    directory, dispatching on config.json ``model_type``:

    - ``bert`` (MiniLM, bge-*, gte-*, any HF BertModel): WordPiece over
      vocab.txt + the faithful Flax BERT forward (pipeline/bert.py).
    - ``xlm-roberta`` / ``roberta`` (multilingual-e5-*): Unigram/
      SentencePiece over tokenizer.json (pipeline/unigram.py) + the same
      encoder stack with RoBERTa position indexing.
    - ``mpnet`` (all-mpnet-base-v2): WordPiece with <s>/</s>/<pad>
      framing + the Flax MPNet with its shared relative-position bias
      (pipeline/mpnet.py).

    Together these cover every architecture in the reference's 7-model
    registry (integrations/mlx_lm_pipeline.py:54-78), minus the model-hub
    egress: point checkpoint_path at a directory holding config.json +
    the tokenizer files + model.safetensors (or pytorch_model.bin).
    Mean or CLS pooling, L2 normalize; quantize="int8"/"int4" applies to
    all three families."""

    _max_batch = BATCH_BUCKETS[-1]

    def __init__(self, config: EncoderConfig, pooling: str = "mean") -> None:
        super().__init__(config)
        if not config.checkpoint_path:
            raise ValueError("BertEncoder needs config.checkpoint_path "
                             "pointing at an HF checkpoint directory")
        self.pooling = pooling
        self._params = None
        self._model = None
        self._tokenizer = None

    def _make_tokenizer(self, ckpt, model_type: str):
        # FastWordPieceTokenizer: C++ ASCII fast path (~57x the Python
        # rate — tokenization was the host-side e2e bottleneck), Python
        # fallback for non-ASCII input / no-compiler images
        from tpu_vector_db.pipeline.fast_unigram import FastUnigramTokenizer
        from tpu_vector_db.pipeline.fast_wordpiece import \
            FastWordPieceTokenizer

        if model_type == "mpnet":
            return FastWordPieceTokenizer(
                ckpt / "vocab.txt", pad_token="<pad>", cls_token="<s>",
                sep_token="</s>", unk_token="[UNK]")
        tj = ckpt / "tokenizer.json"
        if model_type in ("roberta", "xlm-roberta"):
            if not tj.exists():
                raise FileNotFoundError(
                    f"{model_type} checkpoint needs tokenizer.json "
                    f"(Unigram/SentencePiece) in {ckpt}")
            # C++ Metaspace+Viterbi fast path (~14x the Python rate on
            # this 1-core host); full Unicode, Python fallback inside
            return FastUnigramTokenizer(tj)
        # BERT family: prefer vocab.txt; fall back to a Unigram
        # tokenizer.json if that is all the checkpoint ships
        if (ckpt / "vocab.txt").exists():
            return FastWordPieceTokenizer(ckpt / "vocab.txt")
        return FastUnigramTokenizer(tj)

    def load(self) -> None:
        import json as _json
        from pathlib import Path

        from tpu_vector_db.pipeline import bert

        ckpt = Path(self.config.checkpoint_path)
        raw_cfg = _json.loads((ckpt / "config.json").read_text())
        model_type = raw_cfg.get("model_type", "bert")
        dtype = (jnp.bfloat16 if self.config.dtype == "bfloat16"
                 else jnp.float32)
        quant = self.config.quantize
        if quant not in ("none", "int8", "int4"):
            raise ValueError(
                f"quantize must be 'none', 'int8' or 'int4', got {quant!r}")
        quantized = False if quant == "none" else quant

        if model_type == "mpnet":
            from tpu_vector_db.pipeline import mpnet
            mcfg = mpnet.MPNetConfig.from_hf_dir(ckpt)
            self._arch_cfg = mcfg
            self._model = mpnet.make_mpnet_module(
                mcfg, compute_dtype=dtype, quantized=quantized)
            self._params = mpnet.load_hf_params(ckpt, mcfg)
            quantizer = mpnet.quantize_params
        else:  # bert / roberta / xlm-roberta share the module
            bcfg = bert.BertConfig.from_hf_dir(ckpt)
            self._arch_cfg = self._bert_cfg = bcfg
            self._model = bert.make_bert_module(
                bcfg, compute_dtype=dtype, quantized=quantized)
            self._params = bert.load_hf_params(ckpt, bcfg)
            quantizer = bert.quantize_params
        if quantized:
            f32_bytes = bert.param_bytes(self._params)
            self._params = quantizer(
                self._params, bits=4 if quant == "int4" else 8)
            logger.info(
                "%s-quantized %s: %.1f -> %.1f MB params",
                quant, self.config.name, f32_bytes / 2**20,
                bert.param_bytes(self._params) / 2**20)
        self._tokenizer = self._make_tokenizer(ckpt, model_type)
        self._pool = bert.pool_hidden

        model, pooling = self._model, self.pooling

        @jax.jit
        def forward(params, ids, mask):
            hidden = model.apply(params, ids, mask)
            return bert.pool_hidden(hidden, mask, pooling)

        self._forward = forward
        self._loaded = True
        # clamp the tokenizer max_length to the checkpoint's position
        # table: XLA gather CLAMPS out-of-range position ids instead of
        # erroring, so tokens past the table would silently share the
        # last position embedding (review finding). RoBERTa positions
        # start at pad_id+1, costing 2 extra slots.
        pos_budget = self._arch_cfg.max_position_embeddings
        if getattr(self._arch_cfg, "model_type", "bert") in (
                "roberta", "xlm-roberta", "mpnet"):
            pos_budget -= 2  # positions start at pad_id+1 = 2
        if self.config.max_sequence_length > pos_budget:
            logger.warning(
                "max_sequence_length %d exceeds the checkpoint's position "
                "table (%d usable); clamping",
                self.config.max_sequence_length, pos_budget)
            self.config.max_sequence_length = pos_budget
        # the served dimension is the checkpoint's hidden size
        hidden_size = self._arch_cfg.hidden_size
        if self.config.dimension != hidden_size:
            logger.warning(
                "config dimension %d != checkpoint hidden %d; serving %d",
                self.config.dimension, hidden_size, hidden_size)
            self.config.dimension = hidden_size
        logger.info(
            "%s encoder %s loaded from %s (%d layers, %s pooling)",
            model_type, self.config.name, ckpt,
            self._arch_cfg.num_hidden_layers, pooling)

    def _encode(self, texts: list[str]) -> np.ndarray:
        n = len(texts)
        b = _bucket(n, BATCH_BUCKETS)
        padded = texts + [""] * (b - n)
        # one tokenizer pass decides the sequence bucket ([CLS]+[SEP] = +2).
        # Clamp max_length to the largest bucket so the TOKENIZER performs
        # any truncation (keeping the trailing [SEP] per BERT convention) —
        # a bare row[:seq] cut would drop the [SEP] on over-long rows
        # (review finding).
        max_len = min(self.config.max_sequence_length, SEQ_BUCKETS[-1])
        rows = [self._tokenizer.encode(t, max_length=max_len)
                for t in padded]
        seq = _bucket(max(len(r) for r in rows), SEQ_BUCKETS)
        ids = np.full((b, seq), self._tokenizer.pad_id, np.int32)
        mask = np.zeros((b, seq), np.int32)
        for i, row in enumerate(rows):
            row = row[:seq]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        out = self._forward(self._params, jnp.asarray(ids), jnp.asarray(mask))
        return np.asarray(out[:n], np.float32)


def create_encoder(model_name: str = "hash-384",
                   **overrides) -> BaseEncoder:
    """Factory over the registry; hash-* -> HashingEncoder, hf:<dir> or a
    checkpoint_path holding an HF config.json -> BertEncoder (real
    pretrained weights), else the generic Flax transformer."""
    from pathlib import Path

    pooling = overrides.pop("pooling", "mean")
    if model_name.startswith("hf:"):
        path = model_name[3:]
        cfg = EncoderConfig(name=Path(path).name or "hf-bert",
                            checkpoint_path=path, **overrides)
        return BertEncoder(cfg, pooling=pooling)
    if model_name not in EMBEDDING_MODEL_REGISTRY:
        raise KeyError(
            f"unknown model {model_name!r}; available: "
            f"{sorted(EMBEDDING_MODEL_REGISTRY)} or 'hf:<checkpoint dir>'")
    cfg = EMBEDDING_MODEL_REGISTRY[model_name]
    if overrides:
        from dataclasses import replace
        cfg = replace(cfg, **overrides)
    if model_name.startswith("hash-"):
        return HashingEncoder(cfg)
    ckpt = cfg.checkpoint_path
    if ckpt and (Path(ckpt) / "config.json").exists():
        return BertEncoder(cfg, pooling=pooling)
    return FlaxTransformerEncoder(cfg)
