"""Faithful BERT encoder in Flax + HF checkpoint weight mapping.

The reference loaded and ran real pretrained MiniLM/bge 4-bit checkpoints via
mlx_embeddings (integrations/mlx_lm_pipeline.py:149-321). This module gives
the TPU build the same capability without any model-hub egress: a
BERT-architecture Flax module whose parameter tree maps 1:1 onto HuggingFace
``BertModel`` checkpoints (pytorch_model.bin or model.safetensors), plus the
loader that performs the mapping. MiniLM-L6, bge-small/base, and every other
BERT-family sentence encoder load through this path.

Numerical parity is tested against ``transformers.BertModel`` (torch, CPU)
on a tiny randomly-initialized checkpoint saved in HF format
(tests/test_bert.py) — golden embeddings without network access.

TPU notes: matmuls run in a configurable dtype (bf16 on TPU), LayerNorms and
softmax in float32; shapes are static per (batch, seq) bucket so jit
compiles a bounded set of programs.
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_hidden_layers: int = 6
    num_attention_heads: int = 12
    intermediate_size: int = 1536
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    hidden_act: str = "gelu"
    # "bert" | "roberta" | "xlm-roberta": RoBERTa-family checkpoints share
    # the BERT encoder but index position embeddings from pad_token_id+1
    # (multilingual-e5-* in the reference registry are XLM-RoBERTa,
    # integrations/mlx_lm_pipeline.py:74-75)
    model_type: str = "bert"
    pad_token_id: int = 0

    @classmethod
    def from_hf_dir(cls, path: str | Path) -> "BertConfig":
        """Read the subset of HF config.json this module needs."""
        raw = json.loads((Path(path) / "config.json").read_text())
        fields = {f: raw[f] for f in cls.__dataclass_fields__ if f in raw}
        return cls(**fields)


# --------------------------------------------------------------- the model

# int4 quantization group: input rows sharing one scale per output channel
# (matches the group_size=64 convention of public 4-bit checkpoints)
Q4_GROUP = 64


def quant_mode(quantized) -> str | None:
    """Normalize the quantized flag: False/None | True/'int8' | 'int4'."""
    mode = "int8" if quantized is True else (quantized or None)
    if mode not in (None, "int8", "int4"):
        raise ValueError(f"quantized must be False/'int8'/'int4', "
                         f"got {quantized!r}")
    return mode


def make_layer_factories(dtype, mode: str | None):
    """(DenseM, EmbedM) constructors for one transformer family.

    mode=None -> plain nn.Dense / nn.Embed in `dtype`.
    mode="int8" -> per-output-channel symmetric int8 kernels (kernel_q +
    scale f32), dequantized at apply time inside the matmul operand read.
    mode="int4" -> kernels packed two-nibbles-per-byte with Q4_GROUP-wise
    scales (the group_size-64 layout of the reference's 4-bit MLX
    checkpoints, integrations/mlx_lm_pipeline.py:54-78); embedding tables
    stay int8 in both modes (gather from packed nibbles is not worth it;
    the table is the precision-sensitive part).

    Shared by the BERT/RoBERTa module below and pipeline/mpnet.py — every
    family in the reference registry quantizes through the same machinery.
    """
    import flax.linen as nn

    class QuantDense(nn.Module):
        """int8 weights, per-OUTPUT-channel symmetric scales. XLA fuses the
        widen+scale into the matmul operand read, so the dequantized kernel
        is never materialized in HBM."""
        features: int

        @nn.compact
        def __call__(self, x):
            in_f = x.shape[-1]
            kq = self.param("kernel_q", nn.initializers.zeros_init(),
                            (in_f, self.features), jnp.int8)
            scale = self.param("scale", nn.initializers.ones_init(),
                               (self.features,), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,), jnp.float32)
            k = (kq.astype(jnp.float32) * scale[None, :]).astype(dtype)
            y = jnp.dot(x.astype(dtype), k)
            return y + bias.astype(dtype)

    class Quant4Dense(nn.Module):
        """int4 weights packed two-per-byte along the INPUT dim, symmetric
        group-wise scales (Q4_GROUP input rows per output channel). Unpack
        + scale run on the VPU as part of the operand read; the widened
        kernel is a fusion temporary, never a stored HBM tensor."""
        features: int

        @nn.compact
        def __call__(self, x):
            in_f = x.shape[-1]
            g = min(Q4_GROUP, in_f)
            kp = self.param("kernel_q4", nn.initializers.zeros_init(),
                            (in_f // 2, self.features), jnp.uint8)
            scale = self.param("scale", nn.initializers.ones_init(),
                               (in_f // g, self.features), jnp.float32)
            bias = self.param("bias", nn.initializers.zeros_init(),
                              (self.features,), jnp.float32)
            u = kp.astype(jnp.int32)
            lo = (u & 15) - 8          # even input rows
            hi = ((u >> 4) & 15) - 8   # odd input rows
            k = jnp.stack([lo, hi], axis=1).reshape(in_f, self.features)
            k = k.astype(jnp.float32).reshape(in_f // g, g, self.features)
            k = (k * scale[:, None, :]).reshape(in_f, self.features)
            y = jnp.dot(x.astype(dtype), k.astype(dtype))
            return y + bias.astype(dtype)

    class QuantEmbed(nn.Module):
        num_embeddings: int
        features: int

        @nn.compact
        def __call__(self, ids):
            eq = self.param("embedding_q", nn.initializers.zeros_init(),
                            (self.num_embeddings, self.features), jnp.int8)
            scale = self.param("scale", nn.initializers.ones_init(),
                               (self.features,), jnp.float32)
            return (eq[ids].astype(jnp.float32)
                    * scale[None, :]).astype(dtype)

    def DenseM(features, name):
        if mode == "int4":
            return Quant4Dense(features, name=name)
        if mode == "int8":
            return QuantDense(features, name=name)
        return nn.Dense(features, dtype=dtype, name=name)

    def EmbedM(num, features, name):
        return (QuantEmbed(num, features, name=name) if mode
                else nn.Embed(num, features, name=name, dtype=dtype))

    return DenseM, EmbedM


def roberta_position_ids(ids: jnp.ndarray, mask: jnp.ndarray,
                         pad_id: int) -> jnp.ndarray:
    """RoBERTa/XLM-R position indexing: live token t gets position
    pad_id + (1-based index among live tokens); pads get pad_id. Mirrors
    transformers' create_position_ids_from_input_ids (padded tokens stay
    at padding_idx so the zeroed pad position row is gathered)."""
    m = mask.astype(jnp.int32)
    return jnp.cumsum(m, axis=1) * m + pad_id


def make_bert_module(cfg: BertConfig, compute_dtype=jnp.bfloat16,
                     quantized=False):
    """Build the Flax module. Param tree layout is chosen so the HF mapping
    in load_hf_params is positional-free: one named submodule per HF tensor
    group. Covers BertModel AND RobertaModel/XLMRobertaModel checkpoints
    (cfg.model_type picks the position-id convention; the encoder stack is
    byte-identical between the two families).

    quantized="int8"/"int4": see make_layer_factories. Pair with
    quantize_params; any HF checkpoint quantizes at load — no special
    model files needed (the reference served pre-baked 4-bit checkpoints,
    integrations/mlx_lm_pipeline.py:54-78)."""
    import flax.linen as nn

    mode = quant_mode(quantized)
    dtype = compute_dtype
    head_dim = cfg.hidden_size // cfg.num_attention_heads
    roberta = cfg.model_type in ("roberta", "xlm-roberta")

    DenseM, EmbedM = make_layer_factories(dtype, mode)

    class Layer(nn.Module):
        @nn.compact
        def __call__(self, x, bias):
            b, s, h = x.shape
            q = DenseM(cfg.hidden_size, name="query")(x)
            k = DenseM(cfg.hidden_size, name="key")(x)
            v = DenseM(cfg.hidden_size, name="value")(x)
            q = q.reshape(b, s, cfg.num_attention_heads, head_dim)
            k = k.reshape(b, s, cfg.num_attention_heads, head_dim)
            v = v.reshape(b, s, cfg.num_attention_heads, head_dim)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            scores = scores / np.sqrt(head_dim) + bias
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v,
                             preferred_element_type=jnp.float32)
            ctx = ctx.astype(dtype).reshape(b, s, h)
            a = DenseM(cfg.hidden_size, name="attn_out")(ctx)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                             name="attn_layernorm")(x + a)
            x = x.astype(dtype)
            hdn = DenseM(cfg.intermediate_size, name="intermediate")(x)
            # HF "gelu" is the exact erf form; "gelu_new" the tanh approx
            hdn = nn.gelu(hdn, approximate=cfg.hidden_act == "gelu_new")
            hdn = DenseM(cfg.hidden_size, name="output")(hdn)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                             name="out_layernorm")(x + hdn)
            return x.astype(dtype)

    class Bert(nn.Module):
        @nn.compact
        def __call__(self, ids, mask):
            word = EmbedM(cfg.vocab_size, cfg.hidden_size,
                          name="word_embeddings")(ids)
            if roberta:
                pos_ids = roberta_position_ids(ids, mask, cfg.pad_token_id)
            else:
                pos_ids = jnp.arange(ids.shape[1])[None, :]
            pos = EmbedM(cfg.max_position_embeddings, cfg.hidden_size,
                         name="position_embeddings")(pos_ids)
            typ = EmbedM(cfg.type_vocab_size, cfg.hidden_size,
                         name="token_type_embeddings")(jnp.zeros_like(ids))
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                             name="emb_layernorm")(word + pos + typ)
            x = x.astype(dtype)
            bias = (1.0 - mask[:, None, None, :].astype(jnp.float32)) * -1e9
            for i in range(cfg.num_hidden_layers):
                x = Layer(name=f"layer_{i}")(x, bias)
            return x  # (B, S, H) last hidden state

    return Bert()


# ------------------------------------------------------------ HF weight map

def _read_hf_state_dict(model_dir: Path) -> dict[str, np.ndarray]:
    """Load the raw tensor dict from an HF checkpoint directory."""
    st = model_dir / "model.safetensors"
    if st.exists():
        from safetensors.numpy import load_file
        return load_file(st)
    bins = sorted(model_dir.glob("pytorch_model*.bin"))
    if not bins:
        raise FileNotFoundError(
            f"no model.safetensors or pytorch_model*.bin in {model_dir}")
    import torch
    state: dict[str, np.ndarray] = {}
    for b in bins:
        sd = torch.load(b, map_location="cpu", weights_only=True)
        state.update({k: v.float().numpy() for k, v in sd.items()})
    return state


def load_hf_params(model_dir: str | Path, cfg: BertConfig,
                   param_dtype=jnp.float32) -> dict:
    """HF BertModel state dict -> this module's Flax param tree.

    Accepts bare BertModel/RobertaModel/XLMRobertaModel keys
    (``embeddings.word_embeddings.weight``) and task-model keys with a
    ``bert.``/``roberta.`` prefix — the encoder key layout is identical
    across the three families. torch Linear weights are (out, in) and
    transpose to Flax (in, out) kernels; LayerNorm weight/bias become
    scale/bias."""
    model_dir = Path(model_dir)
    raw = _read_hf_state_dict(model_dir)
    state = {}
    for k, v in raw.items():
        for prefix in ("bert.", "roberta."):
            if k.startswith(prefix):
                k = k[len(prefix):]
                break
        state[k] = np.asarray(v)

    def emb(name):
        return {"embedding": jnp.asarray(state[f"embeddings.{name}.weight"],
                                         param_dtype)}

    def ln(prefix):
        return {"scale": jnp.asarray(state[f"{prefix}.weight"], param_dtype),
                "bias": jnp.asarray(state[f"{prefix}.bias"], param_dtype)}

    def dense(prefix):
        return {"kernel": jnp.asarray(state[f"{prefix}.weight"].T,
                                      param_dtype),
                "bias": jnp.asarray(state[f"{prefix}.bias"], param_dtype)}

    params = {
        "word_embeddings": emb("word_embeddings"),
        "position_embeddings": emb("position_embeddings"),
        "token_type_embeddings": emb("token_type_embeddings"),
        "emb_layernorm": ln("embeddings.LayerNorm"),
    }
    n_layers = 0
    while f"encoder.layer.{n_layers}.attention.self.query.weight" in state:
        n_layers += 1
    if n_layers != cfg.num_hidden_layers:
        raise ValueError(f"checkpoint has {n_layers} layers, config says "
                         f"{cfg.num_hidden_layers}")
    for i in range(n_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "query": dense(f"{p}.attention.self.query"),
            "key": dense(f"{p}.attention.self.key"),
            "value": dense(f"{p}.attention.self.value"),
            "attn_out": dense(f"{p}.attention.output.dense"),
            "attn_layernorm": ln(f"{p}.attention.output.LayerNorm"),
            "intermediate": dense(f"{p}.intermediate.dense"),
            "output": dense(f"{p}.output.dense"),
            "out_layernorm": ln(f"{p}.output.LayerNorm"),
        }
    logger.info("mapped HF checkpoint %s: %d layers, hidden %d",
                model_dir, n_layers, cfg.hidden_size)
    return {"params": params}


# --------------------------------------------------- int8/int4 quantization

def quantize_params(variables: dict, bits: int = 8,
                    keep_f32: tuple[str, ...] = ()) -> dict:
    """f32 param tree (load_hf_params) -> quantized tree for
    make_bert_module(quantized="int8"/"int4").

    bits=8: symmetric per-output-channel int8 scales for Dense kernels.
    bits=4: Dense kernels quantized to int4 with GROUP-wise scales
    (Q4_GROUP input rows per scale) and packed two-nibbles-per-byte.
    Embedding tables are per-hidden-channel int8 in both modes; LayerNorms
    and biases stay f32 (negligible bytes, load-bearing precision).
    Equivalent role to the reference's pre-baked 4-bit registry
    (mlx_lm_pipeline.py:54-78), applied at load time to ANY HF checkpoint.
    Parity gates: embedding cosine >= 0.999 (int8) / >= 0.98 (int4) vs the
    f32 tree (tests/test_bert.py)."""

    def q_matrix(m: np.ndarray):
        m = np.asarray(m, np.float32)
        scale = np.maximum(np.max(np.abs(m), axis=0) / 127.0, 1e-12)
        q = np.clip(np.round(m / scale[None, :]), -127, 127).astype(np.int8)
        return q, scale.astype(np.float32)

    def q4_matrix(m: np.ndarray):
        m = np.asarray(m, np.float32)
        in_f, out_f = m.shape
        g = min(Q4_GROUP, in_f)
        if in_f % g or in_f % 2:
            raise ValueError(
                f"int4 needs in_features divisible by {g}, got {in_f}")
        mg = m.reshape(in_f // g, g, out_f)
        scale = np.maximum(np.abs(mg).max(axis=1) / 7.0, 1e-12)  # (G, out)
        q = np.clip(np.round(mg / scale[:, None, :]), -8, 7)
        q = q.reshape(in_f, out_f).astype(np.int8)
        u = (q + 8).astype(np.uint8)
        packed = (u[0::2] | (u[1::2] << 4)).astype(np.uint8)
        return packed, scale.astype(np.float32)

    def q_dense(d):
        if bits == 4:
            q, s = q4_matrix(d["kernel"])
            return {"kernel_q4": jnp.asarray(q), "scale": jnp.asarray(s),
                    "bias": jnp.asarray(d["bias"], jnp.float32)}
        q, s = q_matrix(d["kernel"])
        return {"kernel_q": jnp.asarray(q), "scale": jnp.asarray(s),
                "bias": jnp.asarray(d["bias"], jnp.float32)}

    def q_embed(d):
        q, s = q_matrix(d["embedding"])
        return {"embedding_q": jnp.asarray(q), "scale": jnp.asarray(s)}

    src = variables["params"]
    out = {}
    for name, sub in src.items():
        if name in keep_f32:  # e.g. MPNet's (32, heads) rel-pos bias table
            out[name] = jax.tree_util.tree_map(
                lambda v: jnp.asarray(v, jnp.float32), sub)
        elif "kernel" in sub:
            out[name] = q_dense(sub)
        elif "embedding" in sub:
            out[name] = q_embed(sub)
        elif name.startswith("layer_"):
            out[name] = {
                inner: (q_dense(block) if "kernel" in block else
                        {k: jnp.asarray(v, jnp.float32)
                         for k, v in block.items()})
                for inner, block in sub.items()
            }
        else:  # layernorms
            out[name] = {k: jnp.asarray(v, jnp.float32)
                         for k, v in sub.items()}
    return {"params": out}


def param_bytes(variables: dict) -> int:
    """Total on-device parameter bytes (for the quantization memory row)."""
    return sum(int(np.prod(x.shape)) * x.dtype.itemsize
               for x in jax.tree_util.tree_leaves(variables))


# ------------------------------------------------------------------ pooling

def pool_hidden(hidden: jnp.ndarray, mask: jnp.ndarray,
                pooling: str) -> jnp.ndarray:
    """'mean' (MiniLM / sentence-transformers) or 'cls' (bge-*) pooling of
    the last hidden state, then L2 normalization — the exact recipe the
    reference applied (mlx_lm_pipeline.py:81-108,293-311)."""
    if pooling == "cls":
        pooled = hidden[:, 0, :].astype(jnp.float32)
    else:
        m = mask.astype(jnp.float32)[:, :, None]
        pooled = (jnp.sum(hidden.astype(jnp.float32) * m, axis=1)
                  / jnp.maximum(jnp.sum(m, axis=1), 1e-9))
    norm = jnp.linalg.norm(pooled, axis=-1, keepdims=True)
    return pooled / jnp.maximum(norm, 1e-12)
