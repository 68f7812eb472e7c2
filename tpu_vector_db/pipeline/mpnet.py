"""Faithful MPNet encoder in Flax + HF checkpoint weight mapping.

The reference's embedding registry includes ``all-mpnet-base-v2-4bit``
(integrations/mlx_lm_pipeline.py:76) — an MPNet-architecture sentence
encoder, NOT a BERT: it has no token-type embeddings, indexes absolute
positions RoBERTa-style from padding_idx=1, and adds a T5-style relative
position bias (32 log-bucketed buckets, max_distance=128, one shared
(buckets, heads) table for the whole stack) to every attention score.
This module reproduces ``transformers.MPNetModel`` numerics so that
checkpoint family serves through the same TPU pipeline as BERT/XLM-R.

Numerical parity is tested against torch ``MPNetModel`` on a tiny
randomly-initialized checkpoint saved in HF format (tests/test_mpnet.py)
— golden embeddings without network access.

TPU notes: matmuls run in a configurable dtype (bf16 on TPU), LayerNorms
and softmax in float32; the relative-position bucket matrix is a pure
function of the static sequence length, so XLA folds it to a constant
per (batch, seq) bucket. Quantization (int8/int4) shares
pipeline/bert.py's layer machinery; the (32, heads) bias table is kept
f32 via quantize_params(keep_f32=("rel_bias",)).
"""

from __future__ import annotations

import json
import logging
from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from tpu_vector_db.pipeline import bert as _bert

logger = logging.getLogger(__name__)


@dataclass
class MPNetConfig:
    vocab_size: int = 30527
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu"
    relative_attention_num_buckets: int = 32
    pad_token_id: int = 1
    model_type: str = "mpnet"

    @classmethod
    def from_hf_dir(cls, path: str | Path) -> "MPNetConfig":
        raw = json.loads((Path(path) / "config.json").read_text())
        fields = {f: raw[f] for f in cls.__dataclass_fields__ if f in raw}
        return cls(**fields)


def relative_position_bucket(relative_position: jnp.ndarray,
                             num_buckets: int = 32,
                             max_distance: int = 128) -> jnp.ndarray:
    """Bidirectional T5-style log bucketing, exactly
    MPNetEncoder.relative_position_bucket (modeling_mpnet.py): sign takes
    half the buckets, |n| < buckets/4 exact, larger distances log-spaced
    up to max_distance."""
    n = -relative_position
    num_buckets //= 2
    ret = (n < 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(n)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    # torch .to(long) truncates; guard log(0) (masked out by is_small)
    val_if_large = max_exact + (
        jnp.log(jnp.maximum(n, 1).astype(jnp.float32) / max_exact)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def make_mpnet_module(cfg: MPNetConfig, compute_dtype=jnp.bfloat16,
                      quantized=False):
    """Build the Flax MPNet. Layout: one named submodule per HF tensor
    group so load_hf_params is positional-free. Differences vs the BERT
    module (pipeline/bert.py): q/k/v/o projections live inside the
    attention block (HF keys attention.attn.{q,k,v,o}), no token-type
    embeddings, RoBERTa-style position ids, and a shared rel-pos bias
    added to the attention scores of every layer."""
    import flax.linen as nn

    mode = _bert.quant_mode(quantized)
    dtype = compute_dtype
    head_dim = cfg.hidden_size // cfg.num_attention_heads
    DenseM, EmbedM = _bert.make_layer_factories(dtype, mode)

    class Layer(nn.Module):
        @nn.compact
        def __call__(self, x, bias):
            b, s, h = x.shape
            q = DenseM(cfg.hidden_size, name="q")(x)
            k = DenseM(cfg.hidden_size, name="k")(x)
            v = DenseM(cfg.hidden_size, name="v")(x)
            q = q.reshape(b, s, cfg.num_attention_heads, head_dim)
            k = k.reshape(b, s, cfg.num_attention_heads, head_dim)
            v = v.reshape(b, s, cfg.num_attention_heads, head_dim)
            scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                                preferred_element_type=jnp.float32)
            # HF order: scale, + position_bias, + attention_mask
            scores = scores / np.sqrt(head_dim) + bias
            probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
            ctx = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(dtype), v,
                             preferred_element_type=jnp.float32)
            ctx = ctx.astype(dtype).reshape(b, s, h)
            a = DenseM(cfg.hidden_size, name="o")(ctx)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                             name="attn_layernorm")(x + a)
            x = x.astype(dtype)
            hdn = DenseM(cfg.intermediate_size, name="intermediate")(x)
            hdn = nn.gelu(hdn, approximate=cfg.hidden_act == "gelu_new")
            hdn = DenseM(cfg.hidden_size, name="output")(hdn)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                             name="out_layernorm")(x + hdn)
            return x.astype(dtype)

    class MPNet(nn.Module):
        @nn.compact
        def __call__(self, ids, mask):
            word = EmbedM(cfg.vocab_size, cfg.hidden_size,
                          name="word_embeddings")(ids)
            pos_ids = _bert.roberta_position_ids(ids, mask,
                                                 cfg.pad_token_id)
            pos = EmbedM(cfg.max_position_embeddings, cfg.hidden_size,
                         name="position_embeddings")(pos_ids)
            x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                             name="emb_layernorm")(word + pos)
            x = x.astype(dtype)

            # shared relative position bias, computed once per seq length
            # (MPNetEncoder.compute_position_bias): (1, H, S, S)
            s = ids.shape[1]
            ctx_pos = jnp.arange(s)[:, None]
            mem_pos = jnp.arange(s)[None, :]
            rp_bucket = relative_position_bucket(
                mem_pos - ctx_pos, cfg.relative_attention_num_buckets)
            # always a plain f32 Embed — quantize_params keeps this table
            # f32 even in int8/int4 mode (keep_f32), so the module must too
            rel = nn.Embed(cfg.relative_attention_num_buckets,
                           cfg.num_attention_heads, dtype=jnp.float32,
                           name="rel_bias")(rp_bucket)      # (S, S, H)
            pos_bias = jnp.transpose(rel, (2, 0, 1))[None].astype(
                jnp.float32)

            attn_mask = (1.0 - mask[:, None, None, :]
                         .astype(jnp.float32)) * -1e9
            bias = pos_bias + attn_mask
            for i in range(cfg.num_hidden_layers):
                x = Layer(name=f"layer_{i}")(x, bias)
            return x  # (B, S, H) last hidden state

    return MPNet()


def load_hf_params(model_dir: str | Path, cfg: MPNetConfig,
                   param_dtype=jnp.float32) -> dict:
    """HF MPNetModel state dict -> this module's Flax param tree.

    Accepts bare MPNetModel keys and task-model keys with an ``mpnet.``
    prefix; the (unused-for-sentence-embedding) pooler head is ignored.
    torch Linear weights transpose to Flax kernels; LayerNorm weight/bias
    become scale/bias."""
    model_dir = Path(model_dir)
    raw = _bert._read_hf_state_dict(model_dir)
    state = {}
    for k, v in raw.items():
        state[k[6:] if k.startswith("mpnet.") else k] = np.asarray(v)

    def emb(key):
        return {"embedding": jnp.asarray(state[key], param_dtype)}

    def ln(prefix):
        return {"scale": jnp.asarray(state[f"{prefix}.weight"], param_dtype),
                "bias": jnp.asarray(state[f"{prefix}.bias"], param_dtype)}

    def dense(prefix):
        return {"kernel": jnp.asarray(state[f"{prefix}.weight"].T,
                                      param_dtype),
                "bias": jnp.asarray(state[f"{prefix}.bias"], param_dtype)}

    params = {
        "word_embeddings": emb("embeddings.word_embeddings.weight"),
        "position_embeddings": emb("embeddings.position_embeddings.weight"),
        "emb_layernorm": ln("embeddings.LayerNorm"),
        "rel_bias": emb("encoder.relative_attention_bias.weight"),
    }
    n_layers = 0
    while f"encoder.layer.{n_layers}.attention.attn.q.weight" in state:
        n_layers += 1
    if n_layers != cfg.num_hidden_layers:
        raise ValueError(f"checkpoint has {n_layers} layers, config says "
                         f"{cfg.num_hidden_layers}")
    for i in range(n_layers):
        p = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "q": dense(f"{p}.attention.attn.q"),
            "k": dense(f"{p}.attention.attn.k"),
            "v": dense(f"{p}.attention.attn.v"),
            "o": dense(f"{p}.attention.attn.o"),
            "attn_layernorm": ln(f"{p}.attention.LayerNorm"),
            "intermediate": dense(f"{p}.intermediate.dense"),
            "output": dense(f"{p}.output.dense"),
            "out_layernorm": ln(f"{p}.output.LayerNorm"),
        }
    logger.info("mapped HF MPNet checkpoint %s: %d layers, hidden %d",
                model_dir, n_layers, cfg.hidden_size)
    return {"params": params}


def quantize_params(variables: dict, bits: int = 8) -> dict:
    """int8/int4 weight quantization for an MPNet tree — shares
    pipeline/bert.py's quantizer; the (buckets, heads) rel-pos bias table
    stays f32 (tiny and precision-sensitive: it feeds raw attention
    logits)."""
    return _bert.quantize_params(variables, bits=bits,
                                 keep_f32=("rel_bias",))
