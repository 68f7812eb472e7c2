"""Golden parity tests for the MPNet family (all-mpnet-base-v2 in the
reference registry, integrations/mlx_lm_pipeline.py:76): tokenizer vs
transformers.MPNetTokenizer over the same vocab, and the Flax MPNet
forward (pipeline/mpnet.py) vs torch transformers.MPNetModel on a tiny
random checkpoint saved in HF format — no network access."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from tpu_vector_db.pipeline.wordpiece import WordPieceTokenizer  # noqa: E402

VOCAB_WORDS = [
    "<s>", "<pad>", "</s>", "[UNK]", "<mask>",
    "the", "quick", "brown", "fox", "jump", "##s", "##ed", "##ing",
    "over", "lazy", "dog", "cat", "run", "##ner", "un", "##believ",
    "##able", "hello", "world", "!", "?", ",", ".", "'", "don", "t",
    "2", "##0", "##2", "##4", "a", "##a", "b", "##b", "c", "##c",
    "temperature", "vector", "data", "##base", "search", "engine",
]

TEXTS = [
    "The quick brown fox jumps over the lazy dog!",
    "Hello, world. Don't.",
    "unbelievable runner running 2024",
    "vector database search engine",
    "UNKNOWNWORDXYZ temperature",
    "",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("mpnet_vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB_WORDS) + "\n", encoding="utf-8")
    return p


def make_tokenizer(vocab_file):
    return WordPieceTokenizer(vocab_file, pad_token="<pad>",
                              cls_token="<s>", sep_token="</s>",
                              unk_token="[UNK]")


class TestMPNetTokenizerParity:
    def test_token_ids_match_hf(self, vocab_file):
        ours = make_tokenizer(vocab_file)
        theirs = transformers.MPNetTokenizer(str(vocab_file),
                                             do_lower_case=True)
        for text in TEXTS:
            got = ours.encode(text, max_length=32)
            want = theirs.encode(text, truncation=True, max_length=32)
            assert got == want, (text, ours.tokenize(text),
                                 theirs.tokenize(text))

    def test_framing_ids(self, vocab_file):
        tok = make_tokenizer(vocab_file)
        assert tok.cls_id == 0 and tok.pad_id == 1 and tok.sep_id == 2
        ids = tok.encode("the quick fox")
        assert ids[0] == 0 and ids[-1] == 2


@pytest.fixture(scope="module")
def tiny_mpnet_checkpoint(tmp_path_factory):
    """A tiny random MPNetModel saved in HF format; torch is golden."""
    d = tmp_path_factory.mktemp("tiny_mpnet")
    cfg = transformers.MPNetConfig(
        vocab_size=len(VOCAB_WORDS), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, relative_attention_num_buckets=32)
    torch.manual_seed(0)
    model = transformers.MPNetModel(cfg)
    model.eval()
    model.save_pretrained(d)
    (d / "vocab.txt").write_text("\n".join(VOCAB_WORDS) + "\n",
                                 encoding="utf-8")
    return d, model


def torch_embed(model, ids, mask, pooling="mean"):
    with torch.no_grad():
        out = model(input_ids=torch.tensor(ids),
                    attention_mask=torch.tensor(mask))
    hidden = out.last_hidden_state.numpy()
    if pooling == "cls":
        pooled = hidden[:, 0, :]
    else:
        m = mask[:, :, None].astype(np.float32)
        pooled = (hidden * m).sum(1) / np.maximum(m.sum(1), 1e-9)
    return pooled / np.maximum(
        np.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)


class TestFlaxMPNetParity:
    @pytest.mark.parametrize("pooling", ["mean", "cls"])
    def test_forward_matches_torch(self, tiny_mpnet_checkpoint, vocab_file,
                                   pooling):
        import jax.numpy as jnp

        from tpu_vector_db.pipeline import bert, mpnet

        d, torch_model = tiny_mpnet_checkpoint
        cfg = mpnet.MPNetConfig.from_hf_dir(d)
        assert cfg.model_type == "mpnet"
        module = mpnet.make_mpnet_module(cfg, compute_dtype=jnp.float32)
        params = mpnet.load_hf_params(d, cfg)

        tok = make_tokenizer(vocab_file)
        ids, mask = tok.encode_batch(
            ["the quick brown fox jumps", "hello world !",
             "unbelievable 2024"], seq_len=16)
        hidden = module.apply(params, jnp.asarray(ids), jnp.asarray(mask))
        got = np.asarray(bert.pool_hidden(
            hidden, jnp.asarray(mask), pooling), np.float32)
        want = torch_embed(torch_model, ids, mask, pooling)
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_bucket_function_matches_torch(self):
        """relative_position_bucket must be bit-equal to the torch
        staticmethod across the whole ±512 range."""
        import jax.numpy as jnp

        from transformers.models.mpnet.modeling_mpnet import MPNetEncoder
        from tpu_vector_db.pipeline.mpnet import relative_position_bucket

        rel = np.arange(-512, 513, dtype=np.int64)
        want = MPNetEncoder.relative_position_bucket(
            torch.tensor(rel)).numpy()
        got = np.asarray(relative_position_bucket(jnp.asarray(rel)))
        np.testing.assert_array_equal(got, want)

    def test_encoder_end_to_end(self, tiny_mpnet_checkpoint):
        """create_encoder('hf:<dir>') must dispatch on model_type=mpnet
        and reproduce the torch ranking."""
        from tpu_vector_db.pipeline.encoders import create_encoder

        d, torch_model = tiny_mpnet_checkpoint
        enc = create_encoder(f"hf:{d}", dtype="float32")
        corpus = ["the quick brown fox", "lazy dog", "hello world",
                  "vector database search", "temperature data"]
        query = ["quick fox jumps"]
        got_c = enc.encode(corpus)
        got_q = enc.encode(query)
        assert got_c.shape == (5, 32)

        tok = make_tokenizer(d / "vocab.txt")
        ids, mask = tok.encode_batch(corpus + query, seq_len=32)
        want = torch_embed(torch_model, ids, mask)
        np.testing.assert_allclose(got_c, want[:5], atol=2e-4)
        got_rank = np.argsort(-(got_c @ got_q[0]))
        want_rank = np.argsort(-(want[:5] @ want[5]))
        np.testing.assert_array_equal(got_rank, want_rank)

    @pytest.mark.parametrize("quant,gate", [("int8", 0.99), ("int4", 0.98)])
    def test_quantized_end_to_end(self, tiny_mpnet_checkpoint, quant, gate):
        from tpu_vector_db.pipeline.encoders import create_encoder

        d, _ = tiny_mpnet_checkpoint
        enc_f32 = create_encoder(f"hf:{d}", dtype="float32")
        enc_q = create_encoder(f"hf:{d}", dtype="float32", quantize=quant)
        texts = ["the quick brown fox", "vector database search engine"]
        cos = np.sum(enc_f32.encode(texts) * enc_q.encode(texts), axis=-1)
        assert np.all(cos >= gate), cos

    def test_rel_bias_stays_f32_when_quantized(self, tiny_mpnet_checkpoint):
        import jax.numpy as jnp

        from tpu_vector_db.pipeline import mpnet

        d, _ = tiny_mpnet_checkpoint
        cfg = mpnet.MPNetConfig.from_hf_dir(d)
        params = mpnet.load_hf_params(d, cfg)
        q = mpnet.quantize_params(params, bits=8)
        assert q["params"]["rel_bias"]["embedding"].dtype == jnp.float32
