"""Golden parity tests for the XLM-RoBERTa family (multilingual-e5-* in
the reference registry, integrations/mlx_lm_pipeline.py:74-75): the
Unigram/SentencePiece tokenizer (pipeline/unigram.py) id-for-id vs the
Rust ``tokenizers`` implementation over the same tokenizer.json, and the
RoBERTa-position Flax forward vs torch transformers.XLMRobertaModel on a
tiny random checkpoint — no network access."""

import json

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")
tokenizers = pytest.importorskip("tokenizers")

from tpu_vector_db.pipeline.unigram import UnigramTokenizer  # noqa: E402

CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "vector databases index embeddings for similarity search",
    "tokenization with unigram language models uses viterbi decoding",
    "hello world this is a test of the tokenizer pipeline",
    "tpu kernels run matrix multiplications on the mxu systolic array",
    "züge fahren schnell durch die nacht",
    "la recherche vectorielle est rapide",
] * 10

TEXTS = [
    "hello world, the quickest fox!",
    "the quick brown fox jumps over the lazy dog",
    "viterbi decoding of unigram language models",
    "   leading and trailing   spaces   ",
    "UPPER Case MiXeD",
    "unicode: café naïve résumé ñ ü ß 日本語",
    "numbers 12345 and symbols @#$%^&*()",
    "", " ", "a",
    "tabs\tand\nnewlines mixed   in",
    "züge fahren schnell",
]


@pytest.fixture(scope="module")
def unigram_fixture(tmp_path_factory):
    """Train a small Unigram tokenizer (XLM-R-style specials + Metaspace
    pre-tokenization) with the Rust library; both sides read the same
    tokenizer.json."""
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers, \
        trainers

    d = tmp_path_factory.mktemp("unigram")
    tok = Tokenizer(models.Unigram())
    tok.normalizer = normalizers.Sequence([normalizers.NFKC()])
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always")
    trainer = trainers.UnigramTrainer(
        vocab_size=200, special_tokens=["<s>", "<pad>", "</s>", "<unk>"],
        unk_token="<unk>")
    tok.train_from_iterator(CORPUS, trainer)
    path = d / "tokenizer.json"
    tok.save(str(path))
    return path, tok


class TestUnigramParity:
    def test_ids_match_rust(self, unigram_fixture):
        path, rust = unigram_fixture
        mine = UnigramTokenizer(path)
        for text in TEXTS:
            got = mine.tokenize_ids(text)
            want = rust.encode(text).ids
            assert got == want, (text, mine.tokenize(text),
                                 rust.encode(text).tokens)

    def test_ids_match_rust_fuzz(self, unigram_fixture):
        import random
        import string

        path, rust = unigram_fixture
        mine = UnigramTokenizer(path)
        rng = random.Random(7)
        alphabet = string.ascii_letters + string.digits + " .,!?-_éü日本 \t"
        for _ in range(200):
            text = "".join(rng.choice(alphabet)
                           for _ in range(rng.randint(1, 60)))
            assert mine.tokenize_ids(text) == rust.encode(text).ids, text

    def test_framing_and_truncation(self, unigram_fixture):
        path, _ = unigram_fixture
        tok = UnigramTokenizer(path)
        assert tok.cls_id == 0 and tok.pad_id == 1 and tok.sep_id == 2
        ids = tok.encode("the quick brown fox", max_length=6)
        assert len(ids) == 6
        assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id

    def test_batch_shapes(self, unigram_fixture):
        path, _ = unigram_fixture
        tok = UnigramTokenizer(path)
        ids, mask = tok.encode_batch(["the fox", ""], seq_len=16)
        assert ids.shape == (2, 16) and mask.shape == (2, 16)
        assert mask[1].sum() == 2  # <s> </s>
        assert ids[0, mask[0].sum():].tolist() == [tok.pad_id] * int(
            16 - mask[0].sum())

    def test_rejects_non_unigram_json(self, tmp_path):
        bad = tmp_path / "tokenizer.json"
        bad.write_text(json.dumps({"model": {"type": "BPE", "vocab": {}}}))
        with pytest.raises(ValueError, match="Unigram"):
            UnigramTokenizer(bad)


@pytest.fixture(scope="module")
def tiny_xlmr_checkpoint(tmp_path_factory, unigram_fixture):
    """A tiny random XLMRobertaModel + the trained tokenizer.json saved as
    one HF checkpoint directory; torch is golden."""
    tok_path, rust = unigram_fixture
    d = tmp_path_factory.mktemp("tiny_xlmr")
    vocab_size = rust.get_vocab_size()
    cfg = transformers.XLMRobertaConfig(
        vocab_size=vocab_size, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=80, type_vocab_size=1, pad_token_id=1)
    torch.manual_seed(0)
    model = transformers.XLMRobertaModel(cfg)
    model.eval()
    model.save_pretrained(d)
    (d / "tokenizer.json").write_text(tok_path.read_text())
    return d, model, rust


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


class TestFlaxXLMRobertaParity:
    @pytest.mark.parametrize("pooling", ["mean", "cls"])
    def test_forward_matches_torch(self, tiny_xlmr_checkpoint, pooling):
        import jax.numpy as jnp

        from tpu_vector_db.pipeline import bert

        d, torch_model, _ = tiny_xlmr_checkpoint
        cfg = bert.BertConfig.from_hf_dir(d)
        assert cfg.model_type == "xlm-roberta"
        assert cfg.pad_token_id == 1
        module = bert.make_bert_module(cfg, compute_dtype=jnp.float32)
        params = bert.load_hf_params(d, cfg)

        tok = UnigramTokenizer(d / "tokenizer.json")
        ids, mask = tok.encode_batch(
            ["the quick brown fox jumps", "hello world",
             "viterbi decoding"], seq_len=16)
        hidden = module.apply(params, jnp.asarray(ids), jnp.asarray(mask))
        got = np.asarray(bert.pool_hidden(
            hidden, jnp.asarray(mask), pooling), np.float32)
        want = torch_embed(torch_model, ids, mask, pooling)
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_position_ids_match_torch(self):
        """roberta_position_ids must equal transformers'
        create_position_ids_from_input_ids for right-padded rows."""
        import jax.numpy as jnp

        from transformers.models.xlm_roberta.modeling_xlm_roberta import \
            create_position_ids_from_input_ids
        from tpu_vector_db.pipeline.bert import roberta_position_ids

        ids = np.array([[5, 9, 7, 1, 1], [6, 1, 1, 1, 1]], np.int64)
        mask = (ids != 1).astype(np.int32)
        want = create_position_ids_from_input_ids(
            torch.tensor(ids), padding_idx=1).numpy()
        got = np.asarray(roberta_position_ids(
            jnp.asarray(ids), jnp.asarray(mask), pad_id=1))
        np.testing.assert_array_equal(got, want)

    def test_encoder_end_to_end(self, tiny_xlmr_checkpoint):
        """create_encoder('hf:<dir>') must dispatch on
        model_type=xlm-roberta (Unigram tokenizer + RoBERTa positions)
        and reproduce the torch ranking."""
        from tpu_vector_db.pipeline.encoders import create_encoder

        d, torch_model, rust = tiny_xlmr_checkpoint
        enc = create_encoder(f"hf:{d}", dtype="float32")
        corpus = ["the quick brown fox", "vector databases",
                  "hello world pipeline", "viterbi decoding",
                  "züge fahren schnell"]
        query = ["quick fox jumps"]
        got_c = enc.encode(corpus)
        got_q = enc.encode(query)
        assert got_c.shape == (5, 32)
        np.testing.assert_allclose(
            np.linalg.norm(got_c, axis=-1), 1.0, atol=1e-5)

        tok = UnigramTokenizer(d / "tokenizer.json")
        ids, mask = tok.encode_batch(corpus + query, seq_len=32)
        want = torch_embed(torch_model, ids, mask)
        np.testing.assert_allclose(got_c, want[:5], atol=2e-4)
        got_rank = np.argsort(-(got_c @ got_q[0]))
        want_rank = np.argsort(-(want[:5] @ want[5]))
        np.testing.assert_array_equal(got_rank, want_rank)

    @pytest.mark.parametrize("quant,gate", [("int8", 0.99), ("int4", 0.95)])
    def test_quantized_end_to_end(self, tiny_xlmr_checkpoint, quant, gate):
        from tpu_vector_db.pipeline.encoders import create_encoder

        d, _, _ = tiny_xlmr_checkpoint
        enc_f32 = create_encoder(f"hf:{d}", dtype="float32")
        enc_q = create_encoder(f"hf:{d}", dtype="float32", quantize=quant)
        texts = ["the quick brown fox", "viterbi decoding"]
        cos = np.sum(enc_f32.encode(texts) * enc_q.encode(texts), axis=-1)
        assert np.all(cos >= gate), cos
