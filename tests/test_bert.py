"""Golden parity tests: WordPiece vs transformers.BertTokenizer, and the
Flax BERT forward vs torch transformers.BertModel on a tiny random
checkpoint saved in HF format — real pretrained-model serving validated
without network access (reference capability:
integrations/mlx_lm_pipeline.py:149-321)."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")
torch = pytest.importorskip("torch")

from tpu_vector_db.pipeline.wordpiece import WordPieceTokenizer  # noqa: E402

VOCAB_WORDS = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "quick", "brown", "fox", "jump", "##s", "##ed", "##ing",
    "over", "lazy", "dog", "cat", "run", "##ner", "un", "##believ",
    "##able", "hello", "world", "!", "?", ",", ".", "'", "don", "t",
    "2", "##0", "##2", "##4", "a", "##a", "b", "##b", "c", "##c",
    "temperature", "vector", "data", "##base", "search", "engine",
    "天", "気",
]

TEXTS = [
    "The quick brown fox jumps over the lazy dog!",
    "Hello, world. Don't.",
    "unbelievable runner running 2024",
    "vector database search engine",
    "UNKNOWNWORDXYZ temperature",
    "  whitespace\t\tand\nnewlines  ",
    "天気 cjk handling",
    "",
    "punct!!!???...",
    "a.b.c a'b",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB_WORDS) + "\n", encoding="utf-8")
    return p


class TestWordPieceParity:
    def test_token_ids_match_hf(self, vocab_file):
        ours = WordPieceTokenizer(vocab_file)
        theirs = transformers.BertTokenizer(
            str(vocab_file), do_lower_case=True)
        for text in TEXTS:
            got = ours.encode(text, max_length=32)
            want = theirs.encode(text, truncation=True, max_length=32)
            assert got == want, (text, ours.tokenize(text),
                                 theirs.tokenize(text))

    def test_batch_shapes_and_mask(self, vocab_file):
        tok = WordPieceTokenizer(vocab_file)
        ids, mask = tok.encode_batch(["the quick fox", ""], seq_len=16)
        assert ids.shape == (2, 16) and mask.shape == (2, 16)
        assert mask[0].sum() == 5  # CLS the quick fox SEP
        assert mask[1].sum() == 2  # CLS SEP
        assert ids[0, mask[0].sum():].tolist() == [tok.pad_id] * 11

    def test_decode_roundtrip(self, vocab_file):
        tok = WordPieceTokenizer(vocab_file)
        ids = tok.encode("the quick brown fox")
        assert tok.decode(ids) == "the quick brown fox"


@pytest.fixture(scope="module")
def tiny_hf_checkpoint(tmp_path_factory):
    """A tiny random BertModel saved in HF format (config.json + weights +
    vocab.txt) — the golden reference forward is torch."""
    d = tmp_path_factory.mktemp("tiny_bert")
    cfg = transformers.BertConfig(
        vocab_size=len(VOCAB_WORDS), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2)
    torch.manual_seed(0)
    model = transformers.BertModel(cfg)
    model.eval()
    model.save_pretrained(d)
    (d / "vocab.txt").write_text("\n".join(VOCAB_WORDS) + "\n",
                                 encoding="utf-8")
    return d, model


class TestFlaxBertParity:
    def _torch_embed(self, model, ids, mask, pooling):
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

    @pytest.mark.parametrize("pooling", ["mean", "cls"])
    def test_forward_matches_torch(self, tiny_hf_checkpoint, pooling):
        import jax.numpy as jnp

        from tpu_vector_db.pipeline import bert

        d, torch_model = tiny_hf_checkpoint
        cfg = bert.BertConfig.from_hf_dir(d)
        module = bert.make_bert_module(cfg, compute_dtype=jnp.float32)
        params = bert.load_hf_params(d, cfg)

        tok = WordPieceTokenizer(d / "vocab.txt")
        ids, mask = tok.encode_batch(
            ["the quick brown fox jumps", "hello world !",
             "unbelievable 2024"], seq_len=16)
        hidden = module.apply(params, jnp.asarray(ids), jnp.asarray(mask))
        got = np.asarray(bert.pool_hidden(
            hidden, jnp.asarray(mask), pooling), np.float32)
        want = self._torch_embed(torch_model, ids, mask, pooling)
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_encoder_end_to_end_ranking(self, tiny_hf_checkpoint):
        """BertEncoder through the factory: embeddings from the real
        checkpoint must reproduce the torch reference's nearest-neighbor
        ranking (the golden-embedding gate from VERDICT.md item 2)."""
        from tpu_vector_db.pipeline.encoders import create_encoder

        d, torch_model = tiny_hf_checkpoint
        enc = create_encoder(f"hf:{d}", dtype="float32")
        corpus = ["the quick brown fox", "lazy dog", "hello world",
                  "vector database search", "temperature data"]
        query = ["quick fox jumps"]
        got_c = enc.encode(corpus)
        got_q = enc.encode(query)
        assert got_c.shape == (5, 32)
        np.testing.assert_allclose(
            np.linalg.norm(got_c, axis=-1), 1.0, atol=1e-5)

        tok = WordPieceTokenizer(d / "vocab.txt")
        ids, mask = tok.encode_batch(corpus + query, seq_len=32)
        want = self._torch_embed(torch_model, ids, mask, "mean")
        np.testing.assert_allclose(got_c, want[:5], atol=2e-4)
        got_rank = np.argsort(-(got_c @ got_q[0]))
        want_rank = np.argsort(-(want[:5] @ want[5]))
        np.testing.assert_array_equal(got_rank, want_rank)

    def test_loader_rejects_layer_mismatch(self, tiny_hf_checkpoint):
        from tpu_vector_db.pipeline import bert

        d, _ = tiny_hf_checkpoint
        cfg = bert.BertConfig.from_hf_dir(d)
        cfg.num_hidden_layers = 5
        with pytest.raises(ValueError, match="layers"):
            bert.load_hf_params(d, cfg)

    def test_overlong_text_keeps_sep(self, tiny_hf_checkpoint, monkeypatch):
        """When config.max_sequence_length exceeds the largest SEQ bucket,
        truncation must happen in the TOKENIZER (keeping the trailing
        [SEP]) — a bare row[:seq] cut dropped it (review finding)."""
        from tpu_vector_db.pipeline import encoders
        from tpu_vector_db.pipeline.encoders import create_encoder

        d, _ = tiny_hf_checkpoint
        monkeypatch.setattr(encoders, "SEQ_BUCKETS", (8, 16))
        enc = create_encoder(f"hf:{d}", dtype="float32",
                             max_sequence_length=64)
        enc.load()
        captured = {}
        orig = enc._forward

        def spy(params, ids, mask):
            captured["ids"] = np.asarray(ids)
            captured["mask"] = np.asarray(mask)
            return orig(params, ids, mask)

        enc._forward = spy
        long_text = " ".join(["quick brown fox"] * 40)  # >> 16 tokens
        out = enc.encode([long_text])
        assert out.shape[0] == 1
        ids, mask = captured["ids"], captured["mask"]
        assert ids.shape[1] == 16  # clamped to the largest bucket
        tok = WordPieceTokenizer(d / "vocab.txt")
        last_live = int(mask[0].sum()) - 1
        assert ids[0, last_live] == tok.sep_id  # [SEP] survived truncation


class TestInt8Quantization:
    """Per-channel int8 weight quantization (VERDICT r2 item 6): any HF
    checkpoint quantizes at load; embeddings must stay >= 0.99 cosine vs
    the f32 forward (the gate VERDICT specified), params shrink ~4x."""

    def test_quantized_forward_cosine(self, tiny_hf_checkpoint):
        import jax.numpy as jnp

        from tpu_vector_db.pipeline import bert

        d, _ = tiny_hf_checkpoint
        cfg = bert.BertConfig.from_hf_dir(d)
        tok = WordPieceTokenizer(d / "vocab.txt")
        ids, mask = tok.encode_batch(
            ["the quick brown fox jumps over the lazy dog",
             "hello world !", "unbelievable runner running 2024",
             "vector database search engine"], seq_len=16)

        f32_mod = bert.make_bert_module(cfg, compute_dtype=jnp.float32)
        f32_params = bert.load_hf_params(d, cfg)
        ref = np.asarray(bert.pool_hidden(
            f32_mod.apply(f32_params, jnp.asarray(ids), jnp.asarray(mask)),
            jnp.asarray(mask), "mean"), np.float32)

        q_mod = bert.make_bert_module(cfg, compute_dtype=jnp.float32,
                                      quantized=True)
        q_params = bert.quantize_params(f32_params)
        got = np.asarray(bert.pool_hidden(
            q_mod.apply(q_params, jnp.asarray(ids), jnp.asarray(mask)),
            jnp.asarray(mask), "mean"), np.float32)

        cos = np.sum(ref * got, axis=-1)  # both unit-norm
        assert np.all(cos >= 0.99), cos

        f32_b = bert.param_bytes(f32_params)
        q_b = bert.param_bytes(q_params)
        assert q_b < 0.35 * f32_b, (q_b, f32_b)

    def test_encoder_quantized_end_to_end(self, tiny_hf_checkpoint):
        from tpu_vector_db.pipeline.encoders import create_encoder

        d, _ = tiny_hf_checkpoint
        enc_f32 = create_encoder(f"hf:{d}", dtype="float32")
        enc_q = create_encoder(f"hf:{d}", dtype="float32", quantize="int8")
        texts = ["the quick brown fox", "hello world",
                 "vector database search engine"]
        ref = enc_f32.encode(texts)
        got = enc_q.encode(texts)
        cos = np.sum(ref * got, axis=-1)
        assert np.all(cos >= 0.99), cos

    def test_int4_forward_cosine(self, tiny_hf_checkpoint):
        """Group-wise int4 (packed nibbles, Q4_GROUP input rows per scale,
        the reference's 4-bit-checkpoint layout): embeddings stay >= 0.98
        cosine vs f32, Dense kernels shrink ~7x vs f32."""
        import jax.numpy as jnp

        from tpu_vector_db.pipeline import bert

        d, _ = tiny_hf_checkpoint
        cfg = bert.BertConfig.from_hf_dir(d)
        tok = WordPieceTokenizer(d / "vocab.txt")
        ids, mask = tok.encode_batch(
            ["the quick brown fox jumps over the lazy dog",
             "hello world !", "vector database search engine"], seq_len=16)

        f32_mod = bert.make_bert_module(cfg, compute_dtype=jnp.float32)
        f32_params = bert.load_hf_params(d, cfg)
        ref = np.asarray(bert.pool_hidden(
            f32_mod.apply(f32_params, jnp.asarray(ids), jnp.asarray(mask)),
            jnp.asarray(mask), "mean"), np.float32)

        q_mod = bert.make_bert_module(cfg, compute_dtype=jnp.float32,
                                      quantized="int4")
        q_params = bert.quantize_params(f32_params, bits=4)
        got = np.asarray(bert.pool_hidden(
            q_mod.apply(q_params, jnp.asarray(ids), jnp.asarray(mask)),
            jnp.asarray(mask), "mean"), np.float32)

        cos = np.sum(ref * got, axis=-1)
        assert np.all(cos >= 0.98), cos
        assert bert.param_bytes(q_params) < bert.param_bytes(
            bert.quantize_params(f32_params, bits=8))

    def test_int4_pack_roundtrip(self):
        """Packing convention: even input rows in the low nibble, odd in
        the high nibble; module-side unpack must reproduce the quantized
        values exactly."""
        from tpu_vector_db.pipeline import bert

        rng = np.random.default_rng(0)
        m = rng.standard_normal((64, 8)).astype(np.float32)
        q = bert.quantize_params(
            {"params": {"x": {"kernel": m, "bias": np.zeros(8, np.float32)}}},
            bits=4)["params"]["x"]
        packed = np.asarray(q["kernel_q4"])
        scale = np.asarray(q["scale"])
        lo = (packed & 15).astype(np.int32) - 8
        hi = ((packed >> 4) & 15).astype(np.int32) - 8
        unpacked = np.stack([lo, hi], axis=1).reshape(64, 8)
        deq = unpacked.astype(np.float32).reshape(
            scale.shape[0], -1, 8) * scale[:, None, :]
        deq = deq.reshape(64, 8)
        assert np.max(np.abs(deq - m)) <= np.max(np.abs(m)) / 7.0

    def test_encoder_int4_end_to_end(self, tiny_hf_checkpoint):
        from tpu_vector_db.pipeline.encoders import create_encoder

        d, _ = tiny_hf_checkpoint
        enc_f32 = create_encoder(f"hf:{d}", dtype="float32")
        enc_q = create_encoder(f"hf:{d}", dtype="float32", quantize="int4")
        texts = ["the quick brown fox", "vector database search engine"]
        cos = np.sum(enc_f32.encode(texts) * enc_q.encode(texts), axis=-1)
        assert np.all(cos >= 0.98), cos

    def test_bad_quantize_value_rejected(self, tiny_hf_checkpoint):
        from tpu_vector_db.pipeline.encoders import create_encoder

        d, _ = tiny_hf_checkpoint
        enc = create_encoder(f"hf:{d}", quantize="int2")
        with pytest.raises(ValueError, match="quantize"):
            enc.load()
