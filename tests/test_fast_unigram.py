"""Parity + fallback tests for the native Unigram tokenizer
(native/unigram.cpp via pipeline/fast_unigram.py): the C++ Metaspace +
Viterbi fast path must match the Python implementation id-for-id on the
FULL Unicode input space (normalization runs in Python on both paths), and
unsupported tokenizer.json configs must transparently fall back to Python.
The Python implementation itself is golden-tested vs the Rust
``tokenizers`` crate in tests/test_multilingual.py, so parity here is
transitive to the reference's tokenizer stack
(integrations/mlx_lm_pipeline.py:247-263)."""

import json
import random

import numpy as np
import pytest

from tpu_vector_db.pipeline.fast_unigram import (FastUnigramTokenizer,
                                                 native_available)
from tpu_vector_db.pipeline.unigram import UnigramTokenizer

# hand-built scored vocab: no training, fully deterministic, exercises
# multi-byte pieces, the word-boundary marker, and score-driven splits
PIECES = [
    ("<s>", 0.0), ("<pad>", 0.0), ("</s>", 0.0), ("<unk>", -12.0),
    ("▁", -3.0), ("▁the", -2.0), ("▁quick", -4.0), ("▁fox", -3.5),
    ("▁dog", -3.6), ("▁a", -2.5), ("a", -4.0), ("b", -4.2), ("c", -4.4),
    ("th", -5.0), ("e", -3.9), ("▁th", -4.8), ("qu", -5.5), ("ick", -5.2),
    ("▁über", -4.1), ("ü", -5.0), ("ber", -4.9), ("日", -4.5), ("本", -4.6),
    ("日本", -3.8), ("語", -4.7), ("▁日本", -4.2), ("x", -4.3), ("y", -4.4),
    ("z", -4.5), ("▁x", -4.9), ("12", -4.0), ("1", -4.8), ("2", -4.8),
    ("3", -4.9), ("!", -4.0), (",", -4.1), ("▁!", -5.3), ("ß", -5.1),
    ("é", -5.2), ("▁caf", -4.4), ("és", -5.4),
]


def make_json(tmp_path, pre_tokenizer, normalizer=None, name="tok.json"):
    spec = {
        "model": {"type": "Unigram", "vocab": [list(p) for p in PIECES],
                  "unk_id": 3},
        "normalizer": normalizer or {"type": "NFKC"},
        "pre_tokenizer": pre_tokenizer,
        "added_tokens": [],
    }
    p = tmp_path / name
    p.write_text(json.dumps(spec), encoding="utf-8")
    return p


METASPACE = {"type": "Metaspace", "replacement": "▁",
             "prepend_scheme": "always", "split": True}

TEXTS = [
    "the quick fox", "the quick brown fox jumps over the lazy dog",
    "   leading and trailing   spaces   ", "über café japan 日本語",
    "numbers 123 and 12321", "punct!,!x", "", " ", "a", "▁pre▁marked",
    "tabs\tand\nnewlines", "straße über caf és", "ＡＢＣ ½ ﬁ",  # NFKC-active
    "mixed 日本 and ascii xyz", "!,!", "x" * 200,
]

FUZZ_ALPHABET = ("abcxyz the quick fox ▁üß日本語é123!, \t\n"
                 "ＡＢ½ﬁΩ中한")

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="no C++ compiler")


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    d = tmp_path_factory.mktemp("funi")
    path = make_json(d, {"type": "Sequence", "pretokenizers": [METASPACE]})
    return FastUnigramTokenizer(path), UnigramTokenizer(path)


@needs_native
class TestNativeParity:
    def test_native_engaged(self, pair):
        fast, _ = pair
        assert fast.native

    def test_fixed_texts(self, pair):
        fast, slow = pair
        for t in TEXTS:
            assert fast.tokenize_ids(t) == slow.tokenize_ids(t), repr(t)

    def test_fuzz(self, pair):
        fast, slow = pair
        rng = random.Random(23)
        for _ in range(500):
            t = "".join(rng.choice(FUZZ_ALPHABET)
                        for _ in range(rng.randint(0, 70)))
            assert fast.tokenize_ids(t) == slow.tokenize_ids(t), repr(t)

    def test_encode_batch_parity(self, pair):
        fast, slow = pair
        ia, ma = fast.encode_batch(TEXTS, 24)
        ib, mb = slow.encode_batch(TEXTS, 24)
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_array_equal(ma, mb)
        assert ia.shape == (len(TEXTS), 24)

    def test_encode_framing_truncation(self, pair):
        fast, _ = pair
        ids = fast.encode("the quick fox the quick fox", max_length=5)
        assert len(ids) == 5
        assert ids[0] == fast.cls_id and ids[-1] == fast.sep_id

    def test_nul_text_falls_back(self, pair):
        fast, slow = pair
        t = "the\0quick"
        assert fast.tokenize_ids(t) == slow.tokenize_ids(t)


@needs_native
class TestConfigVariants:
    """Each supported pre-tokenizer config must be parity-exact; anything
    else must disable the native path but keep working through Python."""

    @pytest.mark.parametrize("pre", [
        None,  # bare sentencepiece
        {"type": "Metaspace", "replacement": "▁",
         "prepend_scheme": "first", "split": True},
        {"type": "Metaspace", "replacement": "▁",
         "prepend_scheme": "never", "split": True},
        {"type": "Metaspace", "replacement": "▁",
         "prepend_scheme": "always", "split": False},
        {"type": "Sequence", "pretokenizers": [
            {"type": "WhitespaceSplit"},
            {"type": "Metaspace", "replacement": "▁",
             "prepend_scheme": "always", "split": True}]},
        {"type": "WhitespaceSplit"},
    ])
    def test_variant_parity(self, tmp_path, pre):
        path = make_json(tmp_path, pre)
        fast, slow = FastUnigramTokenizer(path), UnigramTokenizer(path)
        assert fast.native
        rng = random.Random(5)
        for t in TEXTS:
            assert fast.tokenize_ids(t) == slow.tokenize_ids(t), repr(t)
        for _ in range(150):
            t = "".join(rng.choice(FUZZ_ALPHABET)
                        for _ in range(rng.randint(0, 50)))
            assert fast.tokenize_ids(t) == slow.tokenize_ids(t), repr(t)

    def test_exotic_whitespace_falls_back_under_ws_split(self, tmp_path):
        path = make_json(tmp_path, {"type": "WhitespaceSplit"})
        fast, slow = FastUnigramTokenizer(path), UnigramTokenizer(path)
        assert fast.native
        t = "the\xa0quick fox"  # NBSP / LS split by str.split() only
        assert fast.tokenize_ids(t) == slow.tokenize_ids(t)

    def test_unsupported_config_disables_native(self, tmp_path):
        path = make_json(tmp_path, {"type": "Sequence", "pretokenizers": [
            METASPACE, {"type": "Digits"}]})
        fast = FastUnigramTokenizer(path)
        assert not fast.native
        assert fast.tokenize_ids("the quick fox 123") == \
            UnigramTokenizer(path).tokenize_ids("the quick fox 123")


@needs_native
def test_rust_golden_if_available(tmp_path_factory):
    """Direct golden check vs the Rust tokenizers crate (not just
    transitively through the Python implementation)."""
    tokenizers = pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, normalizers, pre_tokenizers, \
        trainers

    d = tmp_path_factory.mktemp("funi_rust")
    corpus = ["the quick brown fox jumps over the lazy dog",
              "vector databases index embeddings",
              "züge fahren schnell durch die nacht",
              "la recherche vectorielle est rapide"] * 10
    tok = Tokenizer(models.Unigram())
    tok.normalizer = normalizers.Sequence([normalizers.NFKC()])
    tok.pre_tokenizer = pre_tokenizers.Metaspace(
        replacement="▁", prepend_scheme="always")
    trainer = trainers.UnigramTrainer(
        vocab_size=150, special_tokens=["<s>", "<pad>", "</s>", "<unk>"],
        unk_token="<unk>")
    tok.train_from_iterator(corpus, trainer)
    path = d / "tokenizer.json"
    tok.save(str(path))
    fast = FastUnigramTokenizer(path)
    assert fast.native
    for t in TEXTS:
        assert fast.tokenize_ids(t) == tok.encode(t).ids, repr(t)
    # added/special tokens embedded in text: HF matches them verbatim
    # BEFORE normalization (review finding) — id-for-id vs Rust
    for t in ["the fox </s> more text", "<s>leading", "a<pad>b",
              "the quick <unk> dog", "</s>"]:
        assert fast.tokenize_ids(t) == tok.encode(t).ids, repr(t)


@needs_native
class TestReviewRegressions:
    def test_seq_len_guard(self, pair):
        fast, _ = pair
        for bad in (0, 1):
            with pytest.raises(ValueError, match="seq_len"):
                fast.encode_batch(["the fox"], bad)

    def test_added_token_in_text_emits_single_id(self, tmp_path):
        """Added/special tokens embedded in text must emit their id, not
        per-character pieces (HF AddedVocabulary semantics — review
        finding); the native path routes such texts to Python."""
        spec_path = make_json(
            tmp_path, {"type": "Sequence", "pretokenizers": [METASPACE]})
        spec = json.loads(spec_path.read_text())
        spec["added_tokens"] = [
            {"content": "<mask>", "id": 999},
            {"content": "</s>", "id": 2},
        ]
        spec_path.write_text(json.dumps(spec), encoding="utf-8")
        fast = FastUnigramTokenizer(spec_path)
        slow = UnigramTokenizer(spec_path)
        for tok in (fast, slow):
            ids = tok.tokenize_ids("the quick <mask> fox")
            assert ids.count(999) == 1, (tok.__class__.__name__, ids)
            assert tok.tokenize_ids("<mask>") == [999]
            two = tok.tokenize_ids("a<mask>b<mask>")
            assert two.count(999) == 2
        assert fast.tokenize_ids("the quick <mask> fox") == \
            slow.tokenize_ids("the quick <mask> fox")
        # decode maps the added id back to its content
        assert "<mask>" in slow.decode([999, slow.vocab.get("▁the", 4)],
                                       skip_special=False)
