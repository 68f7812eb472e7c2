"""Parity + fallback tests for the native WordPiece tokenizer
(native/wordpiece.cpp via pipeline/fast_wordpiece.py): the C++ ASCII fast
path must match the Python implementation token-id-for-token-id; any
non-ASCII input must transparently fall back to Python."""

import random
import string

import numpy as np
import pytest

from tpu_vector_db.pipeline.fast_wordpiece import (FastWordPieceTokenizer,
                                                   native_available)
from tpu_vector_db.pipeline.wordpiece import WordPieceTokenizer

VOCAB_WORDS = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "quick", "brown", "fox", "jump", "##s", "##ed", "##ing",
    "over", "lazy", "dog", "cat", "run", "##ner", "un", "##believ",
    "##able", "hello", "world", "!", "?", ",", ".", "'", "don", "t",
    "2", "##0", "##2", "##4", "a", "##a", "b", "##b", "c", "##c",
    "temperature", "vector", "data", "##base", "search", "engine",
    "天", "気",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("fwp") / "vocab.txt"
    p.write_text("\n".join(VOCAB_WORDS) + "\n", encoding="utf-8")
    return p


@pytest.fixture(scope="module")
def pair(vocab_file):
    fast = FastWordPieceTokenizer(vocab_file)
    slow = WordPieceTokenizer(vocab_file)
    return fast, slow


needs_native = pytest.mark.skipif(not native_available(),
                                  reason="no C++ compiler")


@needs_native
class TestNativeParity:
    def test_native_engaged(self, pair):
        fast, _ = pair
        assert fast.native

    def test_encode_parity(self, pair):
        fast, slow = pair
        texts = [
            "The quick brown fox jumps over the lazy dog!",
            "Hello, world. Don't.",
            "unbelievable runner running 2024",
            "UNKNOWNWORDXYZ temperature",
            "  whitespace\t\tand\nnewlines  ",
            "", "punct!!!???...", "a.b.c a'b",
            "x" * 150,  # > max_input_chars_per_word -> [UNK]
        ]
        for t in texts:
            assert fast.encode(t, max_length=32) == \
                slow.encode(t, max_length=32), t

    def test_encode_fuzz_parity(self, pair):
        fast, slow = pair
        rng = random.Random(11)
        alphabet = string.ascii_letters + string.digits + \
            string.punctuation + " \t\n"
        for _ in range(300):
            t = "".join(rng.choice(alphabet)
                        for _ in range(rng.randint(0, 80)))
            assert fast.encode(t) == slow.encode(t), repr(t)

    def test_batch_parity(self, pair):
        fast, slow = pair
        texts = ["the quick fox", "hello world !", "", "don't 2024",
                 "x" * 200]
        fi, fm = fast.encode_batch(texts, seq_len=16)
        si, sm = slow.encode_batch(texts, seq_len=16)
        np.testing.assert_array_equal(fi, si)
        np.testing.assert_array_equal(fm, sm)

    def test_nul_batch_falls_back(self, pair):
        # '\0' passes isascii() but corrupts the NUL-delimited blob
        # protocol — must route to Python, not silently shift rows
        fast, slow = pair
        texts = ["the\0quick fox", "hello world"]
        fi, fm = fast.encode_batch(texts, seq_len=12)
        si, sm = slow.encode_batch(texts, seq_len=12)
        np.testing.assert_array_equal(fi, si)
        np.testing.assert_array_equal(fm, sm)

    def test_non_ascii_falls_back(self, pair):
        fast, slow = pair
        for t in ["天気 cjk handling", "café résumé", "日本語 mixed ascii"]:
            assert fast.encode(t) == slow.encode(t), t
        # batch with one non-ascii row falls back wholesale
        fi, fm = fast.encode_batch(["the fox", "天気"], seq_len=8)
        si, sm = slow.encode_batch(["the fox", "天気"], seq_len=8)
        np.testing.assert_array_equal(fi, si)

    def test_truncation_keeps_sep(self, pair):
        fast, _ = pair
        long = " ".join(["quick brown fox"] * 50)
        row = fast.encode(long, max_length=16)
        assert len(row) == 16
        assert row[0] == fast.cls_id and row[-1] == fast.sep_id
        ids, mask = fast.encode_batch([long], seq_len=16)
        live = int(mask[0].sum())
        assert ids[0, live - 1] == fast.sep_id

    def test_mpnet_specials(self, tmp_path):
        words = ["<s>", "<pad>", "</s>", "[UNK]", "<mask>", "the", "fox"]
        p = tmp_path / "vocab.txt"
        p.write_text("\n".join(words) + "\n")
        fast = FastWordPieceTokenizer(p, pad_token="<pad>", cls_token="<s>",
                                      sep_token="</s>", unk_token="[UNK]")
        slow = WordPieceTokenizer(p, pad_token="<pad>", cls_token="<s>",
                                  sep_token="</s>", unk_token="[UNK]")
        assert fast.native
        assert fast.encode("the fox zzz") == slow.encode("the fox zzz")

    def test_throughput_vs_python(self, pair):
        """The point of the native path: meaningfully faster than Python
        on realistic batches (gate conservatively at 3x; measured ~30x)."""
        import time
        fast, slow = pair
        rng = random.Random(0)
        words = ["the", "quick", "brown", "fox", "jumps", "over",
                 "lazy", "dog", "temperature", "vector", "database"]
        texts = [" ".join(rng.choice(words) for _ in range(48))
                 for _ in range(256)]
        t0 = time.perf_counter()
        fast.encode_batch(texts, seq_len=64)
        t_fast = time.perf_counter() - t0
        t0 = time.perf_counter()
        slow.encode_batch(texts, seq_len=64)
        t_slow = time.perf_counter() - t0
        assert t_fast * 3 < t_slow, (t_fast, t_slow)
