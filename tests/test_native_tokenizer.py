"""C++ tokenizer vs the Python reference implementation (exact parity)."""

import numpy as np
import pytest

from rag_faiss_embedding_tpu.models.tokenizer import SPECIALS, WordPieceTokenizer

VOCAB = SPECIALS + [
    "the", "quick", "brown", "fox", "jump", "##ed", "##s", "over",
    "lazy", "dog", ".", ",", "!", "un", "##affable", "a", "b",
    "##a", "##b", "hello", "world",
]


@pytest.fixture(scope="module")
def pair():
    py = WordPieceTokenizer({t: i for i, t in enumerate(VOCAB)})
    nat = WordPieceTokenizer({t: i for i, t in enumerate(VOCAB)})
    if not nat.enable_native():
        pytest.skip("native toolchain unavailable")
    return py, nat


TEXTS = [
    "the quick brown fox jumped over the lazy dog.",
    "Hello, World!",
    "unaffable",
    "jumps jumped",
    "  the   fox  ",
    "zzz unknown word",
    "",
    "a" * 200,  # longer than max_word_chars -> [UNK]
    "the. quick,fox!",
]


@pytest.mark.parametrize("text", TEXTS)
def test_native_matches_python(pair, text):
    py, nat = pair
    assert nat.encode(text) == py.encode(text), text


def test_native_truncation(pair):
    py, nat = pair
    for ml in (4, 5, 8):
        assert nat.encode(TEXTS[0], max_length=ml) == py.encode(TEXTS[0], max_length=ml)


def test_native_falls_back_on_unicode(pair):
    py, nat = pair
    # café has a non-ASCII byte: native returns the python-path result
    assert nat.encode("café fox") == py.encode("café fox")


def test_native_batch_parity(pair):
    py, nat = pair
    ids_n, mask_n = nat.encode_batch(TEXTS[:6], max_length=32)
    ids_p, mask_p = py.encode_batch(TEXTS[:6], max_length=32)
    np.testing.assert_array_equal(ids_n, ids_p)
    np.testing.assert_array_equal(mask_n, mask_p)


def test_native_speedup(pair):
    """The point of the native path: meaningfully faster on ASCII text."""
    import time

    py, nat = pair
    text = "the quick brown fox jumped over the lazy dog " * 20

    def bench(tok, n=300):
        t0 = time.perf_counter()
        for _ in range(n):
            tok.encode(text)
        return time.perf_counter() - t0

    t_py = bench(py)
    t_nat = bench(nat)
    assert t_nat < t_py, f"native {t_nat:.4f}s not faster than python {t_py:.4f}s"
