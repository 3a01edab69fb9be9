import numpy as np
import pytest

from rag_faiss_embedding_tpu.models.tokenizer import (
    SPECIALS,
    WordPieceTokenizer,
    basic_tokenize,
)

VOCAB = SPECIALS + [
    "the", "quick", "brown", "fox", "jump", "##ed", "##s", "over",
    "lazy", "dog", ".", ",", "un", "##affable",
    "a", "b", "c", "##a", "##b", "##c",
]


@pytest.fixture
def tok():
    return WordPieceTokenizer({t: i for i, t in enumerate(VOCAB)})


def test_basic_tokenize_splits_punct_and_lowercases():
    assert basic_tokenize("The quick, brown fox.") == [
        "the", "quick", ",", "brown", "fox", "."
    ]


def test_basic_tokenize_strips_accents_and_controls():
    assert basic_tokenize("café \x00test") == ["cafe", "test"]


def test_wordpiece_greedy_longest_match(tok):
    ids = tok.wordpiece("jumped")
    assert [tok.inv_vocab[i] for i in ids] == ["jump", "##ed"]
    ids = tok.wordpiece("unaffable")
    assert [tok.inv_vocab[i] for i in ids] == ["un", "##affable"]


def test_wordpiece_unknown(tok):
    assert tok.wordpiece("zzz") == [tok.unk_id]


def test_encode_adds_specials_and_truncates(tok):
    ids = tok.encode("the quick brown fox jumped over the lazy dog")
    assert ids[0] == tok.cls_id and ids[-1] == tok.sep_id
    short = tok.encode("the quick brown fox jumped", max_length=4)
    assert len(short) == 4 and short[-1] == tok.sep_id


def test_encode_batch_bucketed_padding(tok):
    ids, mask = tok.encode_batch(["the fox", "the quick brown fox jumped over"])
    assert ids.shape[1] == 16  # smallest bucket
    assert mask.sum(axis=1).tolist() == [4, 9]
    assert (ids[mask == 0] == tok.pad_id).all()


def test_decode_roundtrip(tok):
    ids = tok.encode("the quick fox jumped")
    assert tok.decode(ids) == "the quick fox jumped"


def test_train_builtin_covers_corpus():
    corpus = ["the cat sat on the mat", "the dog sat on the log"] * 5
    t = WordPieceTokenizer._train_builtin(corpus, 200, 1)
    ids = t.encode("the cat sat")
    assert t.unk_id not in ids
    assert t.decode(ids) == "the cat sat"


def test_train_hf_backend():
    corpus = ["hello world foo bar baz"] * 10
    t = WordPieceTokenizer.train(corpus, vocab_size=100)
    ids = t.encode("hello world")
    assert ids[0] == t.cls_id
    assert t.unk_id not in ids


def test_save_load_roundtrip(tok, tmp_path):
    p = tmp_path / "vocab.txt"
    tok.save(p)
    t2 = WordPieceTokenizer.from_vocab_file(p)
    assert t2.vocab == tok.vocab
    assert t2.encode("the fox") == tok.encode("the fox")
