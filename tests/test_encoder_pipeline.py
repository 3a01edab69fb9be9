import numpy as np
import pytest

from rag_faiss_embedding_tpu.models import EmbeddingPipeline, MiniLMConfig
from rag_faiss_embedding_tpu.models.tokenizer import WordPieceTokenizer

SMALL = MiniLMConfig(
    vocab_size=200, hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, max_position_embeddings=64,
)

CORPUS = [
    "jax compiles numerical programs for tpus",
    "faiss performs similarity search over dense vectors",
    "sqlite is a small embedded relational database",
    "transformers encode sentences into embeddings",
] * 3


@pytest.fixture(scope="module")
def pipe():
    p = EmbeddingPipeline(model_name="offline-test", cfg=SMALL, max_seq_length=64)
    p.fit_tokenizer(CORPUS, vocab_size=200)
    return p


def test_generate_embeddings_shape(pipe):
    emb = pipe.generate_embeddings(CORPUS[:4], batch_size=2)
    assert emb.shape == (4, 32)
    assert emb.dtype == np.float32


def test_embeddings_deterministic_across_batdching(pipe):
    e1 = pipe.generate_embeddings(CORPUS[:4], batch_size=2)
    e2 = pipe.generate_embeddings(CORPUS[:4], batch_size=4)
    np.testing.assert_allclose(e1, e2, atol=2e-5)


def test_embed_query_matches_batch(pipe):
    q = pipe.embed_query(CORPUS[0])
    batch = pipe.generate_embeddings([CORPUS[0]])
    np.testing.assert_allclose(q, batch[0], atol=2e-5)


def test_empty_input(pipe):
    emb = pipe.generate_embeddings([])
    assert emb.shape == (0, 32)


def test_normalized_embeddings():
    p = EmbeddingPipeline(
        model_name="offline-test", cfg=SMALL, normalize=True, max_seq_length=64
    )
    p.fit_tokenizer(CORPUS, vocab_size=200)
    emb = p.generate_embeddings(CORPUS[:3])
    np.testing.assert_allclose(np.linalg.norm(emb, axis=1), 1.0, atol=1e-5)


def test_tokenizer_trained_on_demand():
    p = EmbeddingPipeline(model_name="offline-test", cfg=SMALL, max_seq_length=64)
    assert p.tokenizer is None
    emb = p.generate_embeddings(CORPUS[:2])
    assert p.tokenizer is not None
    assert emb.shape == (2, 32)


def test_vocab_persistence(tmp_path):
    vp = tmp_path / "vocab.txt"
    p = EmbeddingPipeline(
        model_name="offline-test", cfg=SMALL, vocab_path=vp, max_seq_length=64
    )
    p.fit_tokenizer(CORPUS)
    assert vp.exists()
    p2 = EmbeddingPipeline(
        model_name="offline-test", cfg=SMALL, vocab_path=vp, max_seq_length=64
    )
    assert p2.tokenizer is not None
    np.testing.assert_allclose(
        p.generate_embeddings([CORPUS[0]]),
        p2.generate_embeddings([CORPUS[0]]),
        atol=2e-5,
    )
