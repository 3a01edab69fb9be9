import json

import numpy as np
import pytest

from rag_faiss_embedding_tpu.cli.train import batch_iterator, make_pairs, train
from rag_faiss_embedding_tpu.models import EmbeddingPipeline
from rag_faiss_embedding_tpu.models.convert import (
    export_params,
    import_params,
    infer_config_from_params,
)
from rag_faiss_embedding_tpu.models.minilm import MiniLMConfig

from .test_rag import DOCS

TINY = MiniLMConfig(
    vocab_size=512, hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, max_position_embeddings=64, dropout_rate=0.0,
)


def test_make_pairs(rng):
    pairs = make_pairs(DOCS, rng)
    assert len(pairs) >= len(DOCS)
    assert all(q and d for q, d in pairs)


def test_params_export_import_roundtrip(tmp_path):
    from rag_faiss_embedding_tpu.models.convert import deterministic_params

    params = deterministic_params(TINY)
    export_params(params, tmp_path / "p.npz")
    loaded = import_params(tmp_path / "p.npz")
    np.testing.assert_array_equal(
        np.asarray(params["layer_0"]["intermediate"]["kernel"]),
        np.asarray(loaded["layer_0"]["intermediate"]["kernel"]),
    )
    cfg = infer_config_from_params(loaded)
    assert cfg.hidden_size == 32 and cfg.num_layers == 2 and cfg.num_heads == 4


@pytest.mark.slow
def test_train_loop_and_reload(tmp_path, rng):
    docs = DOCS * 4
    params, tokenizer = train(
        docs, cfg=TINY, steps=6, batch_size=8, max_len=32,
        learning_rate=1e-3, vocab_size=512,
        params_out=tmp_path / "encoder_params.npz",
    )
    assert (tmp_path / "encoder_params.npz").exists()
    # trained params load into the pipeline and produce self-retrievable embs
    pipe = EmbeddingPipeline(
        model_name="trained", tokenizer=tokenizer,
        params_path=tmp_path / "encoder_params.npz", max_seq_length=32,
    )
    assert pipe.cfg.hidden_size == 32
    emb = pipe.generate_embeddings([d["content"] for d in DOCS])
    assert emb.shape == (3, 32)
    sims = emb @ emb.T
    assert np.argmax(sims[0]) == 0
