import json

import numpy as np
import pytest

from rag_faiss_embedding_tpu.core import Config
from rag_faiss_embedding_tpu.index import VectorStore
from rag_faiss_embedding_tpu.models import EmbeddingPipeline, MiniLMConfig
from rag_faiss_embedding_tpu.models.generator import AnswerGenerator
from rag_faiss_embedding_tpu.rag import QueryEngine, RAGManager
from rag_faiss_embedding_tpu.store import Database

SMALL = MiniLMConfig(
    vocab_size=300, hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, max_position_embeddings=64,
)

DOCS = [
    {"id": 9, "url": "https://ex/jax", "title": "jax.html",
     "content": "jax compiles numerical array programs for accelerators"},
    {"id": 4, "url": "https://ex/tpu", "title": "tpu.html",
     "content": "tpus multiply matrices with a systolic array unit"},
    {"id": 1, "url": "https://ex/db", "title": "db.html",
     "content": "sqlite stores documents in a single database file"},
]


@pytest.fixture(scope="module")
def embedder():
    pipe = EmbeddingPipeline(model_name="offline-test", cfg=SMALL, max_seq_length=64)
    pipe.fit_tokenizer([d["content"] for d in DOCS], vocab_size=300)
    return pipe


@pytest.fixture
def engine(tmp_path, embedder):
    db = Database(tmp_path / "docs.db")
    ids = db.insert_documents(DOCS)
    store = VectorStore(dimension=32, index_path=tmp_path / "idx")
    store.index._use_pallas = False
    emb = embedder.generate_embeddings([d["content"] for d in DOCS])
    store.add_vectors(emb, ids)
    gen = AnswerGenerator(backend="extractive")
    return QueryEngine(db, store, embedder, generator=gen)


def test_search_returns_scored_docs(engine):
    results = engine.search(DOCS[0]["content"], top_k=2)
    assert len(results) == 2
    assert results[0]["id"] == 9  # self-retrieval
    assert results[0]["score"] > results[1]["score"]
    assert 0 < results[0]["score"] <= 1.0
    assert "distance" in results[0]


def test_search_batch_matches_single(engine):
    queries = [DOCS[0]["content"], DOCS[2]["content"]]
    batched = engine.search_batch(queries, top_k=2)
    assert [r[0]["id"] for r in batched] == [9, 1]
    single = engine.search(queries[0], top_k=2)
    assert [d["id"] for d in batched[0]] == [d["id"] for d in single]


def test_generate_response_extractive(engine):
    docs = engine.search("how do tpus multiply matrices", top_k=3)
    answer = engine.generate_response("how do tpus multiply matrices", docs)
    assert isinstance(answer, str) and len(answer) > 0
    assert "matrices" in answer or "systolic" in answer


def test_generate_response_empty_docs(engine):
    out = engine.generate_response("anything", [])
    assert out == "No relevant documents found to answer your query."


def test_truncate_content_respects_budget(engine):
    long_text = "word " * 500
    out = engine.truncate_content(long_text, 10)
    assert len(out.split()) <= 12


# ------------------------------------------------------------------ manager

@pytest.fixture
def manager(tmp_path, embedder):
    cfg = Config(base_dir=tmp_path, vector_dimension=32)
    (tmp_path / "data").mkdir(exist_ok=True)
    (tmp_path / "data" / "documents.json").write_text(json.dumps(DOCS))
    m = RAGManager(config=cfg, embedder=embedder)
    m.vector_store.index._use_pallas = False
    return m


def test_initialize_and_search(manager):
    n = manager.initialize_database()
    assert n == 3
    results = manager.search_similar_documents(DOCS[1]["content"], k=2)
    assert results[0]["id"] == 4
    assert results[0]["distance"] < results[1]["distance"]


def test_load_indices_from_disk(manager, tmp_path, embedder):
    manager.initialize_database()
    cfg = manager.config
    m2 = RAGManager(config=cfg, embedder=embedder)
    m2.vector_store.index._use_pallas = False
    m2.load_indices()
    assert m2.vector_store.ntotal == 3
    results = m2.search_similar_documents(DOCS[0]["content"], k=1)
    assert results[0]["id"] == 9


def test_streaming_add(manager):
    manager.initialize_database()
    new_doc = {"id": 50, "url": "https://ex/new", "title": "new.html",
               "content": "flax builds neural network layers on jax"}
    manager.add_documents([new_doc])
    assert manager.vector_store.ntotal == 4
    results = manager.search_similar_documents(new_doc["content"], k=1)
    assert results[0]["id"] == 50


def test_reset_removes_artifacts(manager):
    manager.initialize_database()
    manager.reset()
    assert manager.vector_store.ntotal == 0
    assert manager.db.get_document_count() == 0


def test_generator_prompt_template():
    gen = AnswerGenerator(backend="extractive")
    prompt = gen.build_prompt("why?", "Document 1: because")
    assert prompt.startswith("Based on the following documents")
    assert prompt.endswith("Answer:")


@pytest.mark.slow
def test_manager_ivf_index_kind(tmp_path, embedder):
    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex

    cfg = Config(base_dir=tmp_path, vector_dimension=32,
                 index_kind="ivf", ivf_nlist=2, ivf_nprobe=2)
    (tmp_path / "data").mkdir(exist_ok=True)
    (tmp_path / "data" / "documents.json").write_text(json.dumps(DOCS))
    m = RAGManager(config=cfg, embedder=embedder)
    assert isinstance(m.vector_store.index, IVFFlatIndex)
    assert m.initialize_database() == 3
    results = m.search_similar_documents(DOCS[0]["content"], k=2)
    assert results[0]["id"] == 9
    # persisted as kind=ivf and reloads as IVF
    m2 = RAGManager(config=cfg, embedder=embedder)
    m2.load_indices()
    assert isinstance(m2.vector_store.index, IVFFlatIndex)
    assert m2.search_similar_documents(DOCS[1]["content"], k=1)[0]["id"] == 4


def test_delete_documents_by_id_and_url(manager):
    manager.initialize_database()
    assert manager.delete_documents(doc_ids=[4]) == 1
    # deleted doc never answers again, even for its own content
    results = manager.search_similar_documents(DOCS[1]["content"], k=3)
    assert all(r["id"] != 4 for r in results)
    assert manager.db.get_document_by_id(4) is None
    # by url, with persistence -> survives reload
    assert manager.delete_documents(urls=["https://ex/jax"], persist=True) == 1
    m2 = RAGManager(config=manager.config, embedder=manager.embedder)
    m2.vector_store.index._use_pallas = False
    m2.load_indices()
    results = m2.search_similar_documents(DOCS[0]["content"], k=3)
    assert [r["id"] for r in results] == [1]  # only db.html remains
    # unknown ids/urls are no-ops
    assert manager.delete_documents(doc_ids=[999], urls=["https://nope"]) == 0


def test_readd_url_replaces_vector(manager):
    """Re-adding an existing url must tombstone the superseded embedding:
    the old vector (with the OLD content) may not answer for its doc id."""
    manager.initialize_database()
    changed = {"url": "https://ex/tpu", "title": "tpu.html",
               "content": "sqlite stores documents in a single database file"}
    manager.add_documents([changed])
    assert manager.vector_store.index.nlive == 3
    # the replaced doc is now retrieved by its NEW content...
    results = manager.search_similar_documents(changed["content"], k=2)
    new_id = manager.db.get_document_id_by_url("https://ex/tpu")
    assert new_id in [r["id"] for r in results]
    # ...and its OLD embedding no longer answers the old content
    results = manager.search_similar_documents(DOCS[1]["content"], k=3)
    hit_ids = [r["id"] for r in results]
    assert 4 not in hit_ids or new_id == 4
