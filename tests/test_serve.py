"""HTTP API contract tests (reconstructed contract, SURVEY.md §2 row 11)."""

import asyncio
import json

import numpy as np
import pytest

from rag_faiss_embedding_tpu.index import VectorStore
from rag_faiss_embedding_tpu.models import EmbeddingPipeline, MiniLMConfig
from rag_faiss_embedding_tpu.models.generator import AnswerGenerator
from rag_faiss_embedding_tpu.rag import QueryEngine
from rag_faiss_embedding_tpu.serve.api import make_app
from rag_faiss_embedding_tpu.store import Database

from .test_rag import DOCS, SMALL


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("serve")
    embedder = EmbeddingPipeline(model_name="offline-test", cfg=SMALL,
                                 max_seq_length=64)
    embedder.fit_tokenizer([d["content"] for d in DOCS], vocab_size=300)
    db = Database(tmp_path / "docs.db")
    ids = db.insert_documents(DOCS)
    store = VectorStore(dimension=32, index_path=tmp_path / "idx")
    store.index._use_pallas = False
    store.add_vectors(embedder.generate_embeddings([d["content"] for d in DOCS]), ids)
    return QueryEngine(db, store, embedder,
                       generator=AnswerGenerator(backend="extractive"))


def _client_call(engine, requests):
    """Spin the app, run the given (method, path, body) requests, return responses."""
    from aiohttp.test_utils import TestClient, TestServer

    async def run():
        app = make_app(engine)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            out = []
            for method, path, body in requests:
                resp = await client.request(method, path, json=body)
                out.append((resp.status, await resp.json()))
            return out
        finally:
            await client.close()

    return asyncio.run(run())


def test_health(engine):
    [(status, body)] = _client_call(engine, [("GET", "/health", None)])
    assert status == 200
    assert body["status"] == "healthy"
    assert body["documents"] == 3 and body["vectors"] == 3


def test_search_contract(engine):
    [(status, body)] = _client_call(
        engine, [("POST", "/search", {"text": DOCS[0]["content"], "top_k": 2})]
    )
    assert status == 200
    docs = body["similar_documents"]
    assert len(docs) == 2
    assert docs[0]["id"] == 9
    assert {"id", "url", "title", "content", "score", "distance"} <= set(docs[0])
    assert isinstance(body["generated_response"], str)
    assert body["generated_response"]


def test_search_without_generation(engine):
    [(status, body)] = _client_call(
        engine,
        [("POST", "/search", {"text": "jax", "top_k": 1, "generate": False})],
    )
    assert status == 200
    assert "generated_response" not in body


def test_search_validation_errors(engine):
    results = _client_call(engine, [
        ("POST", "/search", {"top_k": 3}),
        ("POST", "/search", {"text": "", "top_k": 3}),
        ("POST", "/search", {"text": "x", "top_k": 0}),
        ("POST", "/search", {"text": "x", "top_k": "three"}),
    ])
    assert [s for s, _ in results] == [422, 422, 422, 422]


def test_concurrent_requests_are_batched(engine):
    from aiohttp.test_utils import TestClient, TestServer

    async def run():
        app = make_app(engine)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            async def one(i):
                resp = await client.post(
                    "/search",
                    json={"text": DOCS[i % 3]["content"], "top_k": 1,
                          "generate": False},
                )
                return (await resp.json())["similar_documents"][0]["id"]

            ids = await asyncio.gather(*[one(i) for i in range(12)])
            stats_resp = await client.get("/stats")
            stats = await stats_resp.json()
            return ids, stats
        finally:
            await client.close()

    ids, stats = asyncio.run(run())
    assert ids == [9, 4, 1] * 4
    # at least one multi-query batch must have been coalesced
    assert any("n=" in k and k != "batch_search(n=1)" for k in stats), stats


def test_watchdog_reports_health(engine):
    """The self-probe flips /health to 503 when the search path dies."""
    from aiohttp.test_utils import TestClient, TestServer
    from rag_faiss_embedding_tpu.core import Config

    cfg = Config(base_dir="/tmp", serve_watchdog_interval_s=0.05)

    async def run():
        app = make_app(engine, cfg)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            await asyncio.sleep(0.3)
            r1 = await client.get("/health")
            ok = r1.status, (await r1.json())["status"]
            # break the engine: searches now raise
            original = engine.search_batch
            engine.search_batch = lambda *a, **k: (_ for _ in ()).throw(
                RuntimeError("device lost")
            )
            await asyncio.sleep(0.3)
            r2 = await client.get("/health")
            broken = r2.status, (await r2.json())["status"]
            engine.search_batch = original
            return ok, broken
        finally:
            await client.close()

    ok, broken = asyncio.run(run())
    assert ok == (200, "healthy")
    assert broken == (503, "unhealthy")


def test_add_documents_endpoint(tmp_path_factory):
    """Streaming adds over HTTP: new docs are searchable immediately."""
    from aiohttp.test_utils import TestClient, TestServer

    from rag_faiss_embedding_tpu.core import Config
    from rag_faiss_embedding_tpu.rag import RAGManager

    tmp = tmp_path_factory.mktemp("serve_add")
    embedder = EmbeddingPipeline(model_name="offline-test", cfg=SMALL,
                                 max_seq_length=64)
    embedder.fit_tokenizer([d["content"] for d in DOCS], vocab_size=300)
    cfg = Config(base_dir=tmp, vector_dimension=32, serve_watchdog_interval_s=0)
    manager = RAGManager(config=cfg, embedder=embedder)
    manager.initialize_database(DOCS)
    eng = QueryEngine(manager.db, manager.vector_store, manager.embedder,
                      generator=AnswerGenerator(backend="extractive"))

    async def run():
        app = make_app(eng, cfg, manager=manager)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            new_doc = {"id": 77, "url": "https://ex/new", "title": "new.html",
                       "content": "pallas kernels tile vector memory"}
            r = await client.post("/documents", json={"documents": [new_doc]})
            added = await r.json()
            r2 = await client.post("/search", json={
                "text": new_doc["content"], "top_k": 1, "generate": False})
            hit = (await r2.json())["similar_documents"][0]["id"]
            r3 = await client.post("/documents", json={"documents": []})
            r4 = await client.post("/documents", json={"documents": [{"x": 1}]})
            return r.status, added, hit, r3.status, r4.status
        finally:
            await client.close()

    status, added, hit, bad1, bad2 = asyncio.run(run())
    assert status == 200 and added["added"] == 1 and added["vectors"] == 4
    assert hit == 77
    assert bad1 == 422 and bad2 == 422


def test_add_documents_disabled_without_manager(engine):
    [(status, body)] = _client_call(
        engine, [("POST", "/documents", {"documents": [{"url": "u", "content": "c"}]})]
    )
    assert status == 501


def test_delete_documents_endpoint(tmp_path_factory):
    """DELETE /documents removes from both stores; bad bodies are 422."""
    from aiohttp.test_utils import TestClient, TestServer

    from rag_faiss_embedding_tpu.core import Config
    from rag_faiss_embedding_tpu.rag import RAGManager

    tmp = tmp_path_factory.mktemp("serve_del")
    embedder = EmbeddingPipeline(model_name="offline-test", cfg=SMALL,
                                 max_seq_length=64)
    embedder.fit_tokenizer([d["content"] for d in DOCS], vocab_size=300)
    cfg = Config(base_dir=tmp, vector_dimension=32, serve_watchdog_interval_s=0)
    manager = RAGManager(config=cfg, embedder=embedder)
    manager.initialize_database(DOCS)
    eng = QueryEngine(manager.db, manager.vector_store, manager.embedder,
                      generator=AnswerGenerator(backend="extractive"))

    async def run():
        app = make_app(eng, cfg, manager=manager)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r = await client.delete("/documents", json={
                "ids": [9], "urls": ["https://ex/db"]})
            deleted = await r.json()
            r2 = await client.post("/search", json={
                "text": DOCS[0]["content"], "top_k": 3, "generate": False})
            hits = [d["id"] for d in (await r2.json())["similar_documents"]]
            r3 = await client.delete("/documents", json={})
            r4 = await client.delete("/documents", json={"ids": "nope"})
            return r.status, deleted, hits, r3.status, r4.status
        finally:
            await client.close()

    status, deleted, hits, bad1, bad2 = asyncio.run(run())
    assert status == 200 and deleted["deleted"] == 2
    assert deleted["documents"] == 1
    assert hits == [4]  # only tpu.html remains searchable
    assert bad1 == 422 and bad2 == 422


def test_delete_documents_disabled_without_manager(engine):
    [(status, _)] = _client_call(
        engine, [("DELETE", "/documents", {"ids": [1]})]
    )
    assert status == 501
