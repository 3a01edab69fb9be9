"""HTTP search API server with TPU-friendly micro-batching.

The reference ships a launcher for ``uvicorn.run("query:app")``
(``3-fastapi-uvicorn-server.sh:49-56``) but the FastAPI module itself is
missing from the snapshot; the HTTP contract is reconstructed from the
client and health script (SURVEY.md §2 row 11):

    GET  /health                          (health.sh:3)
    POST /search {"text": str, "top_k": int}
         -> {"similar_documents": [{id,url,title,content,score,...}],
             "generated_response": str}   (4-api-rag-search.py:91-107)

Built on aiohttp (fastapi/uvicorn are not in this image). TPU-specific
design: concurrent requests are coalesced by a background batcher into one
encoder forward + one index scan (``QueryEngine.search_batch``) — queries
wait at most ``batch_timeout_ms`` for co-riders, trading a bounded latency
add for multiplicative QPS (BASELINE.md config #4 measures p50/p99). The
reference path embeds and scans one query at a time.
"""

from __future__ import annotations

import argparse
import asyncio
import json
from typing import List, Optional

from ..core.config import Config
from ..core.logging import get_logger
from ..utils.timers import StageTimer

logger = get_logger(__name__)


class _PendingQuery:
    __slots__ = ("text", "top_k", "future")

    def __init__(self, text: str, top_k: int, future: asyncio.Future):
        self.text = text
        self.top_k = top_k
        self.future = future


class SearchService:
    """Batching front of a QueryEngine; usable without HTTP for tests."""

    def __init__(
        self,
        engine,
        max_batch: int = 64,
        batch_timeout_ms: float = 2.0,
    ):
        self.engine = engine
        self.max_batch = max_batch
        self.batch_timeout = batch_timeout_ms / 1e3
        self.queue: asyncio.Queue = asyncio.Queue()
        self.timer = StageTimer()
        self._task: Optional[asyncio.Task] = None

    async def start(self) -> None:
        if self._task is None:
            self._task = asyncio.create_task(self._batch_loop())

    async def stop(self) -> None:
        if self._task is not None:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass
            self._task = None

    async def search(self, text: str, top_k: int,
                     where: Optional[dict] = None) -> List[dict]:
        if where is not None:
            # filtered queries run unbatched: the coalescer shares ONE scan
            # across co-riders, and filters are per-request
            return await asyncio.to_thread(
                self.engine.search, text, top_k, where
            )
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        await self.queue.put(_PendingQuery(text, top_k, fut))
        return await fut

    async def _collect_batch(self) -> List[_PendingQuery]:
        first = await self.queue.get()
        batch = [first]
        deadline = asyncio.get_running_loop().time() + self.batch_timeout
        while len(batch) < self.max_batch:
            remaining = deadline - asyncio.get_running_loop().time()
            if remaining <= 0:
                break
            try:
                batch.append(
                    await asyncio.wait_for(self.queue.get(), timeout=remaining)
                )
            except asyncio.TimeoutError:
                break
        return batch

    async def _batch_loop(self) -> None:
        while True:
            batch = await self._collect_batch()
            try:
                texts = [p.text for p in batch]
                k = max(p.top_k for p in batch)
                with self.timer.stage(f"batch_search(n={len(batch)})"):
                    # the sync TPU call runs in a worker thread so the event
                    # loop keeps accepting (and coalescing) requests
                    results = await asyncio.to_thread(
                        self.engine.search_batch, texts, k
                    )
                for p, docs in zip(batch, results):
                    if not p.future.done():
                        p.future.set_result(docs[: p.top_k])
            except Exception as e:
                logger.exception("batch search failed")
                for p in batch:
                    if not p.future.done():
                        p.future.set_exception(e)


_SERVICE_KEY = None


def _service_key():
    """aiohttp AppKey (typed app storage; plain string keys are deprecated)."""
    global _SERVICE_KEY
    if _SERVICE_KEY is None:
        from aiohttp import web

        _SERVICE_KEY = web.AppKey("search_service", SearchService)
    return _SERVICE_KEY


def make_app(engine, config: Optional[Config] = None, manager=None):
    """Build the aiohttp application.

    ``manager`` (a RAGManager) enables POST /documents — streaming adds into
    the live index (BASELINE.md config #5) — and index persistence.
    """
    from aiohttp import web

    cfg = config or Config.from_env()
    service = SearchService(
        engine,
        max_batch=cfg.serve_max_batch,
        batch_timeout_ms=cfg.serve_batch_timeout_ms,
    )

    # --- failure detection: periodic end-to-end self-probe (embed + scan).
    # The reference has no failure detection at all (SURVEY.md §5); here
    # /health degrades to 503 when the accelerator path stops responding.
    watchdog = {"status": "healthy", "last_ok": None, "error": None}

    async def _watchdog_loop(interval_s: float = 30.0):
        loop = asyncio.get_running_loop()
        while True:
            try:
                await asyncio.wait_for(
                    asyncio.to_thread(engine.search_batch, ["__healthcheck__"], 1),
                    timeout=max(interval_s, 60.0),
                )
                watchdog.update(status="healthy", last_ok=loop.time(), error=None)
            except Exception as e:
                watchdog.update(status="unhealthy", error=str(e))
                logger.error("watchdog probe failed: %s", e)
            await asyncio.sleep(interval_s)

    watchdog_task: list = []

    async def on_startup(app):
        await service.start()
        if cfg.serve_watchdog_interval_s > 0:
            watchdog_task.append(
                asyncio.create_task(_watchdog_loop(cfg.serve_watchdog_interval_s))
            )

    async def on_cleanup(app):
        for task in watchdog_task:
            task.cancel()
        await service.stop()

    async def health(request):
        healthy = watchdog["status"] == "healthy"
        return web.json_response(
            {
                "status": watchdog["status"],
                "documents": engine.db.get_document_count(),
                "vectors": engine.vector_store.nlive,
                "watchdog_error": watchdog["error"],
            },
            status=200 if healthy else 503,
        )

    async def search(request):
        try:
            body = await request.json()
        except json.JSONDecodeError:
            return web.json_response({"detail": "invalid JSON body"}, status=400)
        text = body.get("text")
        if not isinstance(text, str) or not text.strip():
            return web.json_response(
                {"detail": "'text' must be a non-empty string"}, status=422
            )
        top_k = body.get("top_k", cfg.top_k)
        if not isinstance(top_k, int) or top_k <= 0:
            return web.json_response(
                {"detail": "'top_k' must be a positive integer"}, status=422
            )
        generate = bool(body.get("generate", True))
        where = body.get("filter")
        if where is not None and not isinstance(where, dict):
            return web.json_response(
                {"detail": "'filter' must be an object of metadata "
                           "predicates"}, status=422
            )
        try:
            docs = await service.search(text, top_k, where=where)
        except ValueError as e:  # unknown filter key
            return web.json_response({"detail": str(e)}, status=422)
        response = {"similar_documents": docs}
        if generate:
            response["generated_response"] = await asyncio.to_thread(
                engine.generate_response, text, docs
            )
        return web.json_response(response)

    async def stats(request):
        return web.json_response(service.timer.summary())

    async def add_documents(request):
        if manager is None:
            return web.json_response(
                {"detail": "document ingestion not enabled"}, status=501
            )
        try:
            body = await request.json()
        except json.JSONDecodeError:
            return web.json_response({"detail": "invalid JSON body"}, status=400)
        documents = body.get("documents")
        if not isinstance(documents, list) or not documents:
            return web.json_response(
                {"detail": "'documents' must be a non-empty list"}, status=422
            )
        for doc in documents:
            if not isinstance(doc, dict) or "url" not in doc or "content" not in doc:
                return web.json_response(
                    {"detail": "each document needs 'url' and 'content'"},
                    status=422,
                )
        n = await asyncio.to_thread(manager.add_documents, documents)
        if body.get("persist", False):
            await asyncio.to_thread(manager.vector_store.save_index)
        return web.json_response(
            {"added": n, "vectors": engine.vector_store.ntotal}
        )

    async def delete_documents(request):
        if manager is None:
            return web.json_response(
                {"detail": "document management not enabled"}, status=501
            )
        try:
            body = await request.json()
        except json.JSONDecodeError:
            return web.json_response({"detail": "invalid JSON body"}, status=400)
        ids = body.get("ids", [])
        urls = body.get("urls", [])
        if not isinstance(ids, list) or not isinstance(urls, list):
            return web.json_response(
                {"detail": "'ids' and 'urls' must be lists"}, status=422
            )
        if not ids and not urls:
            return web.json_response(
                {"detail": "provide 'ids' and/or 'urls' to delete"}, status=422
            )
        n = await asyncio.to_thread(
            manager.delete_documents, ids, urls, bool(body.get("persist", False))
        )
        return web.json_response(
            {"deleted": n, "documents": engine.db.get_document_count()}
        )

    app = web.Application()
    app.router.add_get("/health", health)
    app.router.add_post("/search", search)
    app.router.add_get("/stats", stats)
    app.router.add_post("/documents", add_documents)
    app.router.add_delete("/documents", delete_documents)
    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)
    app[_service_key()] = service
    return app


def main(argv: Optional[List[str]] = None) -> None:
    from aiohttp import web

    parser = argparse.ArgumentParser(description="RAG search API server")
    parser.add_argument("--base-dir", default=".")
    parser.add_argument("--host", default=None)
    parser.add_argument("--port", type=int, default=None)
    args = parser.parse_args(argv)

    cfg = Config.from_env(base_dir=args.base_dir)
    from ..models.generator import AnswerGenerator
    from ..rag.engine import QueryEngine
    from ..rag.manager import RAGManager

    manager = RAGManager(config=cfg)
    manager.load_indices()
    engine = QueryEngine(
        manager.db,
        manager.vector_store,
        manager.embedder,
        generator=AnswerGenerator(model_name=cfg.generator_model),
        context_token_budget=cfg.context_token_budget,
    )
    app = make_app(engine, cfg, manager=manager)
    host = args.host or cfg.api_host
    port = args.port or cfg.api_port
    logger.info("starting API server on %s:%d", host, port)
    web.run_app(app, host=host, port=port)


if __name__ == "__main__":
    main()
