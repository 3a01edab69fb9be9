"""HTTP serving load test: concurrent clients against the API server.

Measures the serving-path numbers BASELINE.md config #2/#4 care about
(QPS, p50/p99 latency) including the micro-batcher's coalescing behavior —
the piece bench.py's raw-kernel numbers don't cover. Spins an in-process
server around a QueryEngine (or targets a running server via --url).

    python -m benchmarks.load_test --small          # in-process smoke
    python -m benchmarks.load_test --url http://host:8000/search
"""

from __future__ import annotations

import argparse
import asyncio
import json
import time
from typing import List, Optional


async def _drive(post, queries: List[str], concurrency: int, total: int,
                 warmup: int = 0, filter_every: int = 0):
    """filter_every=N routes every Nth request with a metadata filter
    (0 = never) — filtered queries bypass the coalescer (per-request
    masks), so the mix exercises both serving paths."""
    if warmup:
        # Steady-state protocol: the batcher coalesces 1..max_batch queries
        # and each embed/scan bucket JIT-compiles on first sight (10-60 s
        # through the axon tunnel) — drive full-concurrency bursts until
        # every bucket shape has compiled before timing anything.
        sem_w = asyncio.Semaphore(concurrency)

        async def warm_one(i: int):
            async with sem_w:
                await post(queries[i % len(queries)])

        await asyncio.gather(*[warm_one(i) for i in range(warmup)])

    latencies: List[float] = []
    sem = asyncio.Semaphore(concurrency)
    t_start = time.perf_counter()

    async def one(i: int):
        async with sem:
            filtered = filter_every and i % filter_every == 0
            t0 = time.perf_counter()
            await post(queries[i % len(queries)], filtered=filtered)
            latencies.append(time.perf_counter() - t0)

    await asyncio.gather(*[one(i) for i in range(total)])
    wall = time.perf_counter() - t_start
    latencies.sort()
    n = len(latencies)
    return {
        "requests": n,
        "qps": round(n / wall, 2),
        "p50_ms": round(latencies[n // 2] * 1e3, 2),
        "p90_ms": round(latencies[int(n * 0.90)] * 1e3, 2),
        "p99_ms": round(latencies[min(n - 1, int(n * 0.99))] * 1e3, 2),
        "concurrency": concurrency,
    }


async def run_inprocess(small: bool, concurrency: int, total: int,
                        warmup: int = 0, generate: bool = False,
                        filter_every: int = 0) -> dict:
    from aiohttp.test_utils import TestClient, TestServer

    from rag_faiss_embedding_tpu.core import Config
    from rag_faiss_embedding_tpu.index import VectorStore
    from rag_faiss_embedding_tpu.models import EmbeddingPipeline, MiniLMConfig
    from rag_faiss_embedding_tpu.models.generator import AnswerGenerator
    from rag_faiss_embedding_tpu.rag import QueryEngine
    from rag_faiss_embedding_tpu.serve.api import make_app
    from rag_faiss_embedding_tpu.store import Database

    import os
    import tempfile

    if small:
        mcfg = MiniLMConfig(vocab_size=2048, hidden_size=64, num_layers=2,
                            num_heads=4, intermediate_size=128,
                            max_position_embeddings=64)
        embedder = EmbeddingPipeline(model_name="loadtest", cfg=mcfg,
                                     max_seq_length=64)
    else:
        embedder = EmbeddingPipeline()

    corpus = [
        f"document {i} about topic {i % 29} with content words "
        f"{' '.join(f'w{j}' for j in range(i % 11))}"
        for i in range(200)
    ]
    embedder.fit_tokenizer(corpus)
    # NB: ":memory:" sqlite is per-connection; the store opens a connection
    # per thread, so an in-memory db would be empty inside the batcher thread
    db_file = tempfile.NamedTemporaryFile(suffix=".db", delete=False)
    db_file.close()
    db = Database(db_file.name)
    ids = db.insert_documents(
        [{"url": f"https://x/{i}", "title": f"{i}", "content": c}
         for i, c in enumerate(corpus, start=1)]
    )
    store = VectorStore(dimension=embedder.cfg.hidden_size,
                        index_path="/nonexistent/loadtest.idx")
    store.add_vectors(embedder.generate_embeddings(corpus), ids)
    engine = QueryEngine(db, store, embedder,
                         generator=AnswerGenerator(backend="extractive"))
    cfg = Config(base_dir="/tmp", serve_watchdog_interval_s=0)
    app = make_app(engine, cfg)
    client = TestClient(TestServer(app))
    await client.start_server()
    try:
        queries = [f"topic {i} content" for i in range(29)]

        async def post(text, filtered=False):
            body = {"text": text, "top_k": 3, "generate": generate}
            if filtered:
                body["filter"] = {"url_prefix": "https://x/1"}
            resp = await client.post("/search", json=body)
            assert resp.status == 200, await resp.text()
            out = await resp.json()
            if generate:
                assert "generated_response" in out, out
            return out

        await post(queries[0])  # warm compile
        if filter_every:
            await post(queries[0], filtered=True)
        return await _drive(post, queries, concurrency, total, warmup=warmup,
                            filter_every=filter_every)
    finally:
        await client.close()
        db.close()
        for suffix in ("", "-wal", "-shm"):
            try:
                os.unlink(db_file.name + suffix)
            except OSError:
                pass


async def run_remote(url: str, concurrency: int, total: int,
                     warmup: int = 0, generate: bool = False,
                     filter_every: int = 0) -> dict:
    import aiohttp

    async with aiohttp.ClientSession() as session:
        queries = [f"topic {i} content" for i in range(29)]

        async def post(text, filtered=False):
            body = {"text": text, "top_k": 3, "generate": generate}
            if filtered:
                body["filter"] = {"url_prefix": "https://x/1"}
            async with session.post(url, json=body) as resp:
                assert resp.status == 200
                return await resp.json()

        await post(queries[0])
        return await _drive(post, queries, concurrency, total, warmup=warmup,
                            filter_every=filter_every)


def main() -> None:
    parser = argparse.ArgumentParser(description="HTTP serving load test")
    parser.add_argument("--url", default=None, help="target a running server")
    parser.add_argument("--small", action="store_true")
    parser.add_argument("--concurrency", type=int, default=32)
    parser.add_argument("--requests", type=int, default=300)
    parser.add_argument("--warmup", type=int, default=0,
                        help="untimed full-concurrency requests first")
    parser.add_argument("--generate", action="store_true",
                        help="full RAG path: FLAN-T5/extractive generation "
                             "in every response (the reference contract — "
                             "4-api-rag-search.py renders generated_response)")
    parser.add_argument("--filter-every", type=int, default=0,
                        help="every Nth request carries a metadata filter")
    args = parser.parse_args()
    if args.small and not args.url:
        # true CPU smoke: the axon env ignores JAX_PLATFORMS=cpu from the
        # environment — force it before first backend use
        import jax
        jax.config.update("jax_platforms", "cpu")
    if args.url:
        result = asyncio.run(run_remote(
            args.url, args.concurrency, args.requests, warmup=args.warmup,
            generate=args.generate, filter_every=args.filter_every))
    else:
        result = asyncio.run(run_inprocess(
            args.small, args.concurrency, args.requests, warmup=args.warmup,
            generate=args.generate, filter_every=args.filter_every))
    result["generate"] = args.generate
    result["filter_every"] = args.filter_every
    result["metric"] = "serve_search_qps"
    result["value"] = result["qps"]
    result["unit"] = "qps"
    result["vs_baseline"] = 1.0  # reference publishes no serving numbers
    print(json.dumps(result))


if __name__ == "__main__":
    main()
