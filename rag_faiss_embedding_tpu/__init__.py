"""TPU-native retrieval / RAG framework.

A from-scratch re-design of the capabilities of ``luzbetak/rag-faiss-embedding``
(HTML ingest -> summarize -> embed -> vector index -> SQLite doc store ->
search/RAG -> CLI/API), built JAX-first for TPU:

- Flax MiniLM-class encoder, jit-batched (replaces torch+transformers forward,
  reference ``vectorization.py:19-47``).
- Device-resident exact (flat) and IVF vector indexes scanned by fused
  distance+top-k kernels (replaces ``faiss.IndexFlatL2`` via ``faiss_store.py``).
- pjit/shard_map sharding over a ``jax.sharding.Mesh`` with all-gather top-k
  merge for multi-chip corpora (the reference is single-process, single-device).
- Host-side SQLite document store with int-id<->doc mapping (parity with
  reference ``database.py``).

Package layout:
  core/      config, logging, mesh/device setup
  ops/       distance + top-k kernels (jnp reference & Pallas fused), k-means
  models/    Flax encoder, tokenizer, HF weight conversion, generator
  index/     FlatIndex, IVFFlatIndex, sharded scan, serialization
  parallel/  mesh helpers, sharded search, contrastive training step
  store/     SQLite doc store
  ingest/    HTML extraction/summarization, document validator
  rag/       QueryEngine / RAG manager
  serve/     HTTP API server (aiohttp) + client
  cli/       interactive search REPL, admin tool, pipeline driver
  native/    C++ host-side components (fast WordPiece tokenizer)
"""

__version__ = "0.1.0"
