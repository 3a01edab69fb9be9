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

import os as _os

# Zero-egress-friendly: HF hub probes fail fast instead of burning ~30s in
# connection timeouts. Remove/override these to pull from a live hub.
_os.environ.setdefault("HF_HUB_OFFLINE", "1")
_os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: fresh processes (CLI runs, API
    server restarts) reuse compiled programs instead of paying the 20-40s
    TPU compile per shape. Opt out with RFE_NO_COMPILE_CACHE=1."""
    if _os.environ.get("RFE_NO_COMPILE_CACHE"):
        return
    # Denylist, not allowlist: a real TPU VM usually leaves JAX_PLATFORMS
    # unset (auto-detect) and must still get the cache. Excluded: the
    # experimental 'axon' tunnel (deadlocks inside the persistent cache —
    # threads futex-wait on first compile) and pure-CPU (AOT reload warns
    # about machine-feature mismatches and CPU compiles are cheap anyway).
    platforms = _os.environ.get("JAX_PLATFORMS", "")
    if "axon" in platforms or platforms.strip() == "cpu":
        return
    try:
        import jax

        cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.expanduser("~/.cache/rfe_jax_cache"),
        )
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


_enable_compilation_cache()

__version__ = "0.1.0"
