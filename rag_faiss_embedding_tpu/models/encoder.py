"""Batched text -> embedding pipeline.

TPU-native equivalent of the reference's ``VectorizationPipeline``
(``vectorization.py:19-47``) and its duplicate ``EmbeddingModel``
(``rag_datastore_manager.py:99-132``): batch texts, tokenize on host, run the
encoder forward pass, pool, return a float32 numpy array.

Differences by design:
- the forward pass is a single jitted XLA program per (batch, seq) bucket —
  tokenization pads to power-of-two buckets so at most ~6 shapes ever compile
  (the reference pays a host->device copy + eager dispatch per batch,
  ``vectorization.py:38-44``);
- pooling happens on device; only (B, 384) crosses back per batch;
- optional L2-normalization for cosine/IP retrieval;
- weights: converted HF checkpoint when cached locally, else deterministic
  init; tokenizer: real vocab.txt when cached, else corpus-trained WordPiece
  persisted next to the index.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Iterable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logging import get_logger
from .convert import (
    deterministic_params,
    import_params,
    infer_config_from_params,
    load_pretrained,
)
from .minilm import MiniLMConfig, MiniLMEncoder
from .tokenizer import WordPieceTokenizer

logger = get_logger(__name__)


class EmbeddingPipeline:
    def __init__(
        self,
        model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
        cfg: Optional[MiniLMConfig] = None,
        params: Optional[dict] = None,
        tokenizer: Optional[WordPieceTokenizer] = None,
        pooling: str = "cls",
        normalize: bool = False,
        max_seq_length: int = 512,
        vocab_path: Optional[str | Path] = None,
        params_path: Optional[str | Path] = None,
        device: Optional[jax.Device] = None,
    ):
        self.model_name = model_name
        self.pooling = pooling
        self.normalize = normalize
        self.max_seq_length = max_seq_length
        self.device = device if device is not None else jax.devices()[0]

        # --- tokenizer resolution. When corpus-trained encoder params exist
        # (params_path), the vocab they were trained with MUST win over an
        # HF-cache vocab: mismatched vocab ids index garbage embedding rows
        # silently. Otherwise: HF cache -> vocab file -> trained-on-demand.
        have_trained = (
            params is None and params_path and Path(params_path).exists()
        )
        if tokenizer is None and have_trained and vocab_path and Path(vocab_path).exists():
            tokenizer = WordPieceTokenizer.from_vocab_file(vocab_path)
            logger.info("loaded trained-vocab tokenizer from %s", vocab_path)
        if tokenizer is None:
            tokenizer = WordPieceTokenizer.from_hf_cache(model_name)
        if tokenizer is None and vocab_path and Path(vocab_path).exists():
            tokenizer = WordPieceTokenizer.from_vocab_file(vocab_path)
            logger.info("loaded tokenizer vocab from %s", vocab_path)
        if tokenizer is not None:
            tokenizer.enable_native()  # C++ fast path; silent no-op if absent
        self.tokenizer = tokenizer  # may still be None: call fit_tokenizer
        self.vocab_path = Path(vocab_path) if vocab_path else None

        # --- model weights
        if params is None and params_path and Path(params_path).exists():
            params = import_params(params_path)
            if cfg is None:
                cfg = infer_config_from_params(params)
            logger.info("loaded encoder params from %s", params_path)
        if params is None:
            loaded = load_pretrained(model_name, cfg)
            if loaded is not None:
                cfg, params = loaded
        if cfg is None:
            cfg = MiniLMConfig()
        if params is None:
            logger.warning(
                "no local checkpoint for %s; using deterministic random init "
                "(embeddings are functional but not semantically meaningful)",
                model_name,
            )
            params = deterministic_params(cfg)
        self.cfg = cfg
        self.model = MiniLMEncoder(cfg)
        self.params = jax.device_put(params, self.device)
        self._forward = functools.partial(
            jax.jit(self._forward_impl, static_argnames=("pooling",)),
        )
        logger.debug("initialized embedding pipeline (%s)", model_name)

    def _forward_impl(self, params, input_ids, attention_mask, *, pooling):
        emb = self.model.apply(
            {"params": params}, input_ids, attention_mask, pooling=pooling
        )
        if self.normalize:
            emb = emb / jnp.maximum(
                jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12
            )
        return emb

    # ------------------------------------------------------------ tokenizer
    def fit_tokenizer(
        self, corpus: Iterable[str], vocab_size: Optional[int] = None
    ) -> WordPieceTokenizer:
        """Train the fallback WordPiece vocab on a corpus and persist it."""
        vocab_size = vocab_size or min(self.cfg.vocab_size, 30522)
        self.tokenizer = WordPieceTokenizer.train(corpus, vocab_size=vocab_size)
        self.tokenizer.enable_native()
        if self.vocab_path:
            self.tokenizer.save(self.vocab_path)
            logger.info("saved trained vocab to %s", self.vocab_path)
        return self.tokenizer

    def _require_tokenizer(self, texts: Sequence[str]) -> WordPieceTokenizer:
        if self.tokenizer is None:
            logger.warning("no tokenizer vocab available; training on input texts")
            self.fit_tokenizer(texts)
        return self.tokenizer

    # ------------------------------------------------------------- embedding
    def generate_embeddings(
        self,
        texts: Sequence[str],
        batch_size: int = 32,
        show_progress: bool = False,
    ) -> np.ndarray:
        """Batched embed; returns (len(texts), hidden) float32 numpy array.

        Same contract as the reference ``generate_embeddings``
        (``vectorization.py:19``).
        """
        texts = list(texts)
        if not texts:
            return np.zeros((0, self.cfg.hidden_size), np.float32)
        tok = self._require_tokenizer(texts)
        ranges = range(0, len(texts), batch_size)
        if show_progress:
            try:
                from tqdm import tqdm

                ranges = tqdm(ranges, desc="Batches")
            except ImportError:
                pass
        out: List[np.ndarray] = []
        for start in ranges:
            batch = texts[start : start + batch_size]
            ids, mask = tok.encode_batch(batch, self.max_seq_length)
            # pad batch dim to the full batch_size bucket to cap compiles
            if len(batch) < batch_size:
                pad = batch_size - len(batch)
                ids = np.pad(ids, ((0, pad), (0, 0)), constant_values=tok.pad_id)
                mask = np.pad(mask, ((0, pad), (0, 0)))
            emb = self._forward(
                self.params,
                jax.device_put(ids, self.device),
                jax.device_put(mask, self.device),
                pooling=self.pooling,
            )
            out.append(np.asarray(emb[: len(batch)], np.float32))
        return np.concatenate(out, axis=0)

    def embed_query(self, text: str) -> np.ndarray:
        return self.generate_embeddings([text], batch_size=1)[0]
