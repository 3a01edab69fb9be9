"""Product-quantized flat index (FAISS ``IndexPQ`` analog).

The memory tier: M bytes per row (plus a 4-byte reconstruction norm)
instead of 2D/4D — 10M 384-d rows fit in ~0.5 GB HBM at M=48 where fp32
needs 15 GB. Beyond the reference (flat fp32 only, ``faiss_store.py:29``);
BASELINE.md's >10M-rows-per-chip budgets need this tier.

Search is the TPU-first ADC scan (ops/pq.py: decode codes to dense rows in
the scan and run ONE MXU matmul per chunk — same distances FAISS's LUT sum
computes, on the MXU). Distances are exact TO THE RECONSTRUCTION, so
recall@k is codec-bound (raise M for accuracy, like FAISS IndexPQ); the
IVF-PQ tier adds residual encoding for tighter codes at equal M.

Same management surface as the other index kinds: streaming adds
(capacity-doubling device buffers), ``remove_ids`` tombstones, search-time
``filter_mask``, lossless persistence (codes are stored AS IS).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logging import get_logger
from ..ops import pq as pq_ops
from .flat import _ROW_ALIGN, _round_up

logger = get_logger(__name__)


class PQIndex:
    """Product-quantized exact-over-reconstruction index."""

    def __init__(
        self,
        dim: int,
        m: Optional[int] = None,
        ksub: int = 256,
        metric: str = "L2",
        capacity: int = _ROW_ALIGN,
        device: Optional[jax.Device] = None,
        train_iters: int = 25,
        seed: int = 0,
        compute_dtype: str = "bf16",
        backend: str = "auto",
        opq: bool = False,
    ):
        if metric not in ("L2", "IP"):
            raise ValueError(f"metric must be 'L2' or 'IP', got {metric!r}")
        if m is None:
            m = max(1, dim // 8)  # 8 dims/subspace: 8x vs bf16 storage
        if dim % m:
            raise ValueError(f"dim {dim} not divisible by M={m}")
        if not 2 <= ksub <= 256:
            raise ValueError("ksub must be in [2, 256] (uint8 codes)")
        if compute_dtype not in ("bf16", "f32"):
            raise ValueError("compute_dtype must be 'bf16' or 'f32'")
        if backend not in ("auto", "xla", "pallas"):
            raise ValueError(f"bad backend {backend!r}")
        # "auto": Pallas one-hot MXU decode when eligible (TPU; XLA's gather
        # decode measured ~60x slower); "pallas" forces it (interpret mode
        # off-TPU, tests); "xla" keeps the gather decode
        self.backend = backend
        self.dim = int(dim)
        self.m = int(m)
        self.ksub = int(ksub)
        self.metric = metric
        self.compute_dtype = compute_dtype
        self.train_iters = int(train_iters)
        self.seed = int(seed)
        self.device = device if device is not None else jax.devices()[0]
        self.codebooks: Optional[jax.Array] = None  # (M, ksub, dsub) f32
        self._pq_w_cache: Optional[jax.Array] = None  # Pallas grouped copy
        # OPQ: learned orthogonal rotation applied before encoding (FAISS
        # OPQMatrix analog); None = plain PQ
        self.opq = bool(opq)
        self.rotation: Optional[jax.Array] = None   # (D, D) f32
        self.is_trained = False
        self.ntotal = 0
        self.ndeleted = 0
        self._capacity = _round_up(int(capacity), _ROW_ALIGN)
        self._codes = jax.device_put(
            jnp.zeros((self._capacity, self.m), jnp.uint8), self.device
        )
        self._sq = jax.device_put(
            jnp.zeros((self._capacity,), jnp.float32), self.device
        )
        self._dead: Optional[jax.Array] = None

    # quantized marker for callers that branch on storage (VectorStore)
    quantized = True

    @property
    def nlive(self) -> int:
        return self.ntotal - self.ndeleted

    # ------------------------------------------------------------ training
    def train(self, vectors: np.ndarray | jax.Array) -> None:
        """Train the subspace codebooks (``faiss.IndexPQ.train`` analog);
        with ``opq=True`` also learns the rotation (OPQMatrix analog)."""
        if self.opq:
            r, cb = pq_ops.train_opq(
                vectors, self.m, ksub=self.ksub, n_iters=self.train_iters,
                seed=self.seed,
            )
            self.rotation = jax.device_put(r, self.device)
        else:
            cb = pq_ops.train_pq(
                vectors, self.m, ksub=self.ksub, n_iters=self.train_iters,
                seed=self.seed,
            )
        self.codebooks = jax.device_put(cb, self.device)
        self._pq_w_cache = None
        self.is_trained = True

    def _rotate(self, rows: jax.Array) -> jax.Array:
        return rows @ self.rotation if self.rotation is not None else rows

    # ---------------------------------------------------------------- add
    def _grow(self, needed: int) -> None:
        new_cap = self._capacity
        while new_cap < needed:
            new_cap *= 2
        if new_cap == self._capacity:
            return
        pad = new_cap - self._capacity
        self._codes = jnp.pad(self._codes, ((0, pad), (0, 0)))
        self._sq = jnp.pad(self._sq, (0, pad))
        if self._dead is not None:
            self._dead = jnp.pad(self._dead, (0, pad))
        self._capacity = new_cap
        logger.debug("grew PQ index capacity to %d rows", new_cap)

    def add(self, vectors: np.ndarray | jax.Array) -> None:
        """Encode + append. Auto-trains on the first batch if untrained
        (FAISS raises instead; streaming pipelines prefer lazy training —
        logged so retrain-on-better-sample remains a conscious choice)."""
        vecs = jnp.asarray(vectors, jnp.float32)
        if vecs.ndim == 1:
            vecs = vecs[None, :]
        if vecs.shape[-1] != self.dim:
            raise ValueError(f"expected dim {self.dim}, got {vecs.shape[-1]}")
        if not self.is_trained:
            logger.info("PQ index untrained; training on first %d rows",
                        vecs.shape[0])
            self.train(vecs)
        n_new = vecs.shape[0]
        self._grow(self.ntotal + n_new)
        codes, sq = pq_ops.pq_encode(self.codebooks, self._rotate(vecs))
        self._codes = jax.lax.dynamic_update_slice(
            self._codes, codes, (self.ntotal, 0)
        )
        self._sq = jax.lax.dynamic_update_slice(self._sq, sq, (self.ntotal,))
        self.ntotal += n_new

    def build(self, vectors: np.ndarray | jax.Array) -> None:
        """Train + add in one call (parity with the IVF tiers' build)."""
        self.train(vectors)
        self.add(vectors)

    # ------------------------------------------------------------- remove
    def remove_ids(self, ids: np.ndarray | jax.Array) -> int:
        """Tombstone rows by position (same semantics as
        ``FlatIndex.remove_ids``: stable positions, persisted)."""
        pos = np.unique(np.asarray(ids, np.int64).ravel())
        pos = pos[(pos >= 0) & (pos < self.ntotal)]
        if not len(pos):
            return 0
        if self._dead is None:
            self._dead = jax.device_put(
                jnp.zeros((self._capacity,), jnp.bool_), self.device
            )
        before = self._dead
        self._dead = before.at[jnp.asarray(pos, jnp.int32)].set(True)
        newly = int(len(pos) - jnp.sum(before[jnp.asarray(pos, jnp.int32)]))
        self.ndeleted += newly
        logger.debug("tombstoned %d rows (%d live)", newly, self.nlive)
        return newly

    # ------------------------------------------------------------- search
    def search(
        self,
        queries: np.ndarray | jax.Array,
        k: int,
        chunk_size: int = 524288,
        filter_mask: Optional[np.ndarray | jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """ADC top-k; same contract as ``FlatIndex.search`` (incl. the
        ``filter_mask`` IDSelector analog)."""
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if self.ntotal == 0:
            nq = q.shape[0]
            fill = jnp.inf if self.metric == "L2" else -jnp.inf
            return (
                jnp.full((nq, k), fill, jnp.float32),
                jnp.full((nq, k), -1, jnp.int32),
            )
        dead = self._dead
        if filter_mask is not None:
            block = ~jnp.asarray(filter_mask, jnp.bool_)
            if block.shape[0] != self.ntotal:
                raise ValueError(
                    f"filter_mask has {block.shape[0]} entries, "
                    f"index has {self.ntotal}"
                )
            block = jnp.pad(block, (0, self._capacity - self.ntotal))
            dead = block if dead is None else (dead | block)
            dead = jax.device_put(dead, self.device)
        q = jax.device_put(self._rotate(q), self.device)
        chunk = min(chunk_size, self._capacity)
        pq_w = interpret = None
        if self.backend != "xla":
            from ..ops.pallas_pq import (
                decode_eligible,
                grouped_codebook,
                pick_group,
            )

            dsub = self.dim // self.m
            interpret = self.backend == "pallas" and \
                self.device.platform != "tpu"
            if decode_eligible(self.device.platform, self.m, self.ksub,
                               dsub, chunk,
                               interpret=self.backend == "pallas"):
                if self._pq_w_cache is None:
                    self._pq_w_cache = jax.device_put(
                        grouped_codebook(self.codebooks,
                                         pick_group(self.m, dsub)),
                        self.device,
                    )
                pq_w = self._pq_w_cache
        return pq_ops.pq_search(
            q, self._codes, self.codebooks, self._sq, k,
            metric=self.metric, n_valid=jnp.int32(self.ntotal),
            chunk_size=chunk,
            dead=dead, compute_dtype=self.compute_dtype,
            pq_w=pq_w, interpret=bool(interpret),
        )

    # ------------------------------------------------------------- manage
    def reset(self) -> None:
        """Drop all vectors; codebooks are kept (FAISS ``reset`` parity —
        a trained PQ survives reset)."""
        self.ntotal = 0
        self.ndeleted = 0
        self._dead = None
        self._codes = jnp.zeros_like(self._codes)
        self._sq = jnp.zeros_like(self._sq)

    def vectors(self) -> np.ndarray:
        """Reconstructions of live rows in position order (tombstoned rows
        excluded), for rebuild paths."""
        if self.ntotal == 0:
            return np.zeros((0, self.dim), np.float32)
        rec = pq_ops.pq_decode(self.codebooks, self._codes[: self.ntotal])
        if self.rotation is not None:
            rec = rec @ self.rotation.T   # back to the original basis
        rec = np.asarray(rec)
        if self._dead is not None:
            rec = rec[~np.asarray(self._dead[: self.ntotal])]
        return rec

    # ---------------------------------------------------------------- io
    def state_dict(self) -> dict:
        state = {
            "kind": "pq",
            "dim": self.dim,
            "m": self.m,
            "ksub": self.ksub,
            "metric": self.metric,
            "compute_dtype": self.compute_dtype,
            "codebooks": np.asarray(self.codebooks)
            if self.codebooks is not None
            else np.zeros((self.m, 0, self.dim // self.m), np.float32),
            "codes": np.asarray(self._codes[: self.ntotal]),
            "sqnorms": np.asarray(self._sq[: self.ntotal]),
        }
        if self.rotation is not None:
            state["rotation"] = np.asarray(self.rotation)
        if self.ndeleted:
            state["dead"] = np.asarray(self._dead[: self.ntotal])
        return state

    @classmethod
    def from_state_dict(cls, state: dict, **kwargs) -> "PQIndex":
        def item(v):
            v = np.asarray(v)
            return v.item() if v.ndim == 0 else v

        idx = cls(
            dim=int(item(state["dim"])),
            m=int(item(state["m"])),
            ksub=int(item(state["ksub"])),
            metric=str(item(state["metric"])),
            compute_dtype=str(item(state.get("compute_dtype", "bf16"))),
            opq="rotation" in state,
            **kwargs,
        )
        if "rotation" in state:
            idx.rotation = jax.device_put(
                jnp.asarray(state["rotation"], jnp.float32), idx.device
            )
        codebooks = np.asarray(state["codebooks"])
        if codebooks.size:
            idx.codebooks = jax.device_put(
                jnp.asarray(codebooks, jnp.float32), idx.device
            )
            idx.is_trained = True
        codes = np.asarray(state["codes"], np.uint8)
        n = len(codes)
        if n:
            idx._grow(n)
            idx._codes = idx._codes.at[:n].set(jnp.asarray(codes))
            idx._sq = idx._sq.at[:n].set(
                jnp.asarray(np.asarray(state["sqnorms"], np.float32))
            )
            idx.ntotal = n
        if "dead" in state:
            idx.remove_ids(np.nonzero(np.asarray(state["dead"], bool))[0])
        return idx
