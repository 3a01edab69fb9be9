"""Device-resident exact (flat) vector index.

TPU-native replacement for ``faiss.IndexFlatL2`` (reference wraps it in
``faiss_store.py:29-81`` and ``rag_datastore_manager.py:138,173,218``).
Differences by design:

- Vectors live in device HBM in a preallocated, capacity-doubling buffer with
  an ``ntotal`` watermark, so streaming adds are an in-place
  ``dynamic_update_slice`` (no host round trip, no reallocation per add —
  BASELINE.md config #5).
- Row squared-norms are precomputed at add time so every L2 query saves a
  full pass over the database.
- Both metrics from the reference's (unhonored) ``FAISS_INDEX_TYPE`` knob are
  implemented: "L2" (squared L2, ascending) and "IP" (descending)
  (``config.py:30``).
- Search runs the fused chunked scan (ops/distance.py) or the Pallas kernel
  (ops/pallas_scan.py) — never materializing the (Q, N) distance matrix.
- Storage dtype is float32 (rank-order parity with FAISS fp32 exact scan),
  bfloat16 (2x HBM capacity / bandwidth; fp32 accumulation retained), or
  int8 (FAISS SQ8 analog: symmetric per-row quantization, int8 MXU matmul
  with int32 accumulation, exact fp32 row norms — ops/quantize.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logging import get_logger
from ..ops import distance as dist_ops
from . import codec

logger = get_logger(__name__)

_ROW_ALIGN = 1024  # capacity is kept a multiple of this (MXU/VPU tiling)


def _round_up(x: int, m: int) -> int:
    return max(m, -(-x // m) * m)


class FlatIndex:
    """Exact nearest-neighbor index over a device-resident buffer."""

    def __init__(
        self,
        dim: int,
        metric: str = "L2",
        dtype: str | jnp.dtype = "float32",
        capacity: int = _ROW_ALIGN,
        device: Optional[jax.Device] = None,
        use_pallas: Optional[bool] = None,
        selector: str = "exact",
        recall_target: Optional[float] = None,
        rerank_shadow: bool = True,
    ):
        if selector not in ("exact", "approx", "rerank"):
            raise ValueError(
                f"selector must be 'exact', 'approx' or 'rerank', got {selector!r}"
            )
        if metric not in ("L2", "IP"):
            raise ValueError(f"metric must be 'L2' or 'IP', got {metric!r}")
        self.dim = int(dim)
        self.metric = metric
        self.dtype = jnp.dtype(dtype)
        self.quantized = self.dtype == jnp.int8
        if selector == "rerank" and not self.quantized:
            # retrieve-then-rerank only pays when stage 1 is quantized;
            # full-precision storage should use exact/approx directly
            raise ValueError("selector='rerank' requires dtype='int8'")
        if recall_target is None:
            # int8 scores carry quantization error on top of the selection's
            # own misses; the measured-gated default differs (docs/PERF.md).
            # The rerank selector's wide per-chunk candidate set + exact
            # second stage tolerates the cheaper 0.99 selection.
            from ..ops.quantize import DEFAULT_INT8_RECALL_TARGET

            recall_target = (
                DEFAULT_INT8_RECALL_TARGET
                if self.quantized and selector != "rerank"
                else 0.99
            )
        self.recall_target = float(recall_target)
        self.device = device if device is not None else jax.devices()[0]
        self.ntotal = 0
        self.selector = selector
        self._capacity = _round_up(int(capacity), _ROW_ALIGN)
        self._use_pallas = use_pallas
        self._buf = jax.device_put(
            jnp.zeros((self._capacity, self.dim), self.dtype), self.device
        )
        self._sq = jax.device_put(
            jnp.zeros((self._capacity,), jnp.float32), self.device
        )
        self._scales = (
            jax.device_put(jnp.zeros((self._capacity,), jnp.float32), self.device)
            if self.quantized else None
        )
        # bf16 shadow copy for the rerank stage (2 bytes/dim on top of the
        # 1-byte codes; restores the recall the quantized cross term loses)
        self._shadow = (
            jax.device_put(
                jnp.zeros((self._capacity, self.dim), jnp.bfloat16), self.device
            )
            if selector == "rerank" and rerank_shadow else None
        )
        # tombstone mask (remove_ids); allocated on first removal so the
        # common no-deletions scan stays a 3-operand program
        self._dead: Optional[jax.Array] = None
        self.ndeleted = 0

    # ---------------------------------------------------------------- add
    def _grow(self, needed: int) -> None:
        new_cap = self._capacity
        while new_cap < needed:
            new_cap *= 2
        if new_cap == self._capacity:
            return
        pad = new_cap - self._capacity
        self._buf = jnp.pad(self._buf, ((0, pad), (0, 0)))
        self._sq = jnp.pad(self._sq, (0, pad))
        if self._scales is not None:
            self._scales = jnp.pad(self._scales, (0, pad))
        if self._shadow is not None:
            self._shadow = jnp.pad(self._shadow, ((0, pad), (0, 0)))
        if self._dead is not None:
            self._dead = jnp.pad(self._dead, (0, pad))
        self._capacity = new_cap
        logger.debug("grew flat index capacity to %d rows", new_cap)

    def add(self, vectors: np.ndarray | jax.Array) -> None:
        """Append vectors at the watermark (streaming add)."""
        vecs = jnp.asarray(vectors)
        if vecs.ndim == 1:
            vecs = vecs[None, :]
        if vecs.shape[-1] != self.dim:
            raise ValueError(f"expected dim {self.dim}, got {vecs.shape[-1]}")
        n_new = vecs.shape[0]
        self._grow(self.ntotal + n_new)
        if self.quantized:
            from ..ops.quantize import quantize_rows

            vecs_f = jax.device_put(vecs.astype(jnp.float32), self.device)
            sq_dev = dist_ops.sqnorms(vecs_f)  # exact norms, pre-quantization
            q_dev, scale_dev = quantize_rows(vecs_f)
            self._buf = jax.lax.dynamic_update_slice(
                self._buf, q_dev, (self.ntotal, 0)
            )
            self._scales = jax.lax.dynamic_update_slice(
                self._scales, scale_dev, (self.ntotal,)
            )
            if self._shadow is not None:
                self._shadow = jax.lax.dynamic_update_slice(
                    self._shadow, vecs_f.astype(jnp.bfloat16), (self.ntotal, 0)
                )
        else:
            vecs_dev = jax.device_put(vecs.astype(self.dtype), self.device)
            sq_dev = dist_ops.sqnorms(vecs_dev)
            self._buf = jax.lax.dynamic_update_slice(
                self._buf, vecs_dev, (self.ntotal, 0)
            )
        self._sq = jax.lax.dynamic_update_slice(self._sq, sq_dev, (self.ntotal,))
        self.ntotal += n_new

    # ------------------------------------------------------------ remove
    @property
    def nlive(self) -> int:
        """Rows that remain searchable (``ntotal`` minus tombstones)."""
        return self.ntotal - self.ndeleted

    def remove_ids(self, ids: np.ndarray | jax.Array) -> int:
        """Tombstone rows by position (``faiss.Index.remove_ids`` analog).

        Unlike FAISS, positions are STABLE: rows are masked out of every
        search path (both metrics, all selectors, incl. the exact rerank
        stage), ``ntotal`` keeps counting capacity slots, and deletions
        persist through ``state_dict``. Space is reclaimed by ``reset`` or
        a rebuild from source documents. Returns the number of rows newly
        removed (already-removed / out-of-range ids are ignored, matching
        FAISS's IDSelector semantics)."""
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
        """Exact top-k. Returns (values, indices) as device arrays, (Q, k).

        L2 values are squared distances ascending; IP values descend.
        Missing slots (k > ntotal) hold index -1 (FAISS convention,
        ``faiss_store.py:70``).

        ``filter_mask``: optional (ntotal,) bool, True = searchable — the
        FAISS ``IDSelector`` analog. Rides the tombstone mask: distances
        stay exact over the allowed rows; selection never returns a
        filtered row.
        """
        q = jnp.asarray(queries)
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
        if self.quantized:
            from ..ops.quantize import (
                int8_rerank_search,
                int8_search,
                quantize_rows,
            )

            qf = jax.device_put(q.astype(jnp.float32), self.device)
            q_sq = dist_ops.sqnorms(qf)
            q_i8, q_scale = quantize_rows(qf)
            if self.selector == "rerank":
                return int8_rerank_search(
                    qf, q_i8, q_scale, q_sq,
                    self._buf, self._scales, self._sq, self._shadow, k,
                    metric=self.metric, n_valid=jnp.int32(self.ntotal),
                    chunk_size=min(chunk_size, self._capacity),
                    cand_per_chunk=max(2 * k, 16),
                    recall_target=self.recall_target,
                    dead=dead,
                )
            return int8_search(
                q_i8, q_scale, q_sq, self._buf, self._scales, self._sq, k,
                metric=self.metric, n_valid=jnp.int32(self.ntotal),
                chunk_size=min(chunk_size, self._capacity),
                selector=self.selector,
                recall_target=self.recall_target,
                dead=dead,
            )
        q = jax.device_put(q.astype(self.dtype), self.device)
        use_pallas = self._use_pallas
        if use_pallas is None:
            # measured on-chip (docs/PERF.md): for exact selection the fused
            # pallas kernel is ~2x the lax scan (42.7k vs 20.3k QPS @ 1M);
            # for approx selection XLA's approx_max_k wins by far (174.6k)
            use_pallas = (
                self.device.platform == "tpu" and self.selector == "exact"
                and dead is None  # kernel has no tombstone/filter operand
            )
        if use_pallas and dead is None:
            try:
                from ..ops import pallas_scan

                return pallas_scan.flat_search(
                    q, self._buf, k, metric=self.metric,
                    db_sq=self._sq, n_valid=self.ntotal,
                )
            except Exception as e:  # pragma: no cover - fallback path
                logger.debug("pallas path unavailable (%s); using lax scan", e)
        return dist_ops.exact_search(
            q, self._buf, k,
            metric=self.metric, db_sq=self._sq,
            n_valid=self.ntotal, chunk_size=chunk_size,
            selector=self.selector, recall_target=self.recall_target,
            dead=dead,
        )

    # ------------------------------------------------------------- manage
    def reset(self) -> None:
        """Drop all vectors (reference ``faiss_store.py:124-128``)."""
        self.ntotal = 0
        self.ndeleted = 0
        self._dead = None
        self._buf = jnp.zeros_like(self._buf)
        self._sq = jnp.zeros_like(self._sq)
        if self._scales is not None:
            self._scales = jnp.zeros_like(self._scales)
        if self._shadow is not None:
            self._shadow = jnp.zeros_like(self._shadow)

    def vectors(self) -> np.ndarray:
        """Host copy of the live rows (for serialization / re-training).
        int8 indexes return the dequantized reconstruction."""
        rows = self._buf[: self.ntotal]
        if self.quantized:
            from ..ops.quantize import dequantize

            return np.asarray(dequantize(rows, self._scales[: self.ntotal]))
        return np.asarray(rows)

    # ---------------------------------------------------------------- io
    def state_dict(self) -> dict:
        vecs = codec.to_host(self._buf[: self.ntotal])
        state = {
            "kind": "flat",
            "dim": self.dim,
            "metric": self.metric,
            "dtype": str(self.dtype),
            "vectors": vecs,
        }
        if self.quantized:  # lossless reload: keep codes + scales + norms
            state["scales"] = np.asarray(self._scales[: self.ntotal])
            state["sqnorms"] = np.asarray(self._sq[: self.ntotal])
            if self._shadow is not None:
                state["shadow"] = codec.to_host(self._shadow[: self.ntotal])
        if self.ndeleted:
            state["dead"] = np.asarray(self._dead[: self.ntotal])
        return state

    @classmethod
    def from_state_dict(cls, state: dict, **kwargs) -> "FlatIndex":
        idx = cls(
            dim=int(state["dim"]),
            metric=str(state["metric"]),
            dtype=str(state["dtype"]),
            **kwargs,
        )
        vecs = np.asarray(state["vectors"])
        if idx.dtype == jnp.bfloat16 and vecs.dtype != np.float32:
            # uint16 bit pattern (or legacy void "|V2"): back to bf16, then
            # widen for add()
            vecs = np.asarray(
                codec.from_host(vecs, jnp.bfloat16).astype(jnp.float32))
        if len(vecs) == 0:
            return idx
        if idx.quantized and "scales" in state:
            n = len(vecs)
            idx._grow(n)
            idx._buf = jax.lax.dynamic_update_slice(
                idx._buf, jnp.asarray(vecs, jnp.int8), (0, 0)
            )
            idx._scales = jax.lax.dynamic_update_slice(
                idx._scales, jnp.asarray(state["scales"], jnp.float32), (0,)
            )
            idx._sq = jax.lax.dynamic_update_slice(
                idx._sq, jnp.asarray(state["sqnorms"], jnp.float32), (0,)
            )
            if idx._shadow is not None and "shadow" in state:
                shadow = codec.from_host(state["shadow"], jnp.bfloat16)
                idx._shadow = jax.lax.dynamic_update_slice(
                    idx._shadow, shadow, (0, 0)
                )
            elif idx._shadow is not None:
                # no stored shadow: reconstruct (lossy) from the codes
                from ..ops.quantize import dequantize

                idx._shadow = jax.lax.dynamic_update_slice(
                    idx._shadow,
                    dequantize(
                        jnp.asarray(vecs, jnp.int8),
                        jnp.asarray(state["scales"], jnp.float32),
                    ).astype(jnp.bfloat16),
                    (0, 0),
                )
            idx.ntotal = n
        else:
            idx.add(vecs)
        if "dead" in state:
            dead = np.asarray(state["dead"], bool)
            idx.remove_ids(np.nonzero(dead)[0])
        return idx
