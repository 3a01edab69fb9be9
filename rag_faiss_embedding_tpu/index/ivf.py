"""IVF-Flat index: k-means coarse quantizer + inverted-list scan.

TPU-native analog of ``faiss.IndexIVFFlat`` (BASELINE.md config #3: nlist=4096
build, nprobe sweep, recall parity at equal memory). The reference never gets
past flat indexes; this is the tier for corpora past HBM-comfortable flat
scan — and, with int8 storage, the only tier whose throughput ceiling exceeds
the chip's full-scan matmul roofline (it prunes the matmul itself).

TPU-first design decisions (SURVEY.md §7 "IVF irregularity on TPU"):
- vectors are stored CLUSTER-SORTED in one contiguous device buffer (plus
  parallel sqnorm/row-id arrays) — no per-list ragged structures;
- a probe reads a fixed-size window of ``C`` slots (C = the P98 list length,
  padded to 128) starting at the list offset, with a validity mask —
  variable-length lists become fixed-shape gathers XLA can vectorize; rows
  of lists longer than C spill into the exactly-scanned pending tier;
- the default search path is the FUSED batched kernel (ops/ivf_scan.py):
  coarse scan + dedup'd union gather + one MXU matmul + approx top-k +
  spill merge in ONE jitted program (the per-query windowed path below is
  the semantics reference and the small-batch fallback);
- storage may be float32, bfloat16, or int8 (SQ8: symmetric per-row scales,
  EXACT fp32 row norms, int8 MXU matmul — ops/quantize.py rationale), so
  IVF pruning and int8 bandwidth compose;
- metric is "L2" or "IP"; IP uses spherical k-means (normalized centroids,
  dot-product assignment) so the coarse partition matches the probe rule;
- streaming adds land in a flat exactly-scanned pending tier (device
  resident) that is merged by ``rebuild()`` — adds never degrade recall
  (BASELINE.md config #5), unlike append-in-place schemes that skew lists.

Returned indices are original insertion positions, so VectorStore's
position->doc-id mapping works unchanged across flat and IVF tiers.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logging import get_logger
from ..ops import distance as dist_ops
from ..ops.ivf_scan import fused_ivf_search
from ..ops.kmeans import assign as kmeans_assign, train_kmeans
from ..ops.quantize import DEFAULT_INT8_RECALL_TARGET, quantize_rows
from .flat import FlatIndex, _round_up

logger = get_logger(__name__)


def probe_scan_math(
    q,            # (Q, D) f32
    sorted_vecs,  # (Npad, D)
    sorted_sq,    # (Npad,)
    sorted_ids,   # (Npad,) int32, -1 for padding
    offsets,      # (nlist,) int32
    lengths,      # (nlist,) int32
    probe_lists,  # (Q, P) int32
    k: int,
    window: int,  # C
):
    """Per-query fixed-window masked probe scan (semantics reference for the
    fused kernel; also the per-device kernel in parallel/sharded_ivf — keep
    ONE implementation)."""
    nq, d = q.shape
    p = probe_lists.shape[1]
    starts = offsets[probe_lists]                       # (Q, P)
    lens = lengths[probe_lists]                         # (Q, P)
    slot = jnp.arange(window, dtype=jnp.int32)          # (C,)
    idx = starts[:, :, None] + slot[None, None, :]      # (Q, P, C)
    valid = slot[None, None, :] < lens[:, :, None]
    idx = jnp.where(valid, idx, 0)

    vecs = sorted_vecs[idx]                             # (Q, P, C, D)
    sq = sorted_sq[idx]                                 # (Q, P, C)
    ids = jnp.where(valid, sorted_ids[idx], -1)

    dots = jnp.einsum(
        "qd,qpcd->qpc", q.astype(jnp.float32), vecs.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    q_sq = jnp.sum(q.astype(jnp.float32) ** 2, axis=-1)  # (Q,)
    dist = q_sq[:, None, None] - 2.0 * dots + sq
    dist = jnp.where(valid, jnp.maximum(dist, 0.0), jnp.inf)

    flat_dist = dist.reshape(nq, p * window)
    flat_ids = ids.reshape(nq, p * window)
    k_eff = min(k, p * window)
    best, pos = jax.lax.top_k(-flat_dist, k_eff)
    out_ids = jnp.take_along_axis(flat_ids, pos, axis=1)
    out_dist = -best
    out_ids = jnp.where(jnp.isinf(out_dist), -1, out_ids)
    return out_dist, out_ids


_probe_scan = functools.partial(
    jax.jit, static_argnames=("k", "window")
)(probe_scan_math)


def balanced_assignment(
    choices: np.ndarray,   # (N, C) candidate lists, best first
    scores: np.ndarray,    # (N, C) matching scores (ascending preference)
    nlist: int,
    cap: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Capacity-capped assignment: each point takes its best-choice list
    with room, preferring the CLOSEST points when a list overflows (evicted
    points fall back to their next choice). Returns (assignments (N,),
    spill_rows) where spill rows exhausted every choice.

    This is the window-size lever for the fused probe scan: the gather pays
    for the window on every probe, and k-means skew otherwise forces
    window ~ 8x the mean list length. Vectorized host pass (numpy lexsort
    per choice rank) — O(C * N log N) on scalars, the vectors stay on
    device."""
    n = len(choices)
    assign = np.full(n, -1, np.int64)
    capacity = np.full(nlist, cap, np.int64)
    pending = np.arange(n)
    for c in range(choices.shape[1]):
        if not len(pending):
            break
        lists = choices[pending, c].astype(np.int64)
        order = np.lexsort((scores[pending, c], lists))
        lp = lists[order]
        first = np.r_[True, lp[1:] != lp[:-1]] if len(lp) else np.zeros(0, bool)
        group_start = np.maximum.accumulate(
            np.where(first, np.arange(len(lp)), 0)
        )
        rank = np.arange(len(lp)) - group_start
        ok = rank < capacity[lp]
        sel = pending[order[ok]]
        assign[sel] = lp[ok]
        capacity -= np.bincount(lp[ok], minlength=nlist)
        pending = pending[order[~ok]]
    return assign, pending


class IVFFlatIndex:
    """Inverted-file flat index with exact within-list distances."""

    def __init__(
        self,
        dim: int,
        nlist: int = 1024,
        metric: str = "L2",
        nprobe: int = 8,
        dtype: str | jnp.dtype = "float32",
        device: Optional[jax.Device] = None,
        train_iters: int = 20,
        seed: int = 0,
        recall_target: Optional[float] = None,
        balance: str = "spill",
        reassign_choices: int = 3,
    ):
        if metric not in ("L2", "IP"):
            raise ValueError(f"metric must be 'L2' or 'IP', got {metric!r}")
        if balance not in ("spill", "reassign"):
            raise ValueError(
                f"balance must be 'spill' or 'reassign', got {balance!r}"
            )
        self.dim = int(dim)
        self.nlist = int(nlist)
        self.metric = metric
        self.nprobe = int(nprobe)
        self.dtype = jnp.dtype(dtype)
        self.quantized = self.dtype == jnp.int8
        self.device = device if device is not None else jax.devices()[0]
        self.train_iters = train_iters
        self.seed = seed
        # selection recall_target for the fused path's approx_max_k; int8
        # scores carry quantization error on top (same rationale as flat,
        # docs/PERF.md measured sweep)
        self.recall_target = float(
            recall_target if recall_target is not None
            else (DEFAULT_INT8_RECALL_TARGET if self.quantized else 0.99)
        )

        self.is_trained = False
        self.centroids: Optional[jax.Array] = None   # (nlist, D) f32
        self._cent_store: Optional[jax.Array] = None  # coarse-scan dtype
        self._cent_sq: Optional[jax.Array] = None
        self._sorted_vecs: Optional[jax.Array] = None  # codes if quantized
        self._sorted_scales: Optional[jax.Array] = None
        self._sorted_sq: Optional[jax.Array] = None
        self._sorted_ids: Optional[jax.Array] = None
        self._offsets: Optional[jax.Array] = None
        self._lengths: Optional[jax.Array] = None
        self._offsets_ext: Optional[jax.Array] = None  # +sentinel slot
        self._lengths_ext: Optional[jax.Array] = None
        self._window = 0
        self._n_built = 0
        # exact pending tier for streaming adds
        self._pending = FlatIndex(dim, metric=metric, dtype=dtype,
                                  device=self.device)
        # pending tier holds BOTH overflow spill from capped lists and
        # streamed adds; _pending_rowids maps pending positions -> global ids
        # (kept on host for persistence, mirrored on device for the hot path)
        self._pending_rowids = np.zeros((0,), np.int32)
        self._pending_rowids_dev = None
        self._spill_pos = np.zeros((0,), np.int64)  # sorted-array coords
        self._n_streamed = 0
        self._next_id = 0
        self.rebuild_threshold = 0.25  # rebuild when STREAMED > 25% of built
        self.window_quantile = 0.98  # cap probe window at this list-length
        #                              quantile; longer lists spill overflow
        self.use_fused = True  # per-query windowed path kept as fallback
        # balance="spill": overflow past the window cap goes to the exact
        #   pending tier (never hurts recall; the tier is scanned by every
        #   query). balance="reassign": overflow rows move to their
        #   next-nearest list with room (balanced_assignment) — smaller
        #   windows and near-zero spill, at the cost that a displaced row is
        #   only found when its host list is probed (raise nprobe by ~1).
        self.balance = balance
        self.reassign_choices = int(reassign_choices)

    # ------------------------------------------------------------- building
    @property
    def ntotal(self) -> int:
        return self._next_id

    def train(self, vectors: np.ndarray | jax.Array) -> None:
        vecs = jnp.asarray(vectors)
        nlist = min(self.nlist, vecs.shape[0])
        if nlist < self.nlist:
            logger.warning("reducing nlist %d -> %d (few train vectors)",
                           self.nlist, nlist)
            self.nlist = nlist
        self.centroids, _ = train_kmeans(
            vecs, self.nlist, n_iters=self.train_iters, seed=self.seed,
            spherical=(self.metric == "IP"),
        )
        self.is_trained = True

    def build(self, vectors: np.ndarray | jax.Array,
              row_ids: Optional[np.ndarray] = None) -> None:
        """Train (if needed) and populate the inverted lists.

        The entire build stays on device — assignment (point-chunked),
        argsort, gather, bincount, cumsum — with ONE scalar host sync for the
        window size. The previous host-side sort round-tripped the whole
        corpus through the (slow) host link: 1.5 GB at 1M x 384.
        """
        vecs_f32 = jnp.asarray(vectors, jnp.float32)
        n = vecs_f32.shape[0]
        if not self.is_trained:
            self.train(vecs_f32)
        n_reassign_spill = 0
        if self.balance == "reassign":
            # capacity-capped assignment: overflow rows fall back to their
            # next-nearest list, keeping every window small (the fused scan
            # pays window bytes per probe)
            from ..ops.kmeans import assign_topk

            choices, cvals = assign_topk(
                vecs_f32, self.centroids, self.reassign_choices,
                metric=self.metric,
            )
            choices_np = np.asarray(choices)
            pref = np.asarray(cvals)
            if self.metric == "IP":
                pref = -pref  # lexsort wants ascending preference
            first_lengths = np.bincount(choices_np[:, 0], minlength=self.nlist)
            cap = int(_round_up(
                max(128, int(np.quantile(first_lengths,
                                         self.window_quantile))), 128
            ))
            assign_np, spill_rows = balanced_assignment(
                choices_np, pref, self.nlist, cap
            )
            n_reassign_spill = len(spill_rows)
            # rows that exhausted every choice sort to the tail (sentinel)
            assignments = jnp.asarray(
                np.where(assign_np >= 0, assign_np, self.nlist), jnp.int32
            )
            lengths = jnp.asarray(
                np.bincount(assign_np[assign_np >= 0],
                            minlength=self.nlist).astype(np.int32)
            )
            if n_reassign_spill:
                logger.info(
                    "balanced build: %d rows exhausted %d choices (cap %d); "
                    "spilled to the exact tier",
                    n_reassign_spill, self.reassign_choices, cap,
                )
        else:
            # point-chunked assignment: a full (N, nlist) score matrix is
            # 16 GB at 1M x 4096
            assignments, _ = kmeans_assign(vecs_f32, self.centroids,
                                           metric=self.metric)
            lengths = jnp.bincount(
                assignments, length=self.nlist
            ).astype(jnp.int32)
        order = jnp.argsort(assignments, stable=True)
        offsets = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(lengths)[:-1]]
        )
        sorted_f32 = vecs_f32[order]
        sorted_sq = dist_ops.sqnorms(sorted_f32)  # exact, pre-quantization
        if self.quantized:
            sorted_vecs, sorted_scales = quantize_rows(sorted_f32)
        else:
            sorted_vecs = sorted_f32.astype(self.dtype)
            sorted_scales = None
        if row_ids is None:
            sorted_ids = order.astype(jnp.int32)
        else:
            sorted_ids = jnp.asarray(row_ids, jnp.int32)[order]

        lengths_np = np.asarray(lengths)  # (nlist,) ints — tiny transfer
        max_len = max(int(lengths_np.max()), 1)
        self._pending.reset()
        self._pending_rowids = np.zeros((0,), np.int32)
        self._pending_rowids_dev = None
        self._n_streamed = 0
        if self.balance == "reassign":
            # capacity already enforced during assignment; only rows that
            # exhausted every choice (sorted to the tail) spill
            window = int(_round_up(max_len, 128))
            if n_reassign_spill:
                spill_pos = np.arange(n - n_reassign_spill, n, dtype=np.int64)
                self._spill_pos = spill_pos
                pos_dev = jnp.asarray(spill_pos)
                self._pending.add(sorted_f32[pos_dev])
                self._pending_rowids = np.asarray(sorted_ids[pos_dev])
                self._pending_rowids_dev = None
            else:
                self._spill_pos = np.zeros((0,), np.int64)
        # Cap the probe window at a list-length quantile: k-means skew makes
        # the longest list ~8x the mean, and the fixed-window gather pays for
        # the LONGEST list on every probe. Rows past the cap spill into the
        # exactly-scanned pending tier (small, never hurts recall).
        elif (cap := int(_round_up(
            max(128, int(np.quantile(lengths_np, self.window_quantile))), 128
        ))) < max_len:
            window = cap
            offsets_np = np.asarray(offsets, np.int64)
            spill_pos = np.concatenate([
                np.arange(off + cap, off + ln)
                for off, ln in zip(offsets_np, lengths_np) if ln > cap
            ]).astype(np.int64)
            self._spill_pos = spill_pos
            pos_dev = jnp.asarray(spill_pos)
            self._pending.add(sorted_f32[pos_dev])
            self._pending_rowids = np.asarray(sorted_ids[pos_dev])
            self._pending_rowids_dev = None
            lengths = jnp.minimum(lengths, cap)
            logger.info(
                "capped IVF window at %d (max list %d): %d rows spilled "
                "to the exact tier", cap, max_len, len(spill_pos),
            )
        else:
            window = int(_round_up(max_len, 128))
            self._spill_pos = np.zeros((0,), np.int64)

        # pad one window so every probe window stays in bounds
        pad = window
        self._sorted_vecs = jax.device_put(
            jnp.pad(sorted_vecs, ((0, pad), (0, 0))), self.device
        )
        self._sorted_scales = (
            jax.device_put(jnp.pad(sorted_scales, (0, pad)), self.device)
            if sorted_scales is not None else None
        )
        self._sorted_sq = jax.device_put(jnp.pad(sorted_sq, (0, pad)), self.device)
        self._sorted_ids = jax.device_put(
            jnp.pad(sorted_ids, (0, pad), constant_values=-1), self.device
        )
        self._offsets = jax.device_put(offsets, self.device)
        self._lengths = jax.device_put(lengths, self.device)
        # sentinel slot (offset 0, length 0) indexed by dedup'd duplicates
        # in the fused union kernel
        self._offsets_ext = jax.device_put(
            jnp.concatenate([offsets, jnp.zeros((1,), jnp.int32)]), self.device
        )
        self._lengths_ext = jax.device_put(
            jnp.concatenate([lengths, jnp.zeros((1,), jnp.int32)]), self.device
        )
        # coarse-scan centroid copy: storage dtype (bf16 for int8 indexes —
        # the coarse ranking only picks lists, full precision is wasted BW)
        cdtype = jnp.bfloat16 if self.quantized else self.dtype
        self._cent_store = jax.device_put(
            self.centroids.astype(cdtype), self.device
        )
        self._cent_sq = jax.device_put(
            dist_ops.sqnorms(self.centroids), self.device
        )
        self._window = window
        self._n_built = n
        self._next_id = n
        logger.info(
            "built IVF: n=%d nlist=%d window=%d",
            n, self.nlist, window,
        )

    def add(self, vectors: np.ndarray | jax.Array) -> None:
        """Streaming add into the exact pending tier; auto-rebuild when the
        pending tier outgrows ``rebuild_threshold`` of the built tier."""
        vecs = jnp.asarray(vectors)
        if vecs.ndim == 1:
            vecs = vecs[None, :]
        if not self.is_trained:
            # first add = build
            self.build(vecs)
            return
        n_new = vecs.shape[0]
        self._pending.add(vecs)
        self._pending_rowids = np.concatenate([
            self._pending_rowids,
            np.arange(self._next_id, self._next_id + n_new, dtype=np.int32),
        ])
        self._pending_rowids_dev = None
        self._next_id += n_new
        self._n_streamed += n_new
        if self._n_streamed > self.rebuild_threshold * max(self._n_built, 1):
            self.rebuild()

    def rebuild(self) -> None:
        """Merge pending tier into the inverted lists (keeps centroids)."""
        if self._pending.ntotal == 0:
            return
        all_vecs = self.vectors()  # insertion order: built (by id) + pending
        logger.info("rebuilding IVF with %d vectors", len(all_vecs))
        self.build(all_vecs)

    # -------------------------------------------------------------- search
    def _pending_dev(self) -> Tuple[jax.Array, ...]:
        """Spill/streaming tier as fused-kernel inputs: (codes, scales|None,
        sqnorms, global row ids padded to capacity with -1)."""
        if self._pending_rowids_dev is None or (
            self._pending_rowids_dev.shape[0] != self._pending._capacity
        ):
            ids = np.full((self._pending._capacity,), -1, np.int32)
            ids[: len(self._pending_rowids)] = self._pending_rowids
            self._pending_rowids_dev = jax.device_put(
                jnp.asarray(ids), self.device
            )
        return (
            self._pending._buf,
            self._pending._scales,
            self._pending._sq,
            self._pending_rowids_dev,
        )

    def _probe_query_chunk(self, nprobe: int) -> int:
        """Queries per probe-scan chunk so the (Qc, P, C, D) gather stays
        within a ~2 GB budget (at 1M x nlist=4096, nprobe=64 the full-batch
        gather is ~19 GB > HBM)."""
        bytes_per_q = nprobe * self._window * self.dim * self.dtype.itemsize
        budget = 2 << 30
        return max(8, min(256, budget // max(bytes_per_q, 1)))

    def search(
        self,
        queries: np.ndarray | jax.Array,
        k: int,
        nprobe: Optional[int] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        nprobe = min(nprobe or self.nprobe, self.nlist)
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        nq = q.shape[0]
        if self.ntotal == 0:
            fill = jnp.inf if self.metric == "L2" else -jnp.inf
            return (
                jnp.full((nq, k), fill, jnp.float32),
                jnp.full((nq, k), -1, jnp.int32),
            )
        if self._n_built == 0:
            vals, pidx = self._pending.search(q, k)
            rowids = self._pending_dev()[3]
            pidx = jnp.where(pidx >= 0, rowids[jnp.maximum(pidx, 0)], -1)
            return vals, pidx
        if self.use_fused:
            spill = self._pending_dev() if self._pending.ntotal else None
            return fused_ivf_search(
                q, self._cent_store, self._cent_sq,
                self._sorted_vecs, self._sorted_scales,
                self._sorted_sq, self._sorted_ids,
                self._offsets_ext, self._lengths_ext, spill,
                k=k, nprobe=nprobe, window=self._window, metric=self.metric,
                recall_target=self.recall_target,
            )
        return self._search_windowed(q, k, nprobe)

    def _search_windowed(
        self, q: jax.Array, k: int, nprobe: int
    ) -> Tuple[jax.Array, jax.Array]:
        """Per-query windowed path (L2, full-precision storage only) — the
        fused kernel's semantics reference; kept for A/B and small batches."""
        if self.quantized or self.metric != "L2":
            raise ValueError(
                "windowed path supports metric='L2' float storage; "
                "use the fused path (use_fused=True)"
            )
        nq = q.shape[0]
        _, probe_lists = dist_ops.exact_search(
            q, self.centroids, nprobe, metric="L2",
            chunk_size=min(65536, self.nlist),
        )
        qc = self._probe_query_chunk(nprobe)
        if nq <= qc:
            dist, ids = _probe_scan(
                q.astype(jnp.float32),
                self._sorted_vecs, self._sorted_sq, self._sorted_ids,
                self._offsets, self._lengths, probe_lists,
                k=k, window=self._window,
            )
        else:
            parts = []
            pad = (-nq) % qc
            q_pad = jnp.pad(q.astype(jnp.float32), ((0, pad), (0, 0)))
            p_pad = jnp.pad(probe_lists, ((0, pad), (0, 0)))
            for start in range(0, nq + pad, qc):
                parts.append(_probe_scan(
                    q_pad[start : start + qc],
                    self._sorted_vecs, self._sorted_sq, self._sorted_ids,
                    self._offsets, self._lengths,
                    p_pad[start : start + qc],
                    k=k, window=self._window,
                ))
            dist = jnp.concatenate([p[0] for p in parts])[:nq]
            ids = jnp.concatenate([p[1] for p in parts])[:nq]
        if self._pending.ntotal:
            pvals, pidx = self._pending.search(q, k)
            rowids = self._pending_dev()[3]
            pidx = jnp.where(
                pidx >= 0, rowids[jnp.maximum(pidx, 0)], -1
            )
            merged_v, merged_i = dist_ops.merge_topk(
                -dist, ids, -pvals, pidx, min(k, dist.shape[1] + pvals.shape[1])
            )
            dist, ids = -merged_v, merged_i
        if dist.shape[1] < k:
            pad = k - dist.shape[1]
            dist = jnp.concatenate(
                [dist, jnp.full((nq, pad), jnp.inf, dist.dtype)], axis=1
            )
            ids = jnp.concatenate(
                [ids, jnp.full((nq, pad), -1, jnp.int32)], axis=1
            )
        return dist, ids

    # ------------------------------------------------------------- manage
    def reset(self) -> None:
        self.is_trained = False
        self.centroids = None
        self._cent_store = None
        self._cent_sq = None
        self._sorted_vecs = None
        self._sorted_scales = None
        self._sorted_sq = None
        self._sorted_ids = None
        self._offsets = None
        self._lengths = None
        self._offsets_ext = None
        self._lengths_ext = None
        self._window = 0
        self._n_built = 0
        self._next_id = 0
        self._n_streamed = 0
        self._pending_rowids = np.zeros((0,), np.int32)
        self._pending_rowids_dev = None
        self._spill_pos = np.zeros((0,), np.int64)
        self._pending.reset()

    def vectors(self) -> np.ndarray:
        """Live vectors in original insertion order (spilled rows counted
        once, via the pending tier). int8 indexes return the dequantized
        reconstruction (codes survive a re-quantization round trip exactly:
        the amax element maps back to ±127)."""
        all_vecs = []
        all_ids = []
        if self._n_built:
            built = self._sorted_vecs[: self._n_built]
            if self.quantized:
                from ..ops.quantize import dequantize

                built = np.asarray(
                    dequantize(built, self._sorted_scales[: self._n_built])
                )
            else:
                built = np.asarray(built)
            ids = np.asarray(self._sorted_ids[: self._n_built])
            if len(self._spill_pos):
                keep = np.ones(self._n_built, bool)
                keep[self._spill_pos] = False
                built, ids = built[keep], ids[keep]
            all_vecs.append(built.astype(np.float32))
            all_ids.append(ids)
        if self._pending.ntotal:
            all_vecs.append(self._pending.vectors())
            all_ids.append(self._pending_rowids)
        if not all_vecs:
            return np.zeros((0, self.dim), np.float32)
        vecs = np.concatenate(all_vecs)
        ids = np.concatenate(all_ids)
        return vecs[np.argsort(ids, kind="stable")]

    # ---------------------------------------------------------------- io
    def _host(self, arr: Optional[jax.Array], n: int) -> np.ndarray:
        """First n rows as a savez-able numpy array (bf16 -> uint16 bits)."""
        rows = arr[:n]
        if rows.dtype == jnp.bfloat16:
            rows = rows.view(jnp.uint16)
        return np.asarray(rows)

    def state_dict(self) -> dict:
        """Exact state: the sorted arrays + pending tier are persisted as-is
        (format "sorted_v2"), so reload is LOSSLESS for every storage dtype —
        no rebuild-from-dequantized drift, no O(N*nlist) re-assignment on
        load. (Analog of ``faiss.write_index`` keeping the inverted lists,
        ``faiss_store.py:83-97``.)"""
        n = self._n_built
        state = {
            "kind": "ivf",
            "format": "sorted_v2",
            "dim": self.dim,
            "metric": self.metric,
            "dtype": str(self.dtype),
            "nlist": self.nlist,
            "nprobe": self.nprobe,
            "window_quantile": self.window_quantile,
            "balance": self.balance,
            "window": self._window,
            "next_id": self._next_id,
            "n_streamed": self._n_streamed,
            "centroids": np.asarray(self.centroids)
            if self.centroids is not None
            else np.zeros((0, self.dim), np.float32),
        }
        if n:
            state.update({
                "codes": self._host(self._sorted_vecs, n),
                "sqnorms": np.asarray(self._sorted_sq[:n]),
                "sorted_ids": np.asarray(self._sorted_ids[:n]),
                "offsets": np.asarray(self._offsets),
                "lengths": np.asarray(self._lengths),
                "spill_pos": self._spill_pos,
            })
            if self.quantized:
                state["scales"] = np.asarray(self._sorted_scales[:n])
        if self._pending.ntotal:
            p = self._pending
            state.update({
                "pending_codes": self._host(p._buf, p.ntotal),
                "pending_sq": np.asarray(p._sq[: p.ntotal]),
                "pending_rowids": self._pending_rowids,
            })
            if self.quantized:
                state["pending_scales"] = np.asarray(p._scales[: p.ntotal])
        return state

    def _codes_from_host(self, arr: np.ndarray) -> jax.Array:
        if self.dtype == jnp.bfloat16:
            return jnp.asarray(arr, jnp.uint16).view(jnp.bfloat16)
        return jnp.asarray(arr, self.dtype)

    @classmethod
    def from_state_dict(cls, state: dict, **kwargs) -> "IVFFlatIndex":
        def item(v):
            v = np.asarray(v)
            return v.item() if v.ndim == 0 else v

        idx = cls(
            dim=int(item(state["dim"])),
            nlist=int(item(state["nlist"])),
            metric=str(item(state["metric"])),
            nprobe=int(item(state["nprobe"])),
            dtype=str(item(state["dtype"])),
            **kwargs,
        )
        if "window_quantile" in state:
            idx.window_quantile = float(item(state["window_quantile"]))
        if "balance" in state:
            idx.balance = str(item(state["balance"]))
        centroids = np.asarray(state["centroids"])
        if centroids.size:
            idx.centroids = jnp.asarray(centroids)
            idx.is_trained = True

        fmt = str(item(state.get("format", "")))
        if fmt != "sorted_v2":  # legacy: insertion-order vectors -> rebuild
            vectors = np.asarray(state["vectors"])
            if len(vectors):
                idx.build(vectors)
            return idx

        idx._window = int(item(state["window"]))
        idx._next_id = int(item(state["next_id"]))
        idx._n_streamed = int(item(state["n_streamed"]))
        if "codes" in state:
            codes = idx._codes_from_host(np.asarray(state["codes"]))
            n = codes.shape[0]
            pad = idx._window
            dev = idx.device
            idx._sorted_vecs = jax.device_put(
                jnp.pad(codes, ((0, pad), (0, 0))), dev
            )
            if idx.quantized:
                idx._sorted_scales = jax.device_put(
                    jnp.pad(jnp.asarray(state["scales"], jnp.float32),
                            (0, pad)), dev
                )
            idx._sorted_sq = jax.device_put(
                jnp.pad(jnp.asarray(state["sqnorms"], jnp.float32), (0, pad)),
                dev,
            )
            idx._sorted_ids = jax.device_put(
                jnp.pad(jnp.asarray(state["sorted_ids"], jnp.int32), (0, pad),
                        constant_values=-1), dev
            )
            offsets = jnp.asarray(state["offsets"], jnp.int32)
            lengths = jnp.asarray(state["lengths"], jnp.int32)
            idx._offsets = jax.device_put(offsets, dev)
            idx._lengths = jax.device_put(lengths, dev)
            idx._offsets_ext = jax.device_put(
                jnp.concatenate([offsets, jnp.zeros((1,), jnp.int32)]), dev
            )
            idx._lengths_ext = jax.device_put(
                jnp.concatenate([lengths, jnp.zeros((1,), jnp.int32)]), dev
            )
            cdtype = jnp.bfloat16 if idx.quantized else idx.dtype
            idx._cent_store = jax.device_put(
                idx.centroids.astype(cdtype), dev
            )
            idx._cent_sq = jax.device_put(
                dist_ops.sqnorms(idx.centroids), dev
            )
            idx._spill_pos = np.asarray(state["spill_pos"], np.int64)
            idx._n_built = n
        if "pending_codes" in state:
            p_state = {
                "dim": idx.dim, "metric": idx.metric, "dtype": str(idx.dtype),
                "vectors": np.asarray(state["pending_codes"]),
                "sqnorms": np.asarray(state["pending_sq"]),
            }
            if idx.quantized:
                p_state["scales"] = np.asarray(state["pending_scales"])
            elif idx.dtype == jnp.bfloat16:
                p_state["vectors"] = np.asarray(
                    jnp.asarray(state["pending_codes"], jnp.uint16)
                    .view(jnp.bfloat16).astype(jnp.float32)
                )
            idx._pending = FlatIndex.from_state_dict(
                p_state, device=idx.device
            )
            idx._pending_rowids = np.asarray(state["pending_rowids"], np.int32)
            idx._pending_rowids_dev = None
        return idx
