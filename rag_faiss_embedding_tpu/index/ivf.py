"""IVF-Flat index: k-means coarse quantizer + inverted-list scan.

TPU-native analog of ``faiss.IndexIVFFlat`` (BASELINE.md config #3: nlist=4096
build, nprobe sweep, recall parity at equal memory). The reference never gets
past flat indexes; this is the tier for corpora past HBM-comfortable flat
scan — and, with int8 storage, the only tier whose throughput ceiling exceeds
the chip's full-scan matmul roofline (it prunes the matmul itself).

TPU-first design decisions (SURVEY.md §7 "IVF irregularity on TPU"):
- vectors are stored in a BLOCK-PADDED device buffer: every list owns
  exactly ``window`` slots (plus one zeroed sentinel block), dead slots
  carry id -1 — no per-list ragged structures, and a probe of list l is a
  CONTIGUOUS (window, D) block at l*window, so the fused kernel's union
  gather is a large-block gather, not a row gather;
- the default search path is the FUSED batched kernel (ops/ivf_scan.py):
  one coarse matmul for the whole batch, cell-sorted query order, per-chunk
  min-rank-compacted unions, one MXU matmul per chunk, approx top-k, and a
  single whole-batch spill merge — all in ONE jitted program (the per-query
  windowed path below is the semantics reference and small-batch fallback);
- storage may be float32, bfloat16, or int8 (SQ8: symmetric per-row scales,
  EXACT fp32 row norms, int8 MXU matmul — ops/quantize.py rationale), so
  IVF pruning and int8 bandwidth compose;
- metric is "L2" or "IP"; IP uses spherical k-means (normalized centroids,
  dot-product assignment) so the coarse partition matches the probe rule;
- list balance is the window-size lever (the gather pays window slots per
  probed list): ``balance="spill"`` caps the window at a list-length
  quantile and spills overflow to the exactly-scanned pending tier;
  ``balance="reassign"`` runs a capacity-capped assignment (overflow rows
  take their next-nearest list) so windows stay near the mean length;
- streaming adds land in a flat exactly-scanned pending tier (device
  resident) that is merged by ``rebuild()`` — adds never degrade recall
  (BASELINE.md config #5), unlike append-in-place schemes that skew lists.

Returned indices are original insertion positions, so VectorStore's
position->doc-id mapping works unchanged across flat and IVF tiers.
"""

from __future__ import annotations

import functools
import time
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logging import get_logger
from ..ops import distance as dist_ops
from ..ops.ivf_scan import fused_ivf_search
from ..ops.kmeans import assign as kmeans_assign, train_kmeans
from ..ops.quantize import quantize_rows
from . import codec
from .flat import FlatIndex, _round_up

logger = get_logger(__name__)


@functools.lru_cache(maxsize=1)
def _scatter_rows_donated_fn():
    """Jitted row scatter with input donation (lazy: building it eagerly
    would initialize the jax backend at import time). Donation lets XLA
    alias the padded array across chunked-build updates — an eager
    .at[].set holds TWO copies of the buffer, which at a 100M-row build
    is 2 x 9.7 GB for the codes alone. CPU (tests) skips donation (not
    implemented there; small sizes, the copy is fine)."""
    donate = (0,) if jax.devices()[0].platform != "cpu" else ()
    return jax.jit(
        lambda buf, dest, vals: buf.at[dest].set(vals),
        donate_argnums=donate,
    )


def _scatter_rows_donated(buf, dest, vals):
    return _scatter_rows_donated_fn()(buf, dest, vals)


def _device_sync() -> None:
    """Full dispatch round-trip: forces the backend to work through its
    queued operations — including buffer frees, which on the axon tunnel
    lag allocation bursts enough to OOM passes whose steady state fits."""
    jax.block_until_ready(jnp.zeros((8,), jnp.float32) + 1.0)


def probe_scan_math(
    q,            # (Q, D) f32
    sorted_vecs,  # (Npad, D)
    sorted_sq,    # (Npad,)
    sorted_ids,   # (Npad,) int32, -1 for padding
    offsets,      # (nlist,) int32
    lengths,      # (nlist,) int32
    probe_lists,  # (Q, P) int32
    filt=None,    # optional (next_id,) bool, True = searchable
    *,
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
    live = valid & (ids >= 0)
    if filt is not None:
        live = live & filt[jnp.maximum(ids, 0)]
    dist = jnp.where(live, jnp.maximum(dist, 0.0), jnp.inf)

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
        reassign_choices: int = 16,
        union_cap: Optional[int] = None,
        balance_weight: float = 0.0,
        rerank: Optional[bool] = None,
        rerank_depth: Optional[int] = None,
        refine_dtype: str = "int8",
        union_mode: str = "auto",
        backend: str = "auto",
        pallas_cap: int = 2,
        pallas_variant: int = 1,
        pq_m: Optional[int] = None,
        pq_ksub: int = 256,
        pq_compute: str = "bf16",
        pq_opq: bool = False,
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
        # ---- IVF-PQ storage (FAISS IndexIVFPQ analog): lists hold M-byte
        # RESIDUAL codes (x - centroid) instead of dense rows; the fused
        # scan decodes against the coarse stage's q·centroid dots
        # (ops/ivf_scan._chunk_body_pq). Residual codes are ~1 coarse-cell
        # diameter tighter than raw-vector PQ at equal M. The pending/spill
        # tier stays dense bf16 (exactly scanned, tiny).
        self.pq_m = int(pq_m) if pq_m else None
        self.pq_ksub = int(pq_ksub)
        self.pq_compute = pq_compute
        self.pq_codebooks: Optional[jax.Array] = None  # (M, ksub, dsub) f32
        self._pq_cb_store: Optional[jax.Array] = None  # compute-dtype copy
        # OPQ for the residual codec (FAISS OPQMatrix before IndexIVFPQ):
        # residuals encode as (x - c)@R, so subspaces decorrelate WITHIN
        # the coarse cell; the scan rotates queries once per batch
        # (q·r̂ = (q@R)·dec — R orthogonal) and the coarse stage stays
        # unrotated. Gains track residual anisotropy, same as flat OPQ.
        self.pq_opq = bool(pq_opq)
        self.pq_rot: Optional[jax.Array] = None        # (D, D) f32
        if self.pq_m:
            if jnp.dtype(dtype) == jnp.int8:
                raise ValueError("pq_m and int8 storage are exclusive")
            if self.dim % self.pq_m:
                raise ValueError(
                    f"dim {self.dim} not divisible by pq_m={self.pq_m}"
                )
            if pq_compute not in ("bf16", "f32"):
                raise ValueError("pq_compute must be 'bf16' or 'f32'")
            dtype = "uint8"  # list storage = codes; tiers stay bf16 below
        self.dtype = jnp.dtype(dtype)
        self.quantized = self.dtype == jnp.int8
        self.device = device if device is not None else jax.devices()[0]
        self.train_iters = train_iters
        self.seed = seed
        # selection recall_target for the fused path's approx_max_k; int8
        # scores carry quantization error on top (same rationale as flat,
        # docs/PERF.md measured sweep)
        # rt 0.99 + the widened-candidate exact trim: widening to 16 then
        # exact-trimming recovers the approx misses far cheaper than
        # raising the PartialReduce target (0.995 cost ~2x QPS at the
        # chunk+coarse selections combined; ops/ivf_scan._chunk_body)
        self.recall_target = float(
            recall_target if recall_target is not None else 0.99
        )

        self.is_trained = False
        self.centroids: Optional[jax.Array] = None   # (nlist, D) f32
        self._cent_store: Optional[jax.Array] = None  # coarse-scan dtype
        self._cent_sq: Optional[jax.Array] = None
        # block-padded storage: ((nlist+1)*window, ...) with a zeroed
        # sentinel block at index nlist; dead slots carry id -1
        self._sorted_vecs: Optional[jax.Array] = None  # codes if quantized
        self._sorted_scales: Optional[jax.Array] = None
        self._sorted_sq: Optional[jax.Array] = None
        self._sorted_ids: Optional[jax.Array] = None
        self._offsets: Optional[jax.Array] = None   # (nlist,) = l*window
        self._lengths: Optional[jax.Array] = None   # (nlist,) live counts
        self._window = 0
        self._n_built = 0          # live rows in the block-padded tier
        self.ndeleted = 0          # remove_ids tombstones (both tiers)
        # exact pending tier for streaming adds (dense bf16 under PQ)
        self._pending = FlatIndex(
            dim, metric=metric,
            dtype="bfloat16" if self.pq_m else dtype,
            device=self.device,
        )
        # pending tier holds BOTH overflow spill from capped lists and
        # streamed adds; _pending_rowids maps pending positions -> global ids
        # (kept on host for persistence, mirrored on device for the hot path)
        self._pending_rowids = np.zeros((0,), np.int32)
        self._pending_rowids_dev = None
        self._n_spill = 0          # rows in pending from build overflow
        self._n_streamed = 0
        self._next_id = 0
        self.rebuild_threshold = 0.25  # rebuild when STREAMED > 25% of built
        self.rescue_rank_limit = 64  # rescue pass: farthest centroid rank a
        #                              row may be relocated to before it
        #                              falls back to the exact pending tier
        self.window_quantile = 0.98  # cap probe window at this list-length
        #                              quantile; longer lists spill overflow
        self.use_fused = True  # per-query windowed path kept as fallback
        # balance="spill": overflow past the window cap goes to the exact
        #   pending tier (never hurts recall; the tier is scanned by every
        #   query). balance="reassign": overflow rows move to their
        #   next-nearest list with room (balanced_assignment) — smaller
        #   windows and near-zero spill, at the cost that a displaced row is
        #   only found when its host list is probed (the fused kernel's
        #   chunk unions largely recover this).
        self.balance = balance
        self.reassign_choices = int(reassign_choices)
        self.cap_factor = 2.0  # see _reassign_cap
        self.train_sample_per_list = 64  # FAISS max_points_per_centroid
        # fused-kernel union budget (None = ops/ivf_scan.default_union_cap)
        self.union_cap = union_cap
        # capacity-balanced Lloyd weight (0 = classic k-means); the trained
        # per-list bias shapes build-time assignment only, probing stays
        # unbiased (ops/kmeans.train_kmeans rationale)
        self.balance_weight = float(balance_weight)
        self._assign_bias: Optional[jax.Array] = None
        # exact rerank of the quantized scan's candidates against a bf16
        # shadow copy (default ON for int8: the quantized cross term caps
        # recall@10 at ~0.980 at 1M x 384, below the 0.99 gate; the shadow
        # costs 2 bytes/dim extra HBM — disable for memory-tight corpora)
        self.rerank = self.quantized if rerank is None else bool(rerank)
        # PQ refine (FAISS IndexRefine analog): rerank=True with pq_m keeps
        # an int8 (default) or bf16 shadow of the full rows and re-scores
        # the ADC scan's top rerank_depth candidates exactly. The ADC
        # ranking is codec-bound (docs/PERF.md "PQ on TPU": recall@10 ~0.32
        # at 10M while recall@1 hits 0.97 — coverage is fine, near-tied
        # neighbors scramble); an int8 shadow costs D+8 B/row on top of the
        # M B/row codes (3.9 GB at 10M x 384 — still 2x under dense bf16)
        # and restores int8-tier recall. OFF by default: pure PQ remains
        # the max-capacity tier.
        if refine_dtype not in ("int8", "bfloat16", "float32"):
            raise ValueError(f"bad refine_dtype {refine_dtype!r}")
        self.refine_dtype = refine_dtype
        # ADC candidate ranking needs a deeper rerank pool than the int8
        # tier's (the scramble the refine fixes IS the candidate order)
        self.rerank_depth = int(
            rerank_depth if rerank_depth is not None
            else (64 if (self.pq_m and self.rerank) else 16)
        )
        # "minrank": per-query probe sets compacted with per-query rank
        #   guarantees (the semantically-safe default for small indexes);
        # "chunkmax": chunk-aggregate list ranking (the large-nlist fast
        #   path; ops/ivf_scan rationale). "auto" = chunkmax past 2048
        #   lists.
        if union_mode not in ("auto", "minrank", "chunkmax"):
            raise ValueError(f"bad union_mode {union_mode!r}")
        self.union_mode = union_mode
        # query chunk override (None = ops/ivf_scan.pick_query_chunk)
        self.query_chunk: Optional[int] = None
        # rerank/refine shadow: bf16 rows (int8 storage) or int8/bf16 rows
        # (PQ storage; scales+exact norms ride along for int8)
        self._sorted_shadow: Optional[jax.Array] = None
        self._sorted_shadow_scales: Optional[jax.Array] = None
        self._sorted_shadow_sq: Optional[jax.Array] = None
        # PQ refine shadow is stored COMPACT ((n_rows, D), any order) with
        # this (n_slots,) int32 slot->row map (-1 = dead slot): the block-
        # padded layout pays slots/rows x the dense size for a D-wide
        # array — 17.7 GB instead of 7.7 GB at 10M x 384, an OOM on a
        # 16 GB chip. int8-dense shadows stay slot-laid (D bytes/row at
        # ~2x padding is affordable) and keep this None.
        self._shadow_pos: Optional[jax.Array] = None
        # chunk-stage backend: "auto" dispatches the Pallas fused union-scan
        # kernel (ops/pallas_ivf.py) when eligible (TPU, full-precision
        # storage, 128-aligned shapes), else the XLA chunk path
        if backend not in ("auto", "xla", "pallas"):
            raise ValueError(f"bad backend {backend!r}")
        self.backend = backend
        self.pallas_cap = int(pallas_cap)
        # Pallas union-scan kernel variant. 1 (default) is the r03-proven
        # kernel behind every resolved BENCH headline. 2 (premasked-sqnorm
        # aux carrier, in-kernel top-k) is EXPERIMENTAL: it passes CPU
        # interpret-mode parity tests but has never produced a timed number
        # on the real TPU backend — its first scan-wrapped execution dies
        # with a Mosaic INVALID_ARGUMENT and poisons the client process
        # (BENCH_r04 ivf_sweep["pallas2_np16"]). Ship what you bench:
        # opt into 2 only on hardware where you have verified it runs.
        self.pallas_variant = int(pallas_variant)
        # stage timings of the last train/build (profiling; see
        # benchmarks/build_profile.py)
        self.build_stats: dict = {}

    # ------------------------------------------------------------- building
    @property
    def ntotal(self) -> int:
        return self._next_id

    @property
    def nlive(self) -> int:
        """Rows that remain searchable (``ntotal`` minus tombstones)."""
        return self._n_built + self._pending.ntotal - self.ndeleted

    def remove_ids(self, ids: np.ndarray | jax.Array) -> int:
        """Tombstone rows by original insertion id (``faiss.Index.remove_ids``
        analog; reference never exposes removal — ``faiss_store.py`` only
        resets). A removed row's block slot gets id -1, which every search
        path already masks (fused XLA chunk scan, Pallas union kernel, the
        windowed reference path, and the spill merge — same mechanism as
        block padding); pending-tier rows are tombstoned in the flat tier
        AND their global rowid map entry is cleared. ``state_dict`` persists
        only live rows, so save/load doubles as compaction; ``rebuild()``
        likewise drops tombstones (``vectors()`` collects live rows only).
        Returns the number of rows newly removed."""
        del_ids = np.unique(np.asarray(ids, np.int64).ravel())
        del_ids = del_ids[(del_ids >= 0) & (del_ids < self._next_id)]
        if not len(del_ids):
            return 0
        newly = 0
        if self._n_built:
            ids_np = np.asarray(self._sorted_ids)
            pos = np.nonzero(np.isin(ids_np, del_ids))[0]
            if len(pos):
                self._sorted_ids = self._sorted_ids.at[
                    jnp.asarray(pos, jnp.int32)
                ].set(-1)
                newly += int(len(pos))
        if self._pending.ntotal:
            ppos = np.nonzero(np.isin(self._pending_rowids, del_ids))[0]
            if len(ppos):
                newly += self._pending.remove_ids(ppos)
                self._pending_rowids[ppos] = -1
                self._pending_rowids_dev = None
        self.ndeleted += newly
        logger.debug("tombstoned %d rows (%d live)", newly, self.nlive)
        return newly

    def train(self, vectors: np.ndarray | jax.Array) -> None:
        vecs = jnp.asarray(vectors)
        nlist = min(self.nlist, vecs.shape[0])
        if nlist < self.nlist:
            logger.warning("reducing nlist %d -> %d (few train vectors)",
                           self.nlist, nlist)
            self.nlist = nlist
        # FAISS-style training subsample (max_points_per_centroid): Lloyd
        # assignment passes are O(n_train * nlist * D) and dominate the
        # build; 64 points per centroid is plenty to place centroids, the
        # full corpus is re-assigned once at build time
        max_train = self.train_sample_per_list * self.nlist
        if vecs.shape[0] > max_train:
            key = jax.random.PRNGKey(self.seed ^ 0x5EED)
            sel = jax.random.permutation(key, vecs.shape[0])[:max_train]
            train_vecs = vecs[sel]
            logger.debug("k-means training subsample: %d of %d rows",
                         max_train, vecs.shape[0])
        else:
            train_vecs = vecs
        kstats: dict = {}
        self.centroids, _, bias = train_kmeans(
            train_vecs, self.nlist, n_iters=self.train_iters,
            seed=self.seed, spherical=(self.metric == "IP"),
            balance_weight=self.balance_weight, return_bias=True,
            stats=kstats,
        )
        self._assign_bias = bias if self.balance_weight else None
        t0 = time.perf_counter()
        if self.nlist >= 64:
            # relabel lists spatially so the fused kernel's cell-sorted
            # query chunks share probe lists (ops/kmeans.spatial_order)
            from ..ops.kmeans import spatial_order

            order = jnp.asarray(spatial_order(self.centroids, seed=self.seed))
            self.centroids = self.centroids[order]
            if self._assign_bias is not None:
                self._assign_bias = self._assign_bias[order]
        kstats["relabel_s"] = time.perf_counter() - t0
        self.build_stats["train"] = kstats
        self.is_trained = True

    def _pq_encode_rows(
        self, rows_f32: jax.Array, lists: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """Residual-encode rows against their assigned list centroids;
        returns ((n, M) uint8 codes, (n,) f32 EXACT ||c + r̂||² norms) —
        the ADC identity needs reconstruction norms, computed chunked so
        the dense decode never materializes corpus-sized intermediates."""
        from ..ops import pq as pq_ops

        if self.pq_codebooks is None:
            cl_all = jnp.minimum(lists, self.nlist - 1)
            self._train_pq_codec(rows_f32 - self.centroids[cl_all])
        codes_parts, sq_parts = [], []
        chunk = 131072
        for start in range(0, int(rows_f32.shape[0]), chunk):
            # per-sub-chunk residuals: full-chunk cents+resid temporaries
            # are 3 GB at a 1M chunk — with the 7.7 GB refine shadow
            # resident that overflowed the 16 GB chip (first r05 10M run)
            cl = jnp.minimum(lists[start : start + chunk], self.nlist - 1)
            cents = self.centroids[cl]
            rc = rows_f32[start : start + chunk] - cents
            if self.pq_rot is not None:
                rc = rc @ self.pq_rot
            cc, _ = pq_ops.pq_encode(self.pq_codebooks, rc)
            rec = pq_ops.pq_decode(self.pq_codebooks, cc)
            if self.pq_rot is not None:
                rec = rec @ self.pq_rot.T  # back to the original space
            sq_parts.append(dist_ops.sqnorms(rec + cents))
            codes_parts.append(cc)
        return jnp.concatenate(codes_parts), jnp.concatenate(sq_parts)

    def _train_pq_codec(self, resid_sample: jax.Array) -> None:
        """Train the residual codebooks (and the OPQ rotation when
        ``pq_opq``) on a residual sample; invalidates cached copies."""
        from ..ops import pq as pq_ops

        if self.pq_opq:
            rot, cb = pq_ops.train_opq(
                resid_sample, self.pq_m, ksub=self.pq_ksub,
                n_iters=self.train_iters, seed=self.seed,
            )
            self.pq_rot = jax.device_put(rot, self.device)
        else:
            cb = pq_ops.train_pq(
                resid_sample, self.pq_m, ksub=self.pq_ksub,
                n_iters=self.train_iters, seed=self.seed,
            )
        self.pq_codebooks = jax.device_put(cb, self.device)
        self._pq_cb_store = None
        self._pq_w_cache = None

    def _refine_rows(
        self, rows_f32: jax.Array, exact_sq: jax.Array
    ) -> Tuple[jax.Array, Optional[jax.Array], jax.Array]:
        """Shadow rows for the PQ refine stage: int8 codes + per-row scales
        (``refine_dtype='int8'``), bf16, or f32 rows. Exact
        pre-quantization norms ride along for persistence/debug, but the
        rerank scores with the dequantized row's OWN norm (self-consistent
        geometry — see ops/ivf_scan._chunk_body_pq)."""
        if self.refine_dtype == "int8":
            codes, scales = quantize_rows(rows_f32)
            return codes, scales, exact_sq
        if self.refine_dtype == "float32":
            return rows_f32, None, exact_sq
        return rows_f32.astype(jnp.bfloat16), None, exact_sq

    def _pq_shadow(self) -> Optional[Tuple[jax.Array, ...]]:
        """Refine-shadow 4-tuple (codes, scales|None, sq, slot_to_row) for
        the fused scan, or None. Codes are COMPACT (n_rows, D); the map
        routes block slots to shadow rows (see ``_shadow_pos``)."""
        if self._sorted_shadow is None or not self.pq_m:
            return None
        return (self._sorted_shadow, self._sorted_shadow_scales,
                self._sorted_shadow_sq, self._shadow_pos)

    def _pq_w(self) -> Optional[jax.Array]:
        """Grouped block-diagonal codebook for the Pallas decode kernel
        (ops/pallas_pq.py), cached on device; None when the kernel is
        ineligible (then the XLA gather decode runs)."""
        if self.backend == "xla":
            return None
        from ..ops.pallas_pq import decode_eligible, grouped_codebook, \
            pick_group

        dsub = self.dim // self.pq_m
        if not decode_eligible(
            self.device.platform, self.pq_m, self.pq_ksub, dsub,
            self._window or 128, interpret=self.backend == "pallas",
        ):
            return None
        if getattr(self, "_pq_w_cache", None) is None:
            self._pq_w_cache = jax.device_put(
                grouped_codebook(self.pq_codebooks,
                                 pick_group(self.pq_m, dsub)),
                self.device,
            )
        return self._pq_w_cache

    def _pq_cb_compute(self) -> jax.Array:
        """Codebooks in the scan's compute dtype (cached device copy)."""
        if self._pq_cb_store is None:
            dt = jnp.bfloat16 if self.pq_compute == "bf16" else jnp.float32
            self._pq_cb_store = jax.device_put(
                self.pq_codebooks.astype(dt), self.device
            )
        return self._pq_cb_store

    def _rescue_exhausted(
        self,
        vecs_f32: jax.Array,
        spill_rows: np.ndarray,
        assign_np: np.ndarray,
        cap: int,
    ) -> np.ndarray:
        """Place rows that exhausted every greedy choice into the nearest
        list with remaining capacity (host greedy over a tiny (S, nlist)
        distance matrix computed on device). Mutates and returns
        ``assign_np``. A row whose nearest OPEN list sits beyond
        ``rescue_rank_limit`` in its sorted centroid order stays -1 and
        falls back to the pending tier's exact scan — a rescue into a list
        no realistic nprobe probe set reaches would make the row silently
        unfindable (ADVICE r04)."""
        rem = cap - np.bincount(
            assign_np[assign_np >= 0], minlength=self.nlist
        )
        sub = vecs_f32[jnp.asarray(spill_rows)]
        dots = sub @ self.centroids.T
        if self.metric == "IP":
            d = -dots
        else:
            d = jnp.sum(self.centroids ** 2, axis=-1)[None, :] - 2.0 * dots
        d = np.asarray(jax.device_get(d))
        max_rank = 0
        limit = min(self.rescue_rank_limit, self.nlist)
        for i, r in enumerate(spill_rows):
            order = np.argsort(d[i])[:limit]
            for rank, lst in enumerate(order):
                if rem[lst] > 0:
                    assign_np[r] = int(lst)
                    rem[lst] -= 1
                    max_rank = max(max_rank, rank)
                    break
        # observability (ADVICE r04): a rescued row is only findable by
        # queries whose nprobe probe set reaches its (possibly distant)
        # list — record how many rows were rescued and how far the worst
        # one moved, so the bench artifact / build logs can expose skew
        # instead of silently reporting spill_rows=0.
        self.build_stats["rescued_rows"] = int(len(spill_rows))
        self.build_stats["rescue_max_centroid_rank"] = int(max_rank)
        return assign_np

    def _reassign_cap(self, mean_len: float) -> int:
        """Capacity per list for balance='reassign': ``cap_factor`` x the
        mean length (rounded to 128). 2x keeps total capacity ~2x N, so the
        greedy multi-choice assignment almost never exhausts its choices —
        a cap AT the mean (zero headroom) strands ~40% of rows in the exact
        tier, and 1.5x still stranded dense regions at 1M x 4096 before
        the donor-split training flattened the head of the distribution.
        Smaller factors shrink the probe window (gather bytes per list) at
        the cost of spill."""
        return int(_round_up(max(128, int(mean_len * self.cap_factor)), 128))

    def build(self, vectors: np.ndarray | jax.Array,
              row_ids: Optional[np.ndarray] = None) -> None:
        """Train (if needed) and populate the block-padded inverted lists.

        The entire build stays on device — assignment (point-chunked),
        argsort, slot scatter (int32 scalars), one block gather — with one
        tiny lengths sync for the window decision.
        """
        t_start = time.perf_counter()
        vecs_f32 = jnp.asarray(vectors, jnp.float32)
        n = vecs_f32.shape[0]
        if not self.is_trained:
            self.train(vecs_f32)
        bstats = self.build_stats
        bstats["train_s"] = time.perf_counter() - t_start
        t0 = time.perf_counter()
        nlist = self.nlist
        if self.balance == "reassign":
            # capacity-capped assignment: overflow rows fall back to their
            # next-nearest list, keeping every window small (the fused scan
            # pays window slots per probed list)
            from ..ops.kmeans import assign_topk

            choices, cvals = assign_topk(
                vecs_f32, self.centroids, self.reassign_choices,
                metric=self.metric, bias=self._assign_bias,
            )
            jax.block_until_ready((choices, cvals))
            bstats["assign_s"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            choices_np = np.asarray(choices)
            pref = np.asarray(cvals)
            bstats["fetch_s"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            if self.metric == "IP":
                pref = -pref  # lexsort wants ascending preference
            cap = self._reassign_cap(n / nlist)
            assign_np, spill_rows = balanced_assignment(
                choices_np, pref, nlist, cap
            )
            if len(spill_rows):
                # Rescue pass (VERDICT r03 #9: the r03 headline build left
                # 38 rows spilled): total capacity is cap_factor*N, so a
                # placement always exists — give each exhausted row the
                # nearest list that still has room instead of spilling it
                # to the pending tier. 38/1M rows is recall-invisible, but
                # zero spill removes the pending-tier exact scan from EVERY
                # query's hot path.
                assign_np = self._rescue_exhausted(
                    vecs_f32, spill_rows, assign_np, cap)
                still = spill_rows[assign_np[spill_rows] < 0]
                logger.info(
                    "balanced build: %d rows exhausted %d choices (cap %d); "
                    "rescued %d into open lists, %d spilled",
                    len(spill_rows), self.reassign_choices, cap,
                    len(spill_rows) - len(still), len(still),
                )
            # rows that exhausted every choice -> sentinel list (spill)
            assignments = jnp.asarray(
                np.where(assign_np >= 0, assign_np, nlist), jnp.int32
            )
            lengths_np = np.bincount(
                assign_np[assign_np >= 0], minlength=nlist
            ).astype(np.int64)
            window = int(_round_up(max(int(lengths_np.max()), 1), 128))
            bstats["balance_s"] = time.perf_counter() - t0
        else:
            # point-chunked assignment: a full (N, nlist) score matrix is
            # 16 GB at 1M x 4096
            assignments, _ = kmeans_assign(vecs_f32, self.centroids,
                                           metric=self.metric,
                                           bias=self._assign_bias)
            assignments = assignments.astype(jnp.int32)
            bstats["assign_s"] = time.perf_counter() - t0
            t0 = time.perf_counter()
            lengths_np = np.asarray(
                jnp.bincount(assignments, length=nlist)
            ).astype(np.int64)
            max_len = max(int(lengths_np.max()), 1)
            # Cap the probe window at a list-length quantile: k-means skew
            # makes the longest list ~8x the mean, and the fixed-window
            # gather pays for the LONGEST list on every probe. Rows past the
            # cap spill into the exactly-scanned pending tier.
            cap = int(_round_up(
                max(128, int(np.quantile(lengths_np, self.window_quantile))),
                128,
            ))
            window = cap if cap < max_len else int(_round_up(max_len, 128))

        # ---- block-padded scatter (device): every list owns `window` slots
        t0 = time.perf_counter()
        order = jnp.argsort(assignments, stable=True)
        a_sorted = assignments[order]
        sorted_f32 = vecs_f32[order]
        if row_ids is None:
            sorted_ids = order.astype(jnp.int32)
        else:
            sorted_ids = jnp.asarray(row_ids, jnp.int32)[order]

        # per-row rank within its list (positions are contiguous after sort)
        full_offsets = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(
                jnp.asarray(np.r_[lengths_np, 0], np.int32)
            ),
        ])  # (nlist+2,): sentinel rows start at n_assigned
        rank = jnp.arange(n, dtype=jnp.int32) - full_offsets[a_sorted]
        keep = (rank < window) & (a_sorted < nlist)
        n_slots = (nlist + 1) * window
        dest = jnp.where(keep, a_sorted * window + rank, nlist * window)
        src = jnp.full((n_slots,), n, jnp.int32).at[dest].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        src = src.at[nlist * window:].set(n)  # wipe the dump/sentinel block

        sorted_sq = dist_ops.sqnorms(sorted_f32)  # exact, pre-quantization
        exact_sq = sorted_sq  # PQ overwrites sorted_sq with ||c + r̂||²
        if self.pq_m:
            sorted_codes, sorted_sq = self._pq_encode_rows(
                sorted_f32, a_sorted
            )
            sorted_scales = None
        elif self.quantized:
            sorted_codes, sorted_scales = quantize_rows(sorted_f32)
        else:
            sorted_codes = sorted_f32.astype(self.dtype)
            sorted_scales = None
        zrow = jnp.zeros((1, sorted_codes.shape[1]), sorted_codes.dtype)
        padded_codes = jnp.concatenate([sorted_codes, zrow])[src]
        padded_sq = jnp.concatenate([sorted_sq, jnp.zeros((1,))])[src]
        padded_ids = jnp.concatenate(
            [sorted_ids, jnp.full((1,), -1, jnp.int32)]
        )[src]
        padded_scales = (
            jnp.concatenate([sorted_scales, jnp.zeros((1,))])[src]
            if sorted_scales is not None else None
        )
        padded_shadow = padded_sh_scales = padded_sh_sq = None
        shadow_pos = None
        if self.quantized and self.rerank:
            padded_shadow = jnp.concatenate(
                [sorted_f32.astype(jnp.bfloat16),
                 jnp.zeros((1, self.dim), jnp.bfloat16)]
            )[src]
        elif self.pq_m and self.rerank:
            # COMPACT shadow (sorted order) + slot->row map: the D-wide
            # shadow must not pay the block-padding overhead (see
            # ``_shadow_pos``); spilled rows keep shadow entries harmlessly
            # (the pending tier scores them exactly and never gathers here)
            sh_codes, sh_scales, sh_sq = self._refine_rows(
                sorted_f32, exact_sq
            )
            padded_shadow = sh_codes
            padded_sh_scales = sh_scales
            padded_sh_sq = sh_sq
            shadow_pos = jnp.where(src < n, src, -1).astype(jnp.int32)

        # ---- spill rows (rank >= window, or sentinel list) -> exact tier
        jax.block_until_ready(padded_codes)
        bstats["scatter_s"] = time.perf_counter() - t0
        t0 = time.perf_counter()
        self._pending.reset()
        self._pending_rowids = np.zeros((0,), np.int32)
        self._pending_rowids_dev = None
        self._n_streamed = 0
        keep_np = np.asarray(keep)
        n_spill = int((~keep_np).sum())
        self._n_spill = n_spill
        if n_spill:
            pos_dev = jnp.asarray(np.nonzero(~keep_np)[0])
            self._pending.add(sorted_f32[pos_dev])
            self._pending_rowids = np.asarray(sorted_ids[pos_dev])
            self._pending_rowids_dev = None
            if self.balance != "reassign":
                logger.info(
                    "capped IVF window at %d (max list %d): %d rows spilled "
                    "to the exact tier",
                    window, int(lengths_np.max()), n_spill,
                )

        lengths = jnp.minimum(
            jnp.asarray(lengths_np, jnp.int32), window
        )
        dev = self.device
        self._sorted_vecs = jax.device_put(padded_codes, dev)
        self._sorted_scales = (
            jax.device_put(padded_scales, dev)
            if padded_scales is not None else None
        )
        self._sorted_sq = jax.device_put(padded_sq, dev)
        self._sorted_ids = jax.device_put(padded_ids, dev)
        self._sorted_shadow = (
            jax.device_put(padded_shadow, dev)
            if padded_shadow is not None else None
        )
        self._sorted_shadow_scales = (
            jax.device_put(padded_sh_scales, dev)
            if padded_sh_scales is not None else None
        )
        self._sorted_shadow_sq = (
            jax.device_put(padded_sh_sq, dev)
            if padded_sh_sq is not None else None
        )
        self._shadow_pos = (
            jax.device_put(shadow_pos, dev)
            if shadow_pos is not None else None
        )
        self._offsets = jax.device_put(
            jnp.arange(nlist, dtype=jnp.int32) * window, dev
        )
        self._lengths = jax.device_put(lengths, dev)
        # coarse-scan centroid copy: storage dtype (bf16 for int8 indexes —
        # the coarse ranking only picks lists, full precision is wasted BW)
        if self.pq_m:
            cdtype = jnp.bfloat16 if self.pq_compute == "bf16" else jnp.float32
        else:
            cdtype = jnp.bfloat16 if self.quantized else self.dtype
        self._cent_store = jax.device_put(
            self.centroids.astype(cdtype), dev
        )
        self._cent_sq = jax.device_put(
            dist_ops.sqnorms(self.centroids), dev
        )
        self._window = window
        self._n_built = n - n_spill
        # explicit row_ids may be sparse (rebuild after remove_ids keeps the
        # surviving rows' original ids, so positions stay stable for the
        # caller's position->doc mapping)
        self._next_id = (
            n if row_ids is None
            else (int(np.max(row_ids)) + 1 if len(row_ids) else 0)
        )
        self.ndeleted = 0  # a (re)build only installs live rows
        bstats["finalize_s"] = time.perf_counter() - t0
        bstats["total_s"] = time.perf_counter() - t_start
        logger.info(
            "built IVF: n=%d nlist=%d window=%d spill=%d",
            n, nlist, window, n_spill,
        )

    def build_chunked(
        self,
        source,
        n: int,
        chunk_size: int = 1 << 20,
        train_rows: Optional[np.ndarray | jax.Array] = None,
    ) -> None:
        """Out-of-HBM build for PQ storage (``pq_m`` set): the corpus is
        CONSUMED in chunks and never materialized — ``source(start, size)``
        returns rows [start, start+size) (host numpy, a device array, or a
        generator regenerating synthetic data). Only the M-byte codes, the
        reconstruction norms, ids and the (small) spill tier ever live in
        HBM — a 10M x 384 corpus builds in ~0.6 GB device memory where the
        dense build needs 15 GB twice over.

        Two passes: (A) assign each chunk to its coarse list; (B) encode
        each chunk (PQ residual codes / SQ8 / dense cast) and scatter into
        the block-padded layout on device. Coarse training uses
        ``train_rows`` when given, else a per-chunk prefix sample (fine for
        unordered corpora; pass an explicit sample for ordered ones).

        ``balance='spill'`` caps the window at a list-length quantile and
        spills overflow to the exact pending tier. ``balance='reassign'``
        runs the 16-choice capacity-capped assignment instead (same
        machinery as the in-HBM build, host-accumulated across chunks):
        the window shrinks from ~2.2-2.7x the mean list length to the
        ``cap_factor`` x mean cap, which is what makes 100M-row corpora
        fit — padding scales resident bytes by window/mean (the first
        100M attempt at quantile padding needed ~13 GB of codes alone).

        Works for every storage dtype whose SLOTS fit on device — PQ
        (M B/row; +D+8 B/row with the refine shadow, ``rerank=True``),
        int8 (D B/row, shadow rerank unsupported: it would double the
        footprint), bf16/f32."""
        if self.quantized and self.rerank:
            raise ValueError(
                "build_chunked int8 requires rerank=False (the bf16 shadow "
                "would triple the resident footprint)"
            )
        t_start = time.perf_counter()
        bstats = self.build_stats
        n_chunks = -(-n // chunk_size)
        nlist = self.nlist

        # ---- coarse training on a bounded sample
        if not self.is_trained:
            if train_rows is None:
                max_train = self.train_sample_per_list * nlist
                per = -(-min(max_train, n) // n_chunks)
                parts = [
                    jnp.asarray(
                        source(i * chunk_size,
                               min(per, n - i * chunk_size)),
                        jnp.float32,
                    )
                    for i in range(n_chunks)
                ]
                train_rows = jnp.concatenate(parts)
            self.train(jnp.asarray(train_rows, jnp.float32))
        bstats["train_s"] = time.perf_counter() - t_start

        # ---- pass A: assignment per chunk
        t0 = time.perf_counter()
        if self.balance == "reassign":
            # 16-choice capacity-capped assignment, host-accumulated:
            # choices+prefs are (n, c) on HOST (12.8 GB at 100M — host RAM,
            # not HBM); the greedy balanced placement then bounds every
            # list at cap_factor x mean, so window (and the padded
            # layout's resident bytes) shrink ~1.5-1.8x vs quantile
            # capping. Exhausted rows (no choice with room) spill to the
            # exact pending tier like the 'spill' mode.
            from ..ops.kmeans import assign_topk

            c = self.reassign_choices
            # bound the (point_chunk, nlist) score tile at ~4 GB: 65536 x
            # 32768 x 4 B = 8.6 GB rode on top of lagged frees and OOM'd
            # the 100M pass A through the axon tunnel
            pt_chunk = 32768 if nlist > 16384 else 65536
            logger.info("chunked build pass A (balanced, %d choices): "
                        "%d chunks", c, n_chunks)
            choices_np = np.empty((n, c), np.int32)
            prefs_np = np.empty((n, c), np.float32)
            for i in range(n_chunks):
                start = i * chunk_size
                size = min(chunk_size, n - start)
                rows = jnp.asarray(source(start, size), jnp.float32)
                ch, cv = assign_topk(rows, self.centroids, c,
                                     metric=self.metric,
                                     bias=self._assign_bias,
                                     point_chunk=pt_chunk)
                choices_np[start : start + size] = np.asarray(ch, np.int32)
                prefs_np[start : start + size] = np.asarray(cv, np.float32)
                del rows, ch, cv
                # drain the async queue (frees included): allocation
                # bursts outpace tunnel-lagged frees and overflow an
                # otherwise-fitting pass (the r05 10M/100M failure mode)
                _device_sync()
            if self.metric == "IP":
                prefs_np = -prefs_np  # lexsort wants ascending preference
            cap = self._reassign_cap(n / nlist)
            assign_np, spill_rows = balanced_assignment(
                choices_np, prefs_np, nlist, cap
            )
            del choices_np, prefs_np
            if len(spill_rows):
                logger.info(
                    "balanced chunked build: %d/%d rows exhausted %d "
                    "choices (cap %d) -> exact pending tier",
                    len(spill_rows), n, c, cap,
                )
            kept = assign_np >= 0
            lengths_np = np.bincount(
                assign_np[kept], minlength=nlist
            ).astype(np.int64)
            window = int(_round_up(max(int(lengths_np.max()), 1), 128))
        else:
            assign_np = np.empty((n,), np.int32)
            for i in range(n_chunks):
                start = i * chunk_size
                size = min(chunk_size, n - start)
                rows = jnp.asarray(source(start, size), jnp.float32)
                a, _ = kmeans_assign(rows, self.centroids,
                                     metric=self.metric,
                                     bias=self._assign_bias)
                assign_np[start : start + size] = np.asarray(a, np.int32)
                del rows
            lengths_np = np.bincount(
                assign_np, minlength=nlist
            ).astype(np.int64)
            max_len = max(int(lengths_np.max()), 1)
            cap = int(_round_up(
                max(128,
                    int(np.quantile(lengths_np, self.window_quantile))),
                128,
            ))
            window = cap if cap < max_len else int(_round_up(max_len, 128))
        bstats["assign_s"] = time.perf_counter() - t0

        # ---- train PQ codebooks on a residual sample. The sample rows MUST
        # be corpus rows fetched with the exact (start, size) the corpus
        # passes use: a generator-backed source draws DIFFERENT data for a
        # different size, and pairing foreign rows with the corpus's
        # assignments trains codebooks on garbage residuals (measured:
        # recall@10 0.23 instead of ~0.8 at 10M)
        t0 = time.perf_counter()
        if self.pq_m and self.pq_codebooks is None:
            sample = jnp.asarray(
                source(0, min(chunk_size, n)), jnp.float32
            )[:65536]
            a_s = jnp.asarray(
                np.maximum(assign_np[: sample.shape[0]], 0), jnp.int32
            )  # exhausted (-1) rows train against list 0 — harmless noise
            self._train_pq_codec(sample - self.centroids[a_s])

        # ---- pass B: residual encode + DEVICE-side slot scatter (the
        # padded layout is ~0.6 GB at 10M rows — assembling it on host and
        # shipping it through the axon tunnel costs minutes; per-chunk
        # device scatters move only the int32 slot indices)
        n_slots = (nlist + 1) * window
        dev = self.device
        code_width = self.pq_m if self.pq_m else self.dim
        padded_codes = jax.device_put(
            jnp.zeros((n_slots, code_width), self.dtype), dev
        )
        padded_sq = jax.device_put(jnp.zeros((n_slots,), jnp.float32), dev)
        padded_ids = jax.device_put(
            jnp.full((n_slots,), -1, jnp.int32), dev
        )
        padded_scales = (
            jax.device_put(jnp.zeros((n_slots,), jnp.float32), dev)
            if self.quantized else None
        )
        logger.info("chunked build pass B: window %d, %d slots (%.2f GB "
                    "codes)", window, n_slots,
                    n_slots * code_width
                    * jnp.dtype(self.dtype).itemsize / 1e9)
        spill_vecs, spill_ids = [], []
        # rows already placed per list; slot nlist collects the exhausted
        # (-1) rows of balance='reassign' so the rank math stays branchless
        seen = np.zeros((nlist + 1,), np.int64)
        for i in range(n_chunks):
            start = i * chunk_size
            size = min(chunk_size, n - start)
            rows = jnp.asarray(source(start, size), jnp.float32)
            a_raw = assign_np[start : start + size]
            valid = a_raw >= 0
            a = np.where(valid, a_raw, nlist)  # -1 -> sentinel group
            scales = None
            if self.pq_m:
                codes, rec_sq = self._pq_encode_rows(
                    rows, jnp.asarray(np.where(valid, a_raw, 0), jnp.int32)
                )
            elif self.quantized:
                rec_sq = dist_ops.sqnorms(rows)  # exact, pre-quantization
                codes, scales = quantize_rows(rows)
            else:
                rec_sq = dist_ops.sqnorms(rows)
                codes = rows.astype(self.dtype)
            # rank within list = rows placed before + rank inside the chunk
            order = np.argsort(a, kind="stable")
            a_sorted = a[order]
            first = np.r_[True, a_sorted[1:] != a_sorted[:-1]] if size else \
                np.zeros(0, bool)
            group_start = np.maximum.accumulate(
                np.where(first, np.arange(size), 0)
            )
            rank_sorted = np.arange(size) - group_start
            rank = np.empty_like(rank_sorted)
            rank[order] = rank_sorted
            rank = rank + seen[a]
            seen += np.bincount(a, minlength=nlist + 1)
            keep = (rank < window) & valid
            # FULL-chunk donated scatter: not-kept rows all route to the
            # sentinel dump slot (their scattered id is -1, so the slot
            # stays dead whatever codes land there). One fixed shape per
            # chunk size -> one compile; donation updates the padded
            # arrays in place (an eager .at[].set copies the whole codes
            # array per chunk — 2 x 9.7 GB at 100M, instant OOM).
            dump = nlist * window
            dest = jnp.asarray(np.where(
                keep, a.astype(np.int64) * window + rank, dump
            ), jnp.int32)
            ids_chunk = jnp.asarray(np.where(
                keep, np.arange(start, start + size, dtype=np.int64), -1
            ), jnp.int32)
            padded_codes = _scatter_rows_donated(padded_codes, dest, codes)
            padded_sq = _scatter_rows_donated(padded_sq, dest, rec_sq)
            padded_ids = _scatter_rows_donated(padded_ids, dest, ids_chunk)
            if padded_scales is not None:
                padded_scales = _scatter_rows_donated(
                    padded_scales, dest, scales
                )
            if (~keep).any():
                spos = jnp.asarray(np.nonzero(~keep)[0], jnp.int32)
                # HOST accumulation: spilled f32 rows held on device
                # across chunks compound with tunnel-lagged frees (a 2%
                # exhaustion rate at 100M is 3 GB of HBM)
                spill_vecs.append(np.asarray(rows[spos]))
                spill_ids.append(np.arange(start, start + size,
                                           dtype=np.int32)[~keep])
            del rows, codes, rec_sq
            _device_sync()  # keep tunnel-lagged frees from accumulating
        bstats["encode_s"] = time.perf_counter() - t0
        if spill_ids:
            logger.info("chunked build pass B: %d rows spilled to the "
                        "exact pending tier (%.2f GB f32)",
                        sum(len(s) for s in spill_ids),
                        sum(len(s) for s in spill_ids) * self.dim * 4 / 1e9)

        # ---- pass C: refine shadow, AFTER the encode/scatter loop.
        # COMPACT layout, corpus-row order (= the ids build_chunked
        # assigns; the slot->row map is exactly ``padded_ids``), filled
        # chunk-contiguously with DONATED buffers — an eager .at[].set (or
        # an undonated update) holds TWO copies of the 7.7 GB bf16 shadow
        # at 10M x 384 and OOMs the 16 GB chip. Running this as its OWN
        # source pass keeps the shadow residency out of the encode stage's
        # peak (their overlap OOM'd the first two r05 10M attempts: frees
        # through the axon tunnel lag allocation bursts). ALL corpus rows
        # get shadow entries (spilled ones included — harmless, the
        # pending tier never gathers here).
        padded_shadow = padded_sh_scales = padded_sh_sq = None
        if self.pq_m and self.rerank:
            t0 = time.perf_counter()
            jax.block_until_ready(padded_codes)  # drain encode-stage frees
            sh_dt = {"int8": jnp.int8, "float32": jnp.float32}.get(
                self.refine_dtype, jnp.bfloat16)
            padded_shadow = jax.device_put(
                jnp.zeros((n, self.dim), sh_dt), dev
            )
            if self.refine_dtype == "int8":
                padded_sh_scales = jax.device_put(
                    jnp.zeros((n,), jnp.float32), dev
                )
            padded_sh_sq = jax.device_put(
                jnp.zeros((n,), jnp.float32), dev
            )
            donate = (0,) if jax.devices()[0].platform != "cpu" else ()

            @functools.partial(jax.jit, donate_argnums=donate)
            def shadow_fill(buf, upd, start):
                from jax import lax as _lax

                idx0 = (start,) + (jnp.int32(0),) * (buf.ndim - 1)
                return _lax.dynamic_update_slice(buf, upd, idx0)

            for i in range(n_chunks):
                start = i * chunk_size
                size = min(chunk_size, n - start)
                rows = jnp.asarray(source(start, size), jnp.float32)
                sh_codes, sh_scales, sh_sq = self._refine_rows(
                    rows, dist_ops.sqnorms(rows)
                )
                del rows
                s0 = jnp.int32(start)
                padded_shadow = shadow_fill(padded_shadow, sh_codes, s0)
                if padded_sh_scales is not None:
                    padded_sh_scales = shadow_fill(
                        padded_sh_scales, sh_scales, s0
                    )
                padded_sh_sq = shadow_fill(padded_sh_sq, sh_sq, s0)
                del sh_codes, sh_scales, sh_sq
            jax.block_until_ready(padded_shadow)
            bstats["shadow_s"] = time.perf_counter() - t0

        # ---- install
        t0 = time.perf_counter()
        self._sorted_vecs = padded_codes
        self._sorted_sq = padded_sq
        self._sorted_ids = padded_ids
        self._sorted_scales = padded_scales
        self._sorted_shadow = padded_shadow
        self._sorted_shadow_scales = padded_sh_scales
        self._sorted_shadow_sq = padded_sh_sq
        # slot->shadow-row map: ids here ARE corpus positions (aliasing the
        # immutable ids array costs no memory)
        self._shadow_pos = padded_ids if padded_shadow is not None else None
        self._offsets = jax.device_put(
            jnp.arange(nlist, dtype=jnp.int32) * window, dev
        )
        self._lengths = jax.device_put(
            jnp.minimum(jnp.asarray(lengths_np, jnp.int32), window), dev
        )
        if self.pq_m:
            cdtype = (
                jnp.bfloat16 if self.pq_compute == "bf16" else jnp.float32
            )
        else:
            cdtype = jnp.bfloat16 if self.quantized else self.dtype
        self._cent_store = jax.device_put(self.centroids.astype(cdtype), dev)
        self._cent_sq = jax.device_put(dist_ops.sqnorms(self.centroids), dev)
        self._pending.reset()
        self._pending_rowids = np.zeros((0,), np.int32)
        self._pending_rowids_dev = None
        self._n_streamed = 0
        n_spill = int(sum(len(s) for s in spill_ids))
        self._n_spill = n_spill
        if n_spill:
            self._pending.add(jnp.asarray(np.concatenate(spill_vecs)))
            self._pending_rowids = np.concatenate(spill_ids)
            logger.info(
                "chunked build window %d: %d rows spilled to the exact "
                "tier", window, n_spill,
            )
        self._window = window
        self._n_built = n - n_spill
        self._next_id = n
        self.ndeleted = 0
        bstats["finalize_s"] = time.perf_counter() - t0
        bstats["total_s"] = time.perf_counter() - t_start
        logger.info("chunked-built IVF-PQ: n=%d nlist=%d window=%d spill=%d",
                    n, nlist, window, n_spill)

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
        """Merge pending tier into the inverted lists (keeps centroids).
        Surviving rows keep their original ids, so positions stay stable
        across rebuilds even after ``remove_ids``."""
        if self._pending.ntotal == 0 and not self.ndeleted:
            return
        all_vecs, all_ids = self.vectors(return_ids=True)
        logger.info("rebuilding IVF with %d vectors", len(all_vecs))
        self.build(all_vecs, row_ids=all_ids)

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
        filter_mask: Optional[np.ndarray | jax.Array] = None,
    ) -> Tuple[jax.Array, jax.Array]:
        """Probe-limited top-k.

        ``filter_mask``: optional (ntotal,) bool indexed by insertion id,
        True = searchable (FAISS ``IDSelector`` analog). Probing is
        unchanged — filtered rows are masked inside the probed lists and
        in the spill/pending tiers, so distances stay exact over the
        allowed set. Selective filters thin the probed candidate pool;
        raise ``nprobe`` accordingly (standard IVF pre-filter behavior).
        A filter routes the fused path to the XLA backend (the Pallas
        kernel has no filter operand)."""
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
        filt = None
        if filter_mask is not None:
            filt = jnp.asarray(filter_mask, jnp.bool_)
            if filt.shape[0] != self.ntotal:
                raise ValueError(
                    f"filter_mask has {filt.shape[0]} entries, "
                    f"index has {self.ntotal} ids"
                )
            filt = jax.device_put(filt, self.device)
        if self._n_built == 0:
            rowids = self._pending_dev()[3]
            pfilt = None
            if filt is not None:
                # pending tier filters by POSITION: map through the rowid
                # table (cleared entries are -1 = never searchable)
                pr = rowids[: self._pending.ntotal]
                pfilt = (pr >= 0) & filt[jnp.maximum(pr, 0)]
            vals, pidx = self._pending.search(q, k, filter_mask=pfilt)
            pidx = jnp.where(pidx >= 0, rowids[jnp.maximum(pidx, 0)], -1)
            return vals, pidx
        if self.use_fused:
            spill = self._pending_dev() if self._pending.ntotal else None
            backend = self.backend
            if (filt is not None or self.pq_m) and backend == "pallas":
                # the union-scan kernel has no filter/PQ stage; PQ instead
                # uses the Pallas DECODE kernel inside the XLA chunk path
                backend = "xla"
            pq_w = self._pq_w() if self.pq_m else None
            return fused_ivf_search(
                q, self._cent_store, self._cent_sq,
                self._sorted_vecs, self._sorted_scales,
                self._sorted_sq, self._sorted_ids, spill,
                None if self.pq_m else self._sorted_shadow, filt,
                self._pq_cb_compute() if self.pq_m else None, pq_w,
                self._pq_shadow(), self.pq_rot,
                k=k, nprobe=nprobe, window=self._window, metric=self.metric,
                recall_target=self.recall_target,
                union_cap=self.union_cap, rerank_depth=self.rerank_depth,
                qc=self.query_chunk,
                union_mode=self._resolved_union_mode(),
                backend=backend, pallas_cap=self.pallas_cap,
                pallas_variant=self.pallas_variant,
            )
        return self._search_windowed(q, k, nprobe, filt=filt)

    def _resolved_union_mode(self) -> str:
        """'auto' = chunk-aggregate list ranking past 2048 lists (the
        large-nlist fast path), per-query min-rank guarantees below (same
        rule as ShardedIVFIndex)."""
        if self.union_mode != "auto":
            return self.union_mode
        return "chunkmax" if self.nlist > 2048 else "minrank"

    def resolved_dispatch(self, nq: int, k: int = 10) -> dict:
        """The exact fused-path dispatch a defaults call to ``search`` on
        this built index will use: nprobe, union_cap, qc, backend,
        interpret, union_mode, pallas_variant, rerank_depth, recall_target.

        Shares ``ops.ivf_scan.resolve_fused_dispatch`` with
        ``fused_ivf_search`` itself, so what the headline bench times as
        ``library_default_*`` and what a library user gets cannot diverge
        (VERDICT r04 #8); tests/test_ivf_dispatch.py asserts the match."""
        from ..ops.ivf_scan import resolve_fused_dispatch

        if self._sorted_vecs is None:
            raise ValueError("resolved_dispatch needs a built index")
        try:
            platform = next(iter(self._sorted_vecs.devices())).platform
        except Exception:
            platform = jax.devices()[0].platform
        backend = self.backend
        if self.pq_m and backend == "pallas":
            backend = "xla"
        out = resolve_fused_dispatch(
            nq=nq, dim=self.dim, nlist=self.nlist, window=self._window,
            code_bytes=self.dtype.itemsize, quantized=self.quantized,
            has_shadow=self._sorted_shadow is not None and not self.pq_m,
            has_pq=bool(self.pq_m), has_filter=False,
            nprobe=min(self.nprobe, self.nlist), union_cap=self.union_cap,
            qc=self.query_chunk, backend=backend, platform=platform,
        )
        out.update({
            "union_mode": self._resolved_union_mode(),
            "pallas_variant": self.pallas_variant,
            "pallas_cap": self.pallas_cap,
            "rerank_depth": self.rerank_depth,
            "recall_target": self.recall_target,
            "window": self._window,
            "k": k,
        })
        return out

    def _search_windowed(
        self, q: jax.Array, k: int, nprobe: int, filt=None
    ) -> Tuple[jax.Array, jax.Array]:
        """Per-query windowed path (L2, full-precision storage only) — the
        fused kernel's semantics reference; kept for A/B and small batches."""
        if self.quantized or self.pq_m or self.metric != "L2":
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
                self._offsets, self._lengths, probe_lists, filt,
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
                    p_pad[start : start + qc], filt,
                    k=k, window=self._window,
                ))
            dist = jnp.concatenate([p[0] for p in parts])[:nq]
            ids = jnp.concatenate([p[1] for p in parts])[:nq]
        if self._pending.ntotal:
            rowids = self._pending_dev()[3]
            pfilt = None
            if filt is not None:
                pr = rowids[: self._pending.ntotal]
                pfilt = (pr >= 0) & filt[jnp.maximum(pr, 0)]
            pvals, pidx = self._pending.search(q, k, filter_mask=pfilt)
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
        self._sorted_shadow = None
        self._sorted_shadow_scales = None
        self._sorted_shadow_sq = None
        self._shadow_pos = None
        self._offsets = None
        self._lengths = None
        self._window = 0
        self._n_built = 0
        self._next_id = 0
        self._n_spill = 0
        self._n_streamed = 0
        self._pending_rowids = np.zeros((0,), np.int32)
        self._pending_rowids_dev = None
        self._pending.reset()

    def _live_mask(self) -> np.ndarray:
        return np.asarray(self._sorted_ids) >= 0

    def vectors(self, return_ids: bool = False):
        """Live vectors in original insertion order (spilled rows counted
        once, via the pending tier; remove_ids tombstones excluded). int8
        indexes return the dequantized reconstruction (codes survive a
        re-quantization round trip exactly: the amax element maps back to
        ±127). ``return_ids=True`` also returns the rows' original ids
        (sparse after removals)."""
        all_vecs = []
        all_ids = []
        if self._n_built:
            live = self._live_mask()
            pos = jnp.asarray(np.nonzero(live)[0])
            built = self._sorted_vecs[pos]
            if self.pq_m and self._sorted_shadow is not None:
                # the refine shadow is a far better reconstruction than the
                # M-byte codes (int8: ~1e-2 relative error vs PQ's lossy
                # codebook) — rebuild()/persistence keep shadow fidelity.
                # Compact layout: route block slots through the slot->row map
                sp = self._shadow_pos[pos]
                sh = self._sorted_shadow[sp]
                if self._sorted_shadow_scales is not None:
                    from ..ops.quantize import dequantize

                    built = np.asarray(
                        dequantize(sh, self._sorted_shadow_scales[sp])
                    )
                else:
                    built = np.asarray(sh.astype(jnp.float32))
            elif self.pq_m:
                from ..ops import pq as pq_ops

                # reconstruction: centroid of the slot's list + decoded
                # residual (pos // window IS the list id — block layout);
                # OPQ codes live in the rotated basis -> un-rotate
                resid = pq_ops.pq_decode(self.pq_codebooks, built)
                if self.pq_rot is not None:
                    resid = resid @ self.pq_rot.T
                built = np.asarray(
                    resid + self.centroids[pos // self._window]
                )
            elif self.quantized:
                from ..ops.quantize import dequantize

                scales = self._sorted_scales[pos]
                built = np.asarray(dequantize(built, scales))
            else:
                built = np.asarray(built)
            ids = np.asarray(self._sorted_ids)[live]
            all_vecs.append(built.astype(np.float32))
            all_ids.append(ids)
        if self._pending.ntotal:
            plive = self._pending_rowids >= 0  # remove_ids clears the map
            all_vecs.append(self._pending.vectors()[plive])
            all_ids.append(self._pending_rowids[plive])
        if not all_vecs:
            empty = np.zeros((0, self.dim), np.float32)
            return (empty, np.zeros((0,), np.int32)) if return_ids else empty
        vecs = np.concatenate(all_vecs)
        ids = np.concatenate(all_ids)
        order = np.argsort(ids, kind="stable")
        if return_ids:
            return vecs[order], ids[order].astype(np.int32)
        return vecs[order]

    # ---------------------------------------------------------------- io
    @staticmethod
    def _to_host(arr: jax.Array) -> np.ndarray:
        """savez-able numpy view (bf16 -> uint16 bits; shared codec)."""
        return codec.to_host(arr)

    def state_dict(self) -> dict:
        """Exact state, compact: live block rows in list order + lengths
        (format "padded_v3") — reload re-scatters into the block-padded
        layout losslessly for every storage dtype. (Analog of
        ``faiss.write_index`` keeping the inverted lists,
        ``faiss_store.py:83-97``.)"""
        state = {
            "kind": "ivf",
            "format": "padded_v3",
            "dim": self.dim,
            "metric": self.metric,
            "dtype": str(self.dtype),
            "nlist": self.nlist,
            "nprobe": self.nprobe,
            "window_quantile": self.window_quantile,
            "balance": self.balance,
            "window": self._window,
            "next_id": self._next_id,
            "rerank_depth": self.rerank_depth,
            "n_streamed": self._n_streamed,
            "n_spill": self._n_spill,
            "centroids": np.asarray(self.centroids)
            if self.centroids is not None
            else np.zeros((0, self.dim), np.float32),
            "assign_bias": np.asarray(self._assign_bias)
            if self._assign_bias is not None
            else np.zeros((0,), np.float32),
        }
        if self.pq_m:
            state.update({
                "pq_m": self.pq_m,
                "pq_ksub": self.pq_ksub,
                "pq_compute": self.pq_compute,
                "pq_codebooks": np.asarray(self.pq_codebooks)
                if self.pq_codebooks is not None
                else np.zeros(
                    (self.pq_m, 0, self.dim // self.pq_m), np.float32
                ),
            })
            if self.pq_rot is not None:
                state["pq_rot"] = np.asarray(self.pq_rot)
        if self._n_built:
            live = self._live_mask()
            pos = jnp.asarray(np.nonzero(live)[0])  # block order
            state.update({
                "codes": self._to_host(self._sorted_vecs[pos]),
                "sqnorms": np.asarray(self._sorted_sq[pos]),
                "sorted_ids": np.asarray(self._sorted_ids[pos]),
                # recount per list from the live mask: remove_ids leaves
                # dead slots mid-list, and reload re-packs live rows
                # contiguously (save/load doubles as compaction)
                "lengths": live[: self.nlist * self._window]
                .reshape(self.nlist, self._window).sum(1).astype(np.int64),
            })
            if self.quantized:
                state["scales"] = np.asarray(self._sorted_scales[pos])
            if self._sorted_shadow is not None:
                # on-disk format is UNCHANGED (block-order rows): compact
                # shadows (PQ, _shadow_pos set) gather through the map,
                # slot-laid shadows (int8 dense) slice directly
                sh_idx = (
                    self._shadow_pos[pos]
                    if self._shadow_pos is not None else pos
                )
                state["shadow"] = self._to_host(self._sorted_shadow[sh_idx])
                if self._sorted_shadow_scales is not None:
                    state["shadow_scales"] = np.asarray(
                        self._sorted_shadow_scales[sh_idx]
                    )
                if self._sorted_shadow_sq is not None:
                    state["shadow_sq"] = np.asarray(
                        self._sorted_shadow_sq[sh_idx]
                    )
                state["refine_dtype"] = self.refine_dtype
        if self._pending.ntotal:
            p = self._pending
            plive = self._pending_rowids >= 0  # drop remove_ids tombstones
            psel = jnp.asarray(np.nonzero(plive)[0], jnp.int32)
            state.update({
                "pending_codes": self._to_host(p._buf[psel]),
                "pending_sq": np.asarray(p._sq[psel]),
                "pending_rowids": self._pending_rowids[plive],
            })
            if self.quantized:
                state["pending_scales"] = np.asarray(p._scales[psel])
        return state

    def _codes_from_host(self, arr: np.ndarray) -> jax.Array:
        return codec.from_host(arr, self.dtype)

    def _install_blocks(
        self,
        codes: jax.Array,        # (n_live, D) live rows in block order
        sq: jax.Array,
        ids: jax.Array,
        scales: Optional[jax.Array],
        lengths_np: np.ndarray,  # (nlist,) live counts (<= window)
        shadow: Optional[jax.Array] = None,
        shadow_scales: Optional[jax.Array] = None,
        shadow_sq: Optional[jax.Array] = None,
    ) -> None:
        """Scatter compact per-list rows into the block-padded layout."""
        nlist, window = self.nlist, self._window
        n_live = int(codes.shape[0])
        listid = np.repeat(np.arange(nlist), lengths_np)
        rank = np.arange(n_live) - np.repeat(
            np.r_[0, np.cumsum(lengths_np)[:-1]], lengths_np
        )
        dest = jnp.asarray(listid * window + rank, jnp.int32)
        n_slots = (nlist + 1) * window
        src = jnp.full((n_slots,), n_live, jnp.int32).at[dest].set(
            jnp.arange(n_live, dtype=jnp.int32)
        )
        dev = self.device
        zrow = jnp.zeros((1, codes.shape[1]), codes.dtype)  # M-wide for PQ
        self._sorted_vecs = jax.device_put(
            jnp.concatenate([codes, zrow])[src], dev
        )
        self._sorted_sq = jax.device_put(
            jnp.concatenate([sq, jnp.zeros((1,))])[src], dev
        )
        self._sorted_ids = jax.device_put(
            jnp.concatenate([ids, jnp.full((1,), -1, jnp.int32)])[src], dev
        )
        self._sorted_scales = (
            jax.device_put(jnp.concatenate([scales, jnp.zeros((1,))])[src],
                           dev)
            if scales is not None else None
        )
        if shadow is not None and self.pq_m:
            # PQ refine shadow stays COMPACT on reload (rows arrive in
            # block order; the map routes slots to them) — re-padding a
            # D-wide array is exactly the 10M OOM this layout avoids
            self._sorted_shadow = jax.device_put(shadow, dev)
            self._sorted_shadow_scales = (
                jax.device_put(shadow_scales, dev)
                if shadow_scales is not None else None
            )
            self._sorted_shadow_sq = (
                jax.device_put(shadow_sq, dev)
                if shadow_sq is not None else None
            )
            self._shadow_pos = jax.device_put(
                jnp.where(src < n_live, src, -1).astype(jnp.int32), dev
            )
        else:
            self._sorted_shadow = (
                jax.device_put(
                    jnp.concatenate(
                        [shadow, jnp.zeros((1, self.dim), shadow.dtype)]
                    )[src], dev
                )
                if shadow is not None else None
            )
            self._sorted_shadow_scales = (
                jax.device_put(
                    jnp.concatenate([shadow_scales, jnp.zeros((1,))])[src],
                    dev
                )
                if shadow_scales is not None else None
            )
            self._sorted_shadow_sq = (
                jax.device_put(
                    jnp.concatenate([shadow_sq, jnp.zeros((1,))])[src], dev
                )
                if shadow_sq is not None else None
            )
            self._shadow_pos = None
        self._offsets = jax.device_put(
            jnp.arange(nlist, dtype=jnp.int32) * window, dev
        )
        self._lengths = jax.device_put(
            jnp.asarray(lengths_np, jnp.int32), dev
        )
        if self.pq_m:
            cdtype = (
                jnp.bfloat16 if self.pq_compute == "bf16" else jnp.float32
            )
        else:
            cdtype = jnp.bfloat16 if self.quantized else self.dtype
        self._cent_store = jax.device_put(
            self.centroids.astype(cdtype), dev
        )
        self._cent_sq = jax.device_put(
            dist_ops.sqnorms(self.centroids), dev
        )
        self._n_built = n_live

    @classmethod
    def from_state_dict(cls, state: dict, **kwargs) -> "IVFFlatIndex":
        def item(v):
            v = np.asarray(v)
            return v.item() if v.ndim == 0 else v

        pq_kwargs = {}
        if "pq_m" in state:
            pq_kwargs = {
                "pq_m": int(item(state["pq_m"])),
                "pq_ksub": int(item(state["pq_ksub"])),
                "pq_compute": str(item(state["pq_compute"])),
            }
        idx = cls(
            dim=int(item(state["dim"])),
            nlist=int(item(state["nlist"])),
            metric=str(item(state["metric"])),
            nprobe=int(item(state["nprobe"])),
            dtype=str(item(state["dtype"])) if "pq_m" not in state
            else "bfloat16",  # __init__ re-derives uint8 from pq_m
            **pq_kwargs,
            **kwargs,
        )
        if "pq_codebooks" in state:
            cb = np.asarray(state["pq_codebooks"])
            if cb.size:
                idx.pq_codebooks = jax.device_put(
                    jnp.asarray(cb, jnp.float32), idx.device
                )
        if "pq_rot" in state:
            idx.pq_opq = True
            idx.pq_rot = jax.device_put(
                jnp.asarray(np.asarray(state["pq_rot"]), jnp.float32),
                idx.device,
            )
        if "window_quantile" in state:
            idx.window_quantile = float(item(state["window_quantile"]))
        if "rerank_depth" in state:
            idx.rerank_depth = int(item(state["rerank_depth"]))
        if "balance" in state:
            idx.balance = str(item(state["balance"]))
        centroids = np.asarray(state["centroids"])
        if centroids.size:
            idx.centroids = jnp.asarray(centroids)
            idx.is_trained = True
        bias = np.asarray(state.get("assign_bias", np.zeros(0)))
        if bias.size:
            idx._assign_bias = jnp.asarray(bias, jnp.float32)

        fmt = str(item(state.get("format", "")))
        if fmt not in ("padded_v3", "sorted_v2"):
            # legacy: insertion-order vectors -> rebuild
            vectors = np.asarray(state["vectors"])
            if len(vectors):
                idx.build(vectors)
            return idx

        idx._window = int(item(state["window"]))
        idx._next_id = int(item(state["next_id"]))
        idx._n_streamed = int(item(state["n_streamed"]))
        idx._n_spill = int(item(state.get("n_spill", 0)))
        if "codes" in state:
            codes = idx._codes_from_host(np.asarray(state["codes"]))
            sq = jnp.asarray(state["sqnorms"], jnp.float32)
            ids = jnp.asarray(state["sorted_ids"], jnp.int32)
            scales = (
                jnp.asarray(state["scales"], jnp.float32)
                if idx.quantized else None
            )
            shadow = shadow_scales = shadow_sq = None
            if "shadow" in state:
                sh_np = np.asarray(state["shadow"])
                # int8 refine shadow saves as int8; bf16 saves as uint16 bits
                sh_dt = jnp.int8 if sh_np.dtype == np.int8 else jnp.bfloat16
                shadow = codec.from_host(sh_np, sh_dt)
                if "shadow_scales" in state:
                    shadow_scales = jnp.asarray(
                        state["shadow_scales"], jnp.float32
                    )
                if "shadow_sq" in state:
                    shadow_sq = jnp.asarray(state["shadow_sq"], jnp.float32)
                if "refine_dtype" in state:
                    idx.refine_dtype = str(item(state["refine_dtype"]))
            idx.rerank = shadow is not None  # no shadow saved -> no rerank
            lengths_np = np.asarray(state["lengths"], np.int64)
            if fmt == "sorted_v2":
                # legacy contiguous layout: offsets are FULL cumulative list
                # starts; live rows per list are the first lengths[l] at
                # offsets[l] (overflow beyond that was spilled separately)
                offsets_np = np.asarray(state["offsets"], np.int64)
                pos = np.concatenate([
                    np.arange(off, off + ln)
                    for off, ln in zip(offsets_np, lengths_np)
                ]).astype(np.int64) if lengths_np.sum() else np.zeros(0, np.int64)
                sel = jnp.asarray(pos)
                codes, sq, ids = codes[sel], sq[sel], ids[sel]
                if scales is not None:
                    scales = scales[sel]
                # shadow arrays are row-parallel with codes; skipping the
                # selector would silently misalign rerank scores
                if shadow is not None:
                    shadow = shadow[sel]
                if shadow_scales is not None:
                    shadow_scales = shadow_scales[sel]
                if shadow_sq is not None:
                    shadow_sq = shadow_sq[sel]
            idx._install_blocks(codes, sq, ids, scales, lengths_np,
                                shadow=shadow, shadow_scales=shadow_scales,
                                shadow_sq=shadow_sq)
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
                    codec.from_host(state["pending_codes"], jnp.bfloat16)
                    .astype(jnp.float32)
                )
            idx._pending = FlatIndex.from_state_dict(
                p_state, device=idx.device
            )
            idx._pending_rowids = np.asarray(state["pending_rowids"], np.int32)
            idx._pending_rowids_dev = None
        return idx
