"""Multi-chip IVF-Flat: shared centroids, row-sharded inverted lists.

Combines BASELINE.md configs #3 and #4: corpora past one chip's
HBM-comfortable flat scan get BOTH the IVF pruning and mesh scale-out.
The reference has no distributed code at all (SURVEY.md §2 parallelism
inventory); its single-device analog is ``faiss.IndexIVFFlat``
(``faiss_store.py:4`` is the C++ engine family being replaced).

Design (TPU-first, single-chip parity with index/ivf.py):
- centroids are trained once on a global sample (ops/kmeans k-means++ +
  Lloyd + spatial relabeling) and replicated to every device;
- each device of the ``db`` mesh axis owns a contiguous row range and holds
  its own BLOCK-PADDED local lists (every list owns exactly ``window``
  slots, dead slots carry id -1 — same layout as the single-chip tier);
  the ENTIRE layout construction — assignment, per-device stable sort,
  per-device slot scatter — happens on device with vectorized
  (n_dev, ...) ops, never round-tripping the corpus;
- the probe window is capped at a list-length quantile (P98 default, same
  knob as the single-chip tier); rows past the cap spill into a per-device
  exactly-scanned tier, so no row is ever lost;
- storage may be float32, bfloat16, or int8 (SQ8 per-row scales with exact
  f32 norms; spill/pending tiers stay bfloat16 — they are tiny);
- streaming adds land in a host-staged pending tier mirrored to the devices
  round-robin (uniform shapes for shard_map) and scanned exactly; a rebuild
  threshold folds them into the lists (BASELINE.md config #5);
- query: under ``shard_map`` each device runs the SAME fused batched kernel
  as the single-chip tier (ops/ivf_scan.fused_ivf_search_math: shared
  coarse, cell-sorted chunks, compacted unions, one MXU matmul per chunk)
  over its local lists, exactly scans its local spill + pending tiers,
  merges locally, and emits a local top-k with GLOBAL row ids; one
  all-gather of (k values, k ids) per query merges across the mesh —
  kilobytes on the ICI, not shards.

Row ids returned are global insertion positions, so VectorStore's
position->doc-id mapping works unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.logging import get_logger
from ..index import codec
from ..index.flat import _round_up
from ..ops import distance as dist_ops
from ..ops.ivf_scan import default_union_cap, fused_ivf_search_math, pick_query_chunk
from ..ops.kmeans import assign as kmeans_assign, spatial_order, train_kmeans
from ..ops.quantize import quantize_rows

logger = get_logger(__name__)


def _tier_scan(q, vecs, sq, ids, count, k, metric="L2", filt=None):
    """Local exact scan over a per-device tier (spill / pending): returns
    (values, global ids) with invalid slots masked to (inf|-inf, -1).
    ``filt`` ((next_id,) bool, True = searchable) masks rows BEFORE
    selection so filtered rows never consume top-k slots."""
    dead = None
    if filt is not None:
        dead = ~((ids >= 0) & filt[jnp.maximum(ids, 0)])
    vals, idx = dist_ops._exact_search_impl(
        q, vecs, k, metric=metric, db_sq=sq,
        n_valid=count.astype(jnp.int32),
        chunk_size=max(1, vecs.shape[0]),
        dead=dead,
    )
    gids = jnp.where(idx >= 0, ids[jnp.maximum(idx, 0)], -1)
    fill = jnp.inf if metric == "L2" else -jnp.inf
    vals = jnp.where(gids >= 0, vals, fill)
    return vals, gids


def _merge_local(parts, k, metric="L2"):
    """Merge (value, gid) candidate sets on the local device (L2 ascending
    distances; IP descending scores)."""
    vals = jnp.concatenate([p[0] for p in parts], axis=1)
    gids = jnp.concatenate([p[1] for p in parts], axis=1)
    scores = jnp.where(
        gids >= 0, -vals if metric == "L2" else vals, dist_ops.NEG_INF
    )
    k_eff = min(k, vals.shape[1])
    best, pos = jax.lax.top_k(scores, k_eff)
    return (
        jnp.take_along_axis(vals, pos, axis=1),
        jnp.take_along_axis(gids, pos, axis=1),
    )


@functools.lru_cache(maxsize=64)
def _build_sharded_fused(
    mesh: Mesh, k: int, window: int, db_axis: str,
    nprobe: int, union_cap: int, qc: int, recall_target: float,
    quantized: bool, has_spill: bool, has_pending: bool,
    union_mode: str = "minrank", metric: str = "L2",
    backend: str = "xla", interpret: bool = False,
    has_filter: bool = False, has_pq: bool = False, has_pq_w: bool = False,
    pallas_variant: int = 1,
):
    n_tiers = has_spill + has_pending

    def kernel(q, cent, cent_sq, codes, scales, sq, ids, *rest):
        rest = list(rest)
        # the filter / PQ codebooks are REPLICATED (global)
        filt = rest.pop(0) if has_filter else None
        pq_cb = rest.pop(0) if has_pq else None
        pq_w = rest.pop(0) if has_pq_w else None
        vals, gids = fused_ivf_search_math(
            q, cent, cent_sq, codes[0], scales[0] if quantized else None,
            sq[0], ids[0], None, filt=filt, pq=pq_cb, pq_w=pq_w,
            k=k, nprobe=nprobe, window=window, metric=metric,
            recall_target=recall_target, union_cap=union_cap, qc=qc,
            union_mode=union_mode,
            backend=backend, interpret=interpret,
            pallas_variant=pallas_variant,
        )
        parts = [(vals, gids)]
        while rest:
            t_vecs, t_sq, t_ids, t_count = rest[:4]
            rest = rest[4:]
            parts.append(_tier_scan(
                q, t_vecs[0], t_sq[0], t_ids[0], t_count[0], k, metric,
                filt=filt,
            ))
        vals, gids = (
            _merge_local(parts, k, metric) if len(parts) > 1 else parts[0]
        )

        all_vals = jax.lax.all_gather(vals, db_axis, axis=1, tiled=True)
        all_ids = jax.lax.all_gather(gids, db_axis, axis=1, tiled=True)
        scores = jnp.where(
            all_ids >= 0, -all_vals if metric == "L2" else all_vals,
            dist_ops.NEG_INF,
        )
        k_out = min(k, all_vals.shape[1])
        best, pos = jax.lax.top_k(scores, k_out)
        out_v = jnp.take_along_axis(all_vals, pos, axis=1)
        out_i = jnp.take_along_axis(all_ids, pos, axis=1)
        out_v = jnp.where(
            out_i >= 0, out_v, jnp.inf if metric == "L2" else -jnp.inf
        )
        return out_v, out_i

    scale_spec = P(db_axis)
    filt_spec = (P(),) if has_filter else ()
    filt_spec = filt_spec + (P(),) * (has_pq + has_pq_w)
    tier_specs = (P(db_axis),) * (4 * n_tiers)
    mapped = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(db_axis), scale_spec, P(db_axis),
                  P(db_axis)) + filt_spec + tier_specs,
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


class ShardedIVFIndex:
    """IVF-Flat sharded over a device mesh (build once, stream, query many)."""

    def __init__(
        self,
        dim: int,
        mesh: Mesh,
        nlist: int = 1024,
        nprobe: int = 8,
        metric: str = "L2",
        dtype: str | jnp.dtype = "float32",
        db_axis: str = "db",
        train_iters: int = 20,
        seed: int = 0,
        union_cap: Optional[int] = None,
        backend: str = "auto",
        pq_m: Optional[int] = None,
        pq_ksub: int = 256,
        pq_compute: str = "bf16",
    ):
        if metric not in ("L2", "IP"):
            raise ValueError(f"metric must be 'L2' or 'IP', got {metric!r}")
        self.dim = int(dim)
        self.mesh = mesh
        self.nlist = int(nlist)
        self.nprobe = int(nprobe)
        self.metric = metric
        # ---- sharded IVF-PQ (multi-chip memory tier): per-device lists
        # hold M-byte residual codes; same design as the single-chip
        # IVFFlatIndex(pq_m=...) — see index/ivf.py rationale
        self.pq_m = int(pq_m) if pq_m else None
        self.pq_ksub = int(pq_ksub)
        self.pq_compute = pq_compute
        self.pq_codebooks: Optional[jax.Array] = None
        self._pq_w_cache: Optional[jax.Array] = None
        if self.pq_m:
            if jnp.dtype(dtype) == jnp.int8:
                raise ValueError("pq_m and int8 storage are exclusive")
            if self.dim % self.pq_m:
                raise ValueError(
                    f"dim {self.dim} not divisible by pq_m={self.pq_m}"
                )
            dtype = "uint8"
        self.dtype = jnp.dtype(dtype)
        self.quantized = self.dtype == jnp.int8
        # spill/pending tiers are tiny; int8/PQ storage keeps them in bf16
        self._tier_dtype = (
            jnp.bfloat16 if (self.quantized or self.pq_m) else self.dtype
        )
        self.db_axis = db_axis
        self.n_dev = mesh.shape[db_axis]
        self.train_iters = train_iters
        self.seed = seed
        self.union_cap = union_cap
        # per-device chunk-stage backend: "auto" uses the Pallas union-scan
        # kernel when eligible (real TPU mesh, full-precision storage,
        # 128-aligned shapes — single-chip parity with index/ivf.py);
        # "pallas" forces it (interpret mode off-TPU, for tests)
        if backend not in ("auto", "xla", "pallas"):
            raise ValueError(f"bad backend {backend!r}")
        self.backend = backend
        self.recall_target = 0.995 if self.quantized else 0.99
        self.window_quantile = 0.98  # single-chip parity (index/ivf.py)
        self.rebuild_threshold = 0.25
        self.centroids: Optional[jax.Array] = None
        self._cent_sq: Optional[jax.Array] = None
        self._sharding = NamedSharding(mesh, P(db_axis))
        self._replicated = NamedSharding(mesh, P())
        self._clear_state()

    def _clear_state(self) -> None:
        # block-padded per-device lists: every list owns `window` slots
        self._vecs = None          # (n_dev, (nlist+1)*window, D) storage
        self._scales = None        # (n_dev, (nlist+1)*window) f32 (int8)
        self._sq = None            # (n_dev, (nlist+1)*window) f32
        self._ids = None           # (n_dev, (nlist+1)*window) int32, -1 dead
        self._spill = None         # None | (vecs, sq, ids, counts) sharded
        self._window = 0
        self._n_built = 0
        self._next_id = 0
        self.ndeleted = 0
        # streaming pending tier: staged on host, mirrored round-robin
        self._stream_vecs = np.zeros((0, self.dim), np.float32)
        self._stream_ids = np.zeros((0,), np.int32)
        self._pending_dev = None   # None | (vecs, sq, ids, counts) sharded

    @property
    def ntotal(self) -> int:
        return self._next_id

    # ------------------------------------------------------------- building
    def _pq_encode_rows(self, rows_f32, lists):
        """Residual-encode rows against their list centroids; returns
        ((n, M) uint8, (n,) exact ||c + r̂||²) — single-chip parity with
        index/ivf.py:_pq_encode_rows (chunked, no corpus-sized decode)."""
        from ..ops import pq as pq_ops

        cents = self.centroids[lists]
        resid = rows_f32.astype(jnp.float32) - cents
        if self.pq_codebooks is None:
            self.pq_codebooks = pq_ops.train_pq(
                resid, self.pq_m, ksub=self.pq_ksub,
                n_iters=self.train_iters, seed=self.seed,
            )
            self._pq_w_cache = None
        codes_parts, sq_parts = [], []
        chunk = 131072
        for start in range(0, int(rows_f32.shape[0]), chunk):
            rc = resid[start : start + chunk]
            cc, _ = pq_ops.pq_encode(self.pq_codebooks, rc)
            rec = pq_ops.pq_decode(self.pq_codebooks, cc)
            sq_parts.append(dist_ops.sqnorms(
                rec + cents[start : start + chunk]
            ))
            codes_parts.append(cc)
        return jnp.concatenate(codes_parts), jnp.concatenate(sq_parts)

    def _pq_operands(self):
        """(codebooks in compute dtype, grouped Pallas weights|None), both
        replicated — or (None, None) without PQ storage."""
        if not self.pq_m:
            return None, None
        dt = jnp.bfloat16 if self.pq_compute == "bf16" else jnp.float32
        cb = jax.device_put(
            self.pq_codebooks.astype(dt), self._replicated
        )
        from ..ops.pallas_pq import decode_eligible, grouped_codebook, \
            pick_group

        dsub = self.dim // self.pq_m
        platform = self.mesh.devices.flat[0].platform
        pq_w = None
        if self.backend != "xla" and decode_eligible(
            platform, self.pq_m, self.pq_ksub, dsub, self._window or 128,
            interpret=self.backend == "pallas",
        ):
            if self._pq_w_cache is None:
                self._pq_w_cache = jax.device_put(
                    grouped_codebook(self.pq_codebooks,
                                     pick_group(self.pq_m, dsub)),
                    self._replicated,
                )
            pq_w = self._pq_w_cache
        return cb, pq_w

    def build(self, vectors: np.ndarray | jax.Array,
              row_ids: Optional[np.ndarray] = None) -> None:
        """Train centroids globally, build per-device local lists ON DEVICE.

        ``row_ids`` assigns explicit (possibly sparse) global ids to the
        rows — used by ``rebuild()`` so surviving rows keep their original
        ids after ``remove_ids``; default is positional 0..n-1."""
        vecs = jnp.asarray(vectors, jnp.float32)
        n = int(vecs.shape[0])
        nlist = min(self.nlist, max(1, n // self.n_dev))
        if nlist != self.nlist:
            logger.warning("reducing nlist %d -> %d", self.nlist, nlist)
            self.nlist = nlist
        if self.centroids is None or self.centroids.shape[0] != self.nlist:
            # IP uses spherical k-means (normalized centroids, dot-product
            # assignment) so the coarse partition matches the probe rule —
            # single-chip parity with index/ivf.py:284-288
            cents, _ = train_kmeans(
                vecs, self.nlist, n_iters=self.train_iters, seed=self.seed,
                spherical=(self.metric == "IP"),
            )
            if self.nlist >= 64:
                # spatial relabeling: the fused kernel's chunk locality
                # needs id-adjacent lists to be spatially adjacent
                order = spatial_order(cents, seed=self.seed)
                cents = cents[jnp.asarray(order)]
            self.centroids = cents
        cdtype = self._tier_dtype
        if self.pq_m and self.pq_compute == "f32":
            cdtype = jnp.float32  # coarse dots feed the ADC residual shift
        cent_rep = jax.device_put(
            self.centroids.astype(cdtype), self._replicated
        )
        cent_sq = jax.device_put(
            dist_ops.sqnorms(self.centroids), self._replicated
        )

        # ---- vectorized per-device layout (one argsort over (n_dev, per))
        assigns, _ = kmeans_assign(vecs, self.centroids, metric=self.metric)
        per = -(-n // self.n_dev)
        n_pad = per * self.n_dev
        a2 = jnp.pad(assigns.astype(jnp.int32), (0, n_pad - n),
                     constant_values=self.nlist).reshape(self.n_dev, per)
        order = jnp.argsort(a2, axis=1, stable=True)  # sentinel pads sort last
        sorted_a = jnp.take_along_axis(a2, order, axis=1)
        valid = sorted_a < self.nlist
        lengths = jax.vmap(
            lambda aa, ww: jax.ops.segment_sum(
                ww, jnp.clip(aa, 0, self.nlist - 1), num_segments=self.nlist
            )
        )(sorted_a, valid.astype(jnp.int32)).astype(jnp.int32)
        offsets = jnp.concatenate(
            [jnp.zeros((self.n_dev, 1), jnp.int32),
             jnp.cumsum(lengths, axis=1)[:, :-1]], axis=1
        )
        vecs_pad = jnp.pad(vecs, ((0, n_pad - n), (0, 0))).reshape(
            self.n_dev, per, self.dim
        )
        sorted_vecs = jnp.take_along_axis(vecs_pad, order[..., None], axis=1)
        sorted_sq = jnp.sum(sorted_vecs.astype(jnp.float32) ** 2, axis=-1)
        if row_ids is None:
            base = (jnp.arange(self.n_dev, dtype=jnp.int32) * per)[:, None]
            gids = jnp.where(valid, base + order.astype(jnp.int32), -1)
        else:
            rid = jnp.pad(
                jnp.asarray(row_ids, jnp.int32), (0, n_pad - n),
                constant_values=-1,
            ).reshape(self.n_dev, per)
            gids = jnp.where(valid, jnp.take_along_axis(rid, order, axis=1),
                             -1)

        # ---- window cap at the list-length quantile (one tiny host sync)
        lengths_np = np.asarray(lengths)
        max_len = max(int(lengths_np.max()), 1)
        cap = int(_round_up(
            max(128, int(np.quantile(lengths_np, self.window_quantile))), 128
        ))
        window = cap if cap < max_len else int(_round_up(max_len, 128))

        # per-row rank within its (device-local) list
        off_of_row = jnp.take_along_axis(
            offsets, jnp.clip(sorted_a, 0, self.nlist - 1), axis=1
        )
        rank = jnp.arange(per, dtype=jnp.int32)[None, :] - off_of_row
        keep = valid & (rank < window)

        # ---- block-padded slot scatter per device (int32 scalars), then
        # one block gather of the actual rows
        n_slots = (self.nlist + 1) * window
        dest = jnp.where(
            keep, sorted_a * window + rank, self.nlist * window
        )
        col = jnp.broadcast_to(
            jnp.arange(per, dtype=jnp.int32)[None, :], (self.n_dev, per)
        )
        src = jnp.full((self.n_dev, n_slots), per, jnp.int32)
        src = jax.vmap(lambda s, d, c: s.at[d].set(c))(src, dest, col)
        src = src.at[:, self.nlist * window:].set(per)  # wipe dump block

        if self.pq_m:
            codes, rec_sq = self._pq_encode_rows(
                sorted_vecs.reshape(-1, self.dim),
                jnp.clip(sorted_a, 0, self.nlist - 1).reshape(-1),
            )
            codes = codes.reshape(self.n_dev, per, self.pq_m)
            rec_sq = rec_sq.reshape(self.n_dev, per)
            scales = None
        elif self.quantized:
            codes, scales = quantize_rows(
                sorted_vecs.reshape(-1, self.dim)
            )
            codes = codes.reshape(self.n_dev, per, self.dim)
            scales = scales.reshape(self.n_dev, per)
        else:
            codes = sorted_vecs.astype(self.dtype)
            scales = None

        def pad_gather(arr, fill):
            filler = jnp.full((self.n_dev, 1) + arr.shape[2:], fill,
                              arr.dtype)
            return jax.vmap(lambda a, s: a[s])(
                jnp.concatenate([arr, filler], axis=1), src
            )

        padded_codes = pad_gather(codes, 0)
        # PQ lists rank by the ADC identity: reconstruction norms, not true
        # norms (the spill tier below keeps TRUE norms — it stays dense)
        padded_sq = pad_gather(rec_sq if self.pq_m else sorted_sq, 0.0)
        padded_ids = pad_gather(gids, -1)
        padded_scales = pad_gather(scales, 0.0) if scales is not None else None

        # ---- spill rows (rank >= window) -> per-device exact tier
        self._spill = None
        spill_mask = valid & (rank >= window)
        s_counts = spill_mask.sum(axis=1).astype(jnp.int32)
        n_spill = int(np.asarray(s_counts).sum())
        if n_spill:
            s_max = int(np.asarray(s_counts).max())
            s_pad = min(per, _round_up(s_max, 128))
            # spill rows first (stable), then take a uniform prefix
            sel = jnp.argsort(~spill_mask, axis=1, stable=True)[:, :s_pad]
            sp_vecs = jnp.take_along_axis(sorted_vecs, sel[..., None], axis=1)
            sp_sq = jnp.take_along_axis(sorted_sq, sel, axis=1)
            sp_ids = jnp.where(
                jnp.take_along_axis(spill_mask, sel, axis=1),
                jnp.take_along_axis(gids, sel, axis=1), -1,
            )
            self._spill = (
                jax.device_put(sp_vecs.astype(self._tier_dtype),
                               self._sharding),
                jax.device_put(sp_sq, self._sharding),
                jax.device_put(sp_ids, self._sharding),
                jax.device_put(s_counts[:, None], self._sharding),
            )
            logger.info(
                "capped sharded-IVF window at %d (max list %d): %d rows "
                "spilled to per-device exact tiers", window, max_len, n_spill,
            )

        self._vecs = jax.device_put(padded_codes, self._sharding)
        self._scales = (
            jax.device_put(padded_scales, self._sharding)
            if padded_scales is not None else None
        )
        self._sq = jax.device_put(padded_sq, self._sharding)
        self._ids = jax.device_put(padded_ids, self._sharding)
        self.centroids = jnp.asarray(self.centroids)
        self._cent_store = cent_rep
        self._cent_sq = cent_sq
        self._window = window
        self._n_built = n
        self._next_id = (
            n if row_ids is None
            else (int(np.max(row_ids)) + 1 if len(row_ids) else 0)
        )
        self.ndeleted = 0  # a (re)build only installs live rows
        self._stream_vecs = np.zeros((0, self.dim), np.float32)
        self._stream_ids = np.zeros((0,), np.int32)
        self._pending_dev = None
        logger.info(
            "built sharded IVF on device: n=%d over %d devices, nlist=%d "
            "window=%d", n, self.n_dev, self.nlist, window,
        )

    # ------------------------------------------------------------ streaming
    def add(self, vectors: np.ndarray | jax.Array) -> None:
        """Streaming add: staged host-side, mirrored round-robin to the
        per-device exact pending tier; auto-rebuild past the threshold."""
        vecs = np.asarray(vectors, np.float32)
        if vecs.ndim == 1:
            vecs = vecs[None, :]
        if self._n_built == 0:
            self.build(vecs)
            return
        n_new = len(vecs)
        ids = np.arange(self._next_id, self._next_id + n_new, dtype=np.int32)
        self._stream_vecs = np.concatenate([self._stream_vecs, vecs])
        self._stream_ids = np.concatenate([self._stream_ids, ids])
        self._next_id += n_new
        self._pending_dev = None  # mirror is stale
        if len(self._stream_ids) > self.rebuild_threshold * self._n_built:
            self.rebuild()

    @property
    def nlive(self) -> int:
        """Rows that remain searchable (``ntotal`` minus tombstones)."""
        return self._n_built + len(self._stream_ids) - self.ndeleted

    def remove_ids(self, ids) -> int:
        """Tombstone rows by original insertion id across all three tiers
        (block lists, per-device spill, host-staged stream) — the
        ``faiss.Index.remove_ids`` analog with stable positions; every scan
        already masks id -1 (the block-padding mechanism). ``state_dict``
        and ``rebuild()`` persist only live rows."""
        del_ids = np.unique(np.asarray(ids, np.int64).ravel())
        del_ids = del_ids[(del_ids >= 0) & (del_ids < self._next_id)]
        if not len(del_ids):
            return 0
        newly = 0
        if self._n_built and self._ids is not None:
            ids_np = np.asarray(self._ids)
            hit = np.isin(ids_np, del_ids)
            if hit.any():
                upd = jax.jit(
                    lambda a, m: jnp.where(m, -1, a),
                    out_shardings=self._sharding,
                )
                self._ids = upd(self._ids, jax.device_put(
                    jnp.asarray(hit), self._sharding))
                newly += int(hit.sum())
        if self._spill is not None:
            sp_vecs, sp_sq, sp_ids, sp_counts = self._spill
            s_np = np.asarray(sp_ids)
            hit = np.isin(s_np, del_ids)
            if hit.any():
                upd = jax.jit(
                    lambda a, m: jnp.where(m, -1, a),
                    out_shardings=self._sharding,
                )
                sp_ids = upd(sp_ids, jax.device_put(
                    jnp.asarray(hit), self._sharding))
                self._spill = (sp_vecs, sp_sq, sp_ids, sp_counts)
                newly += int(hit.sum())
        self.ndeleted += newly  # tombstones in the device tiers only
        if len(self._stream_ids):
            # host-staged rows are dropped outright (no tombstone needed);
            # they shrink len(_stream_ids) instead of counting in ndeleted
            keep = ~np.isin(self._stream_ids, del_ids)
            dropped = int((~keep).sum())
            if dropped:
                self._stream_vecs = self._stream_vecs[keep]
                self._stream_ids = self._stream_ids[keep]
                self._pending_dev = None  # mirror is stale
                newly += dropped
        logger.debug("tombstoned %d rows (%d live)", newly, self.nlive)
        return newly

    def rebuild(self) -> None:
        """Merge the stream tier into the lists; surviving rows keep their
        original ids (stable positions across remove_ids + rebuild)."""
        if not len(self._stream_ids) and not self.ndeleted:
            return
        vecs, ids = self.vectors(return_ids=True)
        logger.info("rebuilding sharded IVF with %d vectors", len(vecs))
        self.build(vecs, row_ids=ids)

    def _refresh_pending(self) -> None:
        """Mirror the host-staged stream tier to (n_dev, t_pad, ...) arrays,
        striped round-robin so shard_map sees uniform shapes."""
        n = len(self._stream_ids)
        if n == 0:
            self._pending_dev = None
            return
        t_pad = _round_up(-(-n // self.n_dev), 128)
        vecs = np.zeros((self.n_dev, t_pad, self.dim), np.float32)
        sq = np.zeros((self.n_dev, t_pad), np.float32)
        ids = np.full((self.n_dev, t_pad), -1, np.int32)
        counts = np.zeros((self.n_dev, 1), np.int32)
        for d in range(self.n_dev):
            rows = self._stream_vecs[d :: self.n_dev]
            counts[d, 0] = len(rows)
            vecs[d, : len(rows)] = rows
            sq[d, : len(rows)] = (rows.astype(np.float32) ** 2).sum(-1)
            ids[d, : len(rows)] = self._stream_ids[d :: self.n_dev]
        self._pending_dev = (
            jax.device_put(jnp.asarray(vecs, self._tier_dtype),
                           self._sharding),
            jax.device_put(jnp.asarray(sq), self._sharding),
            jax.device_put(jnp.asarray(ids), self._sharding),
            jax.device_put(jnp.asarray(counts), self._sharding),
        )

    # -------------------------------------------------------------- search
    def search(
        self, queries, k: int, nprobe: Optional[int] = None,
        filter_mask=None,
    ) -> Tuple[jax.Array, jax.Array]:
        """``filter_mask``: optional (ntotal,) bool indexed by global
        insertion id, True = searchable (FAISS ``IDSelector`` analog).
        Replicated to every device; each local scan masks rows BEFORE
        selection. Forces the XLA per-device backend (the Pallas kernel
        has no filter operand)."""
        nprobe = min(nprobe or self.nprobe, self.nlist)
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        nq = q.shape[0]
        fill = jnp.inf if self.metric == "L2" else -jnp.inf
        if self.ntotal == 0:
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
            filt = jax.device_put(filt, self._replicated)
        q = jax.device_put(q, self._replicated)
        if len(self._stream_ids) and self._pending_dev is None:
            self._refresh_pending()
        tiers = ()
        if self._spill is not None:
            tiers = tiers + self._spill
        if self._pending_dev is not None:
            tiers = tiers + self._pending_dev
        union_cap = (
            self.union_cap if self.union_cap is not None
            else default_union_cap(self.nlist, nprobe)
        )
        qc = pick_query_chunk(
            nprobe, self._window, self.dim,
            4 if self.pq_m else self.dtype.itemsize,  # PQ decodes to dense
            nq, union_cap=union_cap,
        )
        backend, interpret = "xla", False
        pq_cb, pq_w = self._pq_operands()
        if pq_w is not None:
            interpret = self.mesh.devices.flat[0].platform != "tpu"
        if self.backend != "xla" and filt is None and not self.pq_m:
            from ..ops.pallas_ivf import pallas_eligible

            # the MESH decides the platform (a registered TPU plugin may own
            # jax.devices() while this index lives on a virtual CPU mesh)
            platform = self.mesh.devices.flat[0].platform
            if pallas_eligible(
                platform=platform, quantized=self.quantized,
                window=self._window, dim=self.dim, qc=max(qc, 16),
                shadow=None, interpret=self.backend == "pallas",
            ):
                backend = "pallas"
                qc = max(qc, 16)
                interpret = platform != "tpu"
        fn = _build_sharded_fused(
            self.mesh, k, self._window, self.db_axis,
            nprobe, union_cap, qc, self.recall_target,
            self.quantized, self._spill is not None,
            self._pending_dev is not None,
            union_mode="chunkmax" if self.nlist > 2048 else "minrank",
            metric=self.metric, backend=backend, interpret=interpret,
            has_filter=filt is not None, has_pq=pq_cb is not None,
            has_pq_w=pq_w is not None,
        )
        scales = (
            self._scales if self.quantized
            else jnp.zeros((self.n_dev, 1), jnp.float32)
        )
        args = tiers
        if pq_w is not None:
            args = (pq_w,) + args
        if pq_cb is not None:
            args = (pq_cb,) + args
        if filt is not None:
            args = (filt,) + args
        vals, ids = fn(
            q, self._cent_store, self._cent_sq, self._vecs, scales,
            self._sq, self._ids, *args,
        )
        if vals.shape[1] < k:
            pad = k - vals.shape[1]
            vals = jnp.concatenate(
                [vals, jnp.full((nq, pad), fill, vals.dtype)], axis=1
            )
            ids = jnp.concatenate(
                [ids, jnp.full((nq, pad), -1, jnp.int32)], axis=1
            )
        return vals, ids

    # ------------------------------------------------------------- manage
    def reset(self) -> None:
        self.centroids = None
        self._clear_state()

    def vectors(self, return_ids: bool = False):
        """Live vectors in original insertion order (remove_ids tombstones
        excluded). int8 storage returns the dequantized reconstruction
        (spilled rows stay full precision in their tier, so they reload
        exactly). ``return_ids=True`` also returns original ids."""
        parts_v, parts_i = [], []
        if self._n_built:
            ids = np.asarray(self._ids).reshape(-1)
            keep = ids >= 0
            if self.pq_m:
                from ..ops import pq as pq_ops

                # reconstruction = decoded residual + the slot's list
                # centroid (slot // window within each device's block)
                flat = self._vecs.reshape(-1, self.pq_m)
                n_slots = self._vecs.shape[1]
                slot = np.arange(self.n_dev * n_slots) % n_slots
                lists = np.minimum(slot // self._window, self.nlist - 1)
                built = np.asarray(
                    pq_ops.pq_decode(self.pq_codebooks, flat)
                    + self.centroids[jnp.asarray(lists, jnp.int32)]
                )
            elif self.quantized:
                from ..ops.quantize import dequantize

                built = np.asarray(dequantize(
                    self._vecs.reshape(-1, self.dim),
                    self._scales.reshape(-1),
                ))
            else:
                built = np.asarray(
                    self._vecs.reshape(-1, self.dim).astype(jnp.float32)
                )
            parts_v.append(built[keep])
            parts_i.append(ids[keep])
            if self._spill is not None:
                sp_vecs, _, sp_ids, _ = self._spill
                s_ids = np.asarray(sp_ids).reshape(-1)
                s_keep = s_ids >= 0
                parts_v.append(np.asarray(
                    sp_vecs.reshape(-1, self.dim).astype(jnp.float32)
                )[s_keep])
                parts_i.append(s_ids[s_keep])
        if len(self._stream_ids):
            parts_v.append(self._stream_vecs)
            parts_i.append(self._stream_ids)
        if not parts_v:
            empty = np.zeros((0, self.dim), np.float32)
            return (empty, np.zeros((0,), np.int32)) if return_ids else empty
        vecs = np.concatenate(parts_v)
        ids = np.concatenate(parts_i)
        order = np.argsort(ids, kind="stable")
        if return_ids:
            return vecs[order], ids[order].astype(np.int32)
        return vecs[order]

    # ---------------------------------------------------------------- io
    @staticmethod
    def _to_host(arr) -> np.ndarray:
        """savez-able numpy view (bf16 -> uint16 bits; shared codec)."""
        return codec.to_host(arr)

    def _from_host(self, arr: np.ndarray, dtype) -> jax.Array:
        return codec.from_host(arr, dtype)

    def state_dict(self) -> dict:
        """Exact state, compact (format "sharded_padded_v1"): live block
        rows in (device, list, rank) order + per-device list lengths —
        reload re-scatters instead of re-running assignment, codes/scales
        persist AS STORED (int8 bit-exact, no dequantize/requantize cycle).
        Sharded analog of the single-chip ``padded_v3`` format
        (index/ivf.py:state_dict; the ``faiss.write_index`` role,
        ``faiss_store.py:83-97``, at BASELINE config #4 scale)."""
        state = {
            "kind": "sharded_ivf",
            "format": "sharded_padded_v1",
            "dim": self.dim,
            "metric": self.metric,
            "dtype": str(self.dtype),
            "nlist": self.nlist,
            "nprobe": self.nprobe,
            "window_quantile": self.window_quantile,
            "n_dev": self.n_dev,
            "window": self._window,
            "next_id": self._next_id,
            "n_built": self._n_built,
            "centroids": np.asarray(self.centroids)
            if self.centroids is not None
            else np.zeros((0, self.dim), np.float32),
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
        if self._n_built:
            ids_np = np.asarray(self._ids)          # (n_dev, n_slots)
            n_slots = ids_np.shape[1]
            live = ids_np.reshape(-1) >= 0          # slot order == list order
            pos = jnp.asarray(np.nonzero(live)[0])
            lengths = (
                ids_np[:, : self.nlist * self._window]
                .reshape(self.n_dev, self.nlist, self._window) >= 0
            ).sum(axis=2).astype(np.int32)
            state.update({
                "lengths": lengths,
                "codes": self._to_host(
                    self._vecs.reshape(-1, self._vecs.shape[-1])[pos]
                ),
                "sqnorms": np.asarray(self._sq.reshape(-1)[pos]),
                "sorted_ids": ids_np.reshape(-1)[live],
            })
            if self.quantized:
                state["scales"] = np.asarray(self._scales.reshape(-1)[pos])
            if self._spill is not None:
                sp_vecs, sp_sq, sp_ids, _ = self._spill
                s_ids = np.asarray(sp_ids).reshape(-1)
                s_live = s_ids >= 0
                s_pos = jnp.asarray(np.nonzero(s_live)[0])
                state.update({
                    "spill_codes": self._to_host(
                        sp_vecs.reshape(-1, self.dim)[s_pos]
                    ),
                    "spill_sq": np.asarray(sp_sq.reshape(-1)[s_pos]),
                    "spill_ids": s_ids[s_live],
                })
            # only live rows are saved, so the reloaded tier count must be
            # the live count (remove_ids tombstones do not survive a save)
            state["n_built"] = int(live.sum()) + (
                int((np.asarray(self._spill[2]) >= 0).sum())
                if self._spill is not None else 0
            )
        if len(self._stream_ids):
            state.update({
                "stream_vecs": self._stream_vecs,
                "stream_ids": self._stream_ids,
            })
        return state

    def _install_rows(
        self,
        codes: jax.Array,      # (n_live, D) as-stored rows
        sq: np.ndarray,
        ids: np.ndarray,
        scales: Optional[np.ndarray],
        dev_of_row: np.ndarray,   # (n_live,) target device per row
        list_of_row: np.ndarray,  # (n_live,) inverted-list id per row
        window: int,
    ) -> None:
        """Scatter flat live rows into the (n_dev, (nlist+1)*window, ...)
        block-padded sharded layout. Index arithmetic is host-side scalars;
        the vectors move in ONE device gather."""
        n_live = len(ids)
        order = np.lexsort((ids, list_of_row, dev_of_row))
        dev_s, list_s = dev_of_row[order], list_of_row[order]
        # rank within the (device, list) group
        group = dev_s.astype(np.int64) * self.nlist + list_s
        first = np.r_[True, group[1:] != group[:-1]] if n_live else np.zeros(
            0, bool
        )
        group_start = np.maximum.accumulate(
            np.where(first, np.arange(n_live), 0)
        )
        rank = np.arange(n_live) - group_start
        n_slots = (self.nlist + 1) * window
        dest = (dev_s.astype(np.int64) * n_slots
                + list_s.astype(np.int64) * window + rank)
        src = np.full(self.n_dev * n_slots, n_live, np.int64)
        src[dest] = order
        src_dev = jnp.asarray(src.reshape(self.n_dev, n_slots))

        def scatter(arr, fill, dtype=None):
            arr = jnp.asarray(arr) if not isinstance(arr, jax.Array) else arr
            filler = jnp.full((1,) + arr.shape[1:], fill, arr.dtype)
            out = jnp.concatenate([arr, filler])[src_dev]
            return jax.device_put(out, self._sharding)

        self._vecs = scatter(codes, 0)
        self._sq = scatter(jnp.asarray(sq, jnp.float32), 0.0)
        self._ids = scatter(jnp.asarray(ids, jnp.int32), -1)
        self._scales = (
            scatter(jnp.asarray(scales, jnp.float32), 0.0)
            if scales is not None else None
        )
        self._window = window

    @classmethod
    def from_state_dict(
        cls, state: dict, mesh: Optional[Mesh] = None, **kwargs
    ) -> "ShardedIVFIndex":
        def item(v):
            v = np.asarray(v)
            return v.item() if v.ndim == 0 else v

        if mesh is None:
            from ..core.mesh import make_mesh

            mesh = make_mesh({"db": len(jax.devices())})
        pq_kwargs = {}
        if "pq_m" in state:
            pq_kwargs = {
                "pq_m": int(item(state["pq_m"])),
                "pq_ksub": int(item(state["pq_ksub"])),
                "pq_compute": str(item(state["pq_compute"])),
            }
        idx = cls(
            dim=int(item(state["dim"])),
            mesh=mesh,
            nlist=int(item(state["nlist"])),
            nprobe=int(item(state["nprobe"])),
            metric=str(item(state["metric"])),
            dtype=str(item(state["dtype"])) if "pq_m" not in state
            else "bfloat16",  # __init__ re-derives uint8 from pq_m
            **pq_kwargs,
            **kwargs,
        )
        if "pq_codebooks" in state:
            cb = np.asarray(state["pq_codebooks"])
            if cb.size:
                idx.pq_codebooks = jnp.asarray(cb, jnp.float32)
        if "window_quantile" in state:
            idx.window_quantile = float(item(state["window_quantile"]))
        centroids = np.asarray(state["centroids"])
        if centroids.size:
            idx.centroids = jnp.asarray(centroids)

        fmt = str(item(state.get("format", "")))
        if fmt != "sharded_padded_v1":
            # legacy format: insertion-order vectors -> rebuild
            vectors = np.asarray(state["vectors"])
            if len(vectors):
                idx.build(vectors)
            return idx

        saved_dev = int(item(state["n_dev"]))
        window = int(item(state["window"]))
        idx._next_id = int(item(state["next_id"]))
        idx._n_built = int(item(state["n_built"]))
        if idx._n_built:
            lengths = np.asarray(state["lengths"], np.int64)
            ids = np.asarray(state["sorted_ids"], np.int32)
            codes = idx._from_host(np.asarray(state["codes"]), idx.dtype)
            sq = np.asarray(state["sqnorms"], np.float32)
            scales = (
                np.asarray(state["scales"], np.float32)
                if idx.quantized else None
            )
            list_of_row = np.repeat(
                np.tile(np.arange(idx.nlist), saved_dev), lengths.reshape(-1)
            )
            if saved_dev == idx.n_dev:
                dev_of_row = np.repeat(
                    np.arange(saved_dev), lengths.sum(axis=1)
                )
            else:
                # mesh size changed: re-stripe rows by global id (list
                # membership is saved state, so this is a pure re-scatter —
                # still no re-assignment and still bit-exact codes)
                logger.info(
                    "sharded IVF reload across mesh sizes (%d -> %d "
                    "devices): re-striping rows", saved_dev, idx.n_dev,
                )
                per_new = -(-max(int(ids.max()) + 1, 1) // idx.n_dev)
                dev_of_row = np.minimum(ids // per_new, idx.n_dev - 1)
                new_len = np.zeros((idx.n_dev, idx.nlist), np.int64)
                np.add.at(new_len, (dev_of_row, list_of_row), 1)
                window = int(_round_up(max(int(new_len.max()), 1), 128))
            idx._install_rows(
                codes, sq, ids, scales, dev_of_row, list_of_row, window
            )
            cdtype = idx._tier_dtype
            if idx.pq_m and idx.pq_compute == "f32":
                cdtype = jnp.float32
            idx._cent_store = jax.device_put(
                idx.centroids.astype(cdtype), idx._replicated
            )
            idx._cent_sq = jax.device_put(
                dist_ops.sqnorms(idx.centroids), idx._replicated
            )
            if "spill_ids" in state:
                sp_ids = np.asarray(state["spill_ids"], np.int32)
                sp_codes = idx._from_host(
                    np.asarray(state["spill_codes"]), idx._tier_dtype
                )
                sp_sq = np.asarray(state["spill_sq"], np.float32)
                # re-stripe round-robin: spill rows are exactly scanned on
                # whichever device holds them, so placement is free
                n_sp = len(sp_ids)
                s_pad = int(_round_up(-(-n_sp // idx.n_dev), 128))
                vecs_h = np.zeros((idx.n_dev, s_pad, idx.dim), np.float32)
                sq_h = np.zeros((idx.n_dev, s_pad), np.float32)
                ids_h = np.full((idx.n_dev, s_pad), -1, np.int32)
                counts = np.zeros((idx.n_dev, 1), np.int32)
                sp_codes_f = np.asarray(sp_codes.astype(jnp.float32))
                for d in range(idx.n_dev):
                    rows = sp_codes_f[d::idx.n_dev]
                    counts[d, 0] = len(rows)
                    vecs_h[d, : len(rows)] = rows
                    sq_h[d, : len(rows)] = sp_sq[d::idx.n_dev]
                    ids_h[d, : len(rows)] = sp_ids[d::idx.n_dev]
                idx._spill = (
                    jax.device_put(
                        jnp.asarray(vecs_h).astype(idx._tier_dtype),
                        idx._sharding,
                    ),
                    jax.device_put(jnp.asarray(sq_h), idx._sharding),
                    jax.device_put(jnp.asarray(ids_h), idx._sharding),
                    jax.device_put(jnp.asarray(counts), idx._sharding),
                )
        if "stream_ids" in state:
            idx._stream_vecs = np.asarray(state["stream_vecs"], np.float32)
            idx._stream_ids = np.asarray(state["stream_ids"], np.int32)
        return idx
