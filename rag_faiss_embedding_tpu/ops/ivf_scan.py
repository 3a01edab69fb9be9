"""Fused batched IVF search: coarse + union probe scan in ONE jit.

This is the IVF fast path (the per-query windowed gather in
``index/ivf.py:probe_scan_math`` is the semantics reference and the
small-batch fallback). It replaces ``faiss.IndexIVFFlat.search``
(BASELINE.md config #3; the reference itself never gets past
``faiss.IndexFlatL2``, ``faiss_store.py:29``) with a TPU-first design:

Why per-query probing is slow on TPU: each query gathers its own
(nprobe, window, D) block and scores it with an einsum whose contraction is
a batch of M=1 GEMVs — the MXU runs at a tiny fraction of peak, and the
gather traffic is paid per query. Measured round 1: 12.8k QPS at 1M x 384
vs 394k for the flat int8 scan it is supposed to beat. A naive chunked
"union" that keeps qc*nprobe window slots (round 2 v1) is no better: every
query is scored against qc x more rows than it probed — at qc=64 that is
effectively a full scan again (measured 30k QPS).

The design makes the chunk-shared work SMALL, not just shared:

1. coarse: ONE (Nq, nlist) MXU matmul for the whole batch;
2. sort queries so processing-order neighbours probe nearly the same
   lists (by top-1 cell id; index/ivf.py relabels lists spatially so
   id-adjacency implies spatial adjacency — without that, chunk unions
   shared almost nothing and recall collapsed to ~0.4 at 1M);
3. per chunk of ``qc`` queries, pick a UNION of ``union_cap`` list
   blocks. Two modes:
   - ``minrank`` (small-index default): each query's top-nprobe probes
     are compacted by min probe rank — a list probed at rank r by ANY
     chunk query outranks one first probed at r+1, so every query's
     rank-0 list is guaranteed in. Duplicates/unused slots point at a
     sentinel zero-length block;
   - ``chunkmax`` (the large-nlist fast path): normalize each query's
     coarse scores to its own best, rank lists per chunk by the max
     normalized score any member query gives, ONE exact top-union_cap
     per chunk — replacing per-query top-k over (Nq, nlist) AND the
     compaction sort chain (together ~1/3 of the batch);
4. gather the union's fixed-size list blocks — with the index's
   block-padded layout (every list owns exactly ``window`` slots) this is
   a contiguous (U, window, D) block gather, not a row gather — and score
   with ONE (qc, D) x (D, U*window) MXU matmul per chunk (int8 codes run
   with int32 accumulation at 2x bf16 throughput). Distances are exact;
   selection widens ``lax.approx_max_k`` (XLA's TPU PartialReduce) to
   max(k, 16) candidates and exact-trims — cheaper than raising the
   reduce's recall_target. int8 storage optionally re-scores its
   candidates against a bf16 shadow copy (the quantized cross term caps
   recall@10 at ~0.980 otherwise);
5. the spill tier (rows past the window cap + streaming adds) is scored
   once for the WHOLE batch with a single MXU matmul and merged exactly
   (approximate selection past 8k spill rows — an exact top_k over a
   (Nq, 380k) score matrix cost 4x the whole fused probe);
6. chunks execute as a ``lax.scan`` of VMAPPED super-batches sized to an
   HBM budget, so the compiler overlaps block gathers with MXU work.

Everything — coarse scan, query sort, union selection, gathers, matmuls,
selection, rerank, merge — runs in one jitted program per batch.
Measured trajectory at 1M x 384 (docs/PERF.md): 12.8k QPS (round-1
per-query path) -> 707k QPS @ recall@10 0.9907.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .distance import NEG_INF, _matmul_precision, merge_topk, small_topk
from .quantize import quantize_rows

# Per-step HBM budget for the two big intermediates (gathered rows and the
# (qc, U*window) score matrix). Conservative: v5e has 16 GB HBM and the
# database itself can be most of it.
_STEP_BYTES_BUDGET = 1 << 30
# live intermediates allowed inside one vmapped super-batch of chunks
# (gathered rows + score matrices for `sb` chunks at once)
_VMAP_BYTES_BUDGET = 768 << 20
# coarse probing switches from exact top_k to PartialReduce above this
_COARSE_APPROX_MIN_NLIST = 2048
_RANK_INF = jnp.int32(1 << 30)
logger = logging.getLogger(__name__)


def default_union_cap(nlist: int, nprobe: int) -> int:
    """Union slots per chunk: enough that small indexes never truncate
    (cap >= nlist) and large ones keep every query's top lists plus deep
    shared coverage (16x nprobe with chunks of half the cap measured best
    at 1M x 384 / nlist 8192; benchmarks/ivf_sweep.py)."""
    return min(nlist, max(64, 16 * nprobe))


def pick_query_chunk(
    nprobe: int,
    window: int,
    dim: int,
    code_bytes: int,
    n_queries: int,
    union_cap: Optional[int] = None,
    nlist: Optional[int] = None,
) -> int:
    """Query chunk size: equal to the union budget (capped at 256) —
    bigger chunks amortize the block gather over more queries, and at 1M x
    384 / nlist 8192 recall holds up to qc == union_cap == 256 and
    collapses just past it (a chunk bigger than its union starves queries
    of their best lists; measured 0.9902 at 256/256 vs 0.52 at 512-query
    chunks). Shrunk further if the per-step intermediates (gathered rows +
    the (qc, U*window) score matrix) bust the HBM budget."""
    if union_cap is None:
        union_cap = default_union_cap(nlist or (1 << 30), nprobe)
    rows = union_cap * window
    qc = max(16, min(256, union_cap))
    while qc > 8:
        step_bytes = rows * dim * code_bytes + qc * rows * 4
        if step_bytes <= _STEP_BYTES_BUDGET:
            break
        qc //= 2
    return max(8, min(qc, max(8, n_queries)))


def query_chunk_recall_safe(qc: int, union_cap: int) -> bool:
    """Whether a (qc, union_cap) pair can structurally serve the chunk-union
    recall contract. A chunk larger than its union starves queries of their
    best lists — measured 0.9902 recall@10 at qc == union_cap == 256 vs
    0.52 at qc=512/ucap=256 on 1M x 384 (BENCH_r04 ivf_sweep). Sweeps and
    user overrides should refuse (or at least label) qc > union_cap."""
    return qc <= union_cap


def resolve_fused_dispatch(
    *,
    nq: int,
    dim: int,
    nlist: int,
    window: int,
    code_bytes: int,
    quantized: bool,
    has_shadow: bool,
    has_pq: bool,
    has_filter: bool,
    nprobe: int,
    union_cap: Optional[int] = None,
    qc: Optional[int] = None,
    backend: str = "auto",
    platform: str = "tpu",
) -> dict:
    """Resolve the (nprobe, union_cap, qc, backend, interpret) a fused IVF
    search will actually dispatch with, WITHOUT running it.

    This is the single source of truth shared by ``fused_ivf_search`` (the
    shipped class path) and the headline bench's ``library_default_*``
    stanza — so a defaults/sweep divergence (a config the bench never
    times) is structurally impossible (VERDICT r04 #8). Tests assert the
    class dispatch matches this resolution (tests/test_ivf_dispatch.py).
    """
    nprobe = min(nprobe, nlist)
    if union_cap is None:
        union_cap = default_union_cap(nlist, nprobe)
    if qc is None:
        if has_pq:
            # the PQ chunk stage segments its union internally (useg), so
            # per-step memory is bounded regardless of qc — qc is set by
            # the recall constraint alone (qc <= union_cap, cap 256; see
            # pick_query_chunk's rationale)
            qc = max(16, min(256, union_cap))
        else:
            qc = pick_query_chunk(
                nprobe, window, dim, code_bytes, nq, union_cap=union_cap,
            )
    elif not query_chunk_recall_safe(qc, union_cap):
        logger.warning(
            "query chunk %d exceeds union_cap %d: the chunk union cannot "
            "serve every query's probe lists and recall will collapse "
            "(measured 0.52 at qc=2*ucap on 1M x 384)", qc, union_cap,
        )
    qc = min(qc, max(8, nq))
    interpret = False
    if (has_filter or has_pq) and backend == "auto":
        backend = "xla"
    if backend != "xla":
        from .pallas_ivf import pallas_eligible

        # small batches pad up to the kernel's minimum chunk (bf16 sublane
        # tiling needs >= 16 query rows; replica padding costs nothing)
        qc_pallas = max(qc, 16)
        eligible = pallas_eligible(
            platform=platform, quantized=quantized, window=window,
            dim=dim, qc=qc_pallas, shadow=has_shadow or None,
            interpret=backend == "pallas",
        )
        if eligible:
            qc = qc_pallas
        if backend == "pallas" and not eligible:
            raise ValueError(
                "pallas backend needs full-precision storage, no shadow, "
                f"window/dim multiples of 128, qc >= 16 (got window={window} "
                f"dim={dim} qc={qc} quantized={quantized})"
            )
        backend = "pallas" if eligible else "xla"
        interpret = backend == "pallas" and platform != "tpu"
    return {
        "nprobe": nprobe, "union_cap": union_cap, "qc": qc,
        "backend": backend, "interpret": interpret,
    }


def _pq_union_segments(u_n: int, window: int, m_bytes: int, d: int,
                       qc: int) -> int:
    """Number of segments the PQ chunk stage streams its union in, so the
    per-step live bytes (gathered codes + ids/norms + DECODED dense rows +
    the score matrix) stay under ``_STEP_BYTES_BUDGET``. Segmenting —
    instead of shrinking qc — is what keeps large-nprobe searches off the
    round-3 cliff (SCALE_r03: qc collapsed 256 -> 8 at nprobe>=32 on the
    10M config, a 50x QPS hit)."""
    bytes_per_list = window * (m_bytes + 8 + 4 * d + 4 * qc)
    useg = max(1, -(-int(u_n) * bytes_per_list // _STEP_BYTES_BUDGET))
    if useg > 1:
        useg = -(-u_n // (-(-u_n // useg)))  # round to equal segments
    return int(useg)


def _select_union(probes: jax.Array, nlist: int, union_cap: int) -> jax.Array:
    """Compact a chunk's (qc, nprobe) probe lists to ``union_cap`` unique
    list ids ranked by min probe rank; unused slots -> sentinel ``nlist``.

    Guarantee: a list probed at rank r by any chunk query survives whenever
    fewer than ``union_cap`` distinct lists have min-rank <= r — in
    particular every query's rank-0 list always survives (qc <= union_cap
    distinct rank-0 lists at most). Output is sorted ascending so the block
    gather walks HBM in offset order."""
    qcn, nprobe = probes.shape
    ids = probes.reshape(-1).astype(jnp.int32)
    ranks = jnp.broadcast_to(
        jnp.arange(nprobe, dtype=jnp.int32)[None, :], probes.shape
    ).reshape(-1)
    order = jnp.lexsort((ranks, ids))  # primary: id, secondary: rank
    ids_s = ids[order]
    ranks_s = ranks[order]
    first = jnp.concatenate(
        [jnp.ones((1,), bool), ids_s[1:] != ids_s[:-1]]
    )
    key = jnp.where(first, ranks_s, _RANK_INF)  # min rank at first occurrence
    take = min(union_cap, ids_s.shape[0])
    ord2 = jnp.argsort(key, stable=True)[:take]
    u = jnp.where(key[ord2] < _RANK_INF, ids_s[ord2], jnp.int32(nlist))
    return jnp.sort(u)


def _live_rows(rid, filt):
    """Searchable-row mask: block padding / tombstones (id -1) plus the
    optional id-indexed search filter (FAISS ``IDSelector`` analog). The
    filter gather rides the already-gathered id lane — ~1/D of the block
    gather's traffic."""
    live = rid >= 0
    if filt is not None:
        live = live & filt[jnp.maximum(rid, 0)]
    return live


def _score_rows(qf, q_i8, q_scale, rows, rscale, rsq, rid, metric,
                filt=None):
    """Exact (metric-internal, higher-better) scores of queries vs rows."""
    if rscale is not None:
        dots = jnp.dot(q_i8, rows.T, preferred_element_type=jnp.int32)
        dots = dots.astype(jnp.float32) * q_scale[:, None] * rscale[None, :]
    else:
        q_cast = qf.astype(rows.dtype)
        dots = jnp.dot(
            q_cast, rows.T,
            preferred_element_type=jnp.float32,
            precision=_matmul_precision(q_cast),
        )
    scores = 2.0 * dots - rsq[None, :] if metric == "L2" else dots
    return jnp.where(_live_rows(rid, filt)[None, :], scores, NEG_INF)


def _chunk_body(
    q: jax.Array,              # (qc, D) f32
    q_i8: Optional[jax.Array],  # (qc, D) int8 when storage is quantized
    q_scale: Optional[jax.Array],
    u: jax.Array,              # (U,) precomputed union list ids (sorted)
    codes: jax.Array,          # ((nlist+1)*window, D) block-padded storage
    scales: Optional[jax.Array],
    sorted_sq: jax.Array,      # ((nlist+1)*window,) f32 exact row norms
    sorted_ids: jax.Array,     # ((nlist+1)*window,) int32, -1 for dead slots
    shadow: Optional[jax.Array],  # ((nlist+1)*window, D) bf16 rerank copy
    *,
    k: int,
    window: int,
    metric: str,
    recall_target: float,
    rerank_depth: int,
    filt: Optional[jax.Array] = None,  # (next_id,) bool, True = searchable
) -> Tuple[jax.Array, jax.Array]:
    """Search one query chunk against its union blocks. Returns
    (values, ids) on the INTERNAL score scale (higher better)."""
    d = q.shape[1]
    rows = codes.reshape(-1, window, d)[u].reshape(-1, d)      # (U*window, D)
    rid = sorted_ids.reshape(-1, window)[u].reshape(-1)
    rsq = sorted_sq.reshape(-1, window)[u].reshape(-1)
    rscale = (
        scales.reshape(-1, window)[u].reshape(-1)
        if scales is not None else None
    )
    scores = _score_rows(q, q_i8, q_scale, rows, rscale, rsq, rid, metric,
                         filt=filt)
    # select WIDER than k, then exact top-k over the candidates: the
    # PartialReduce's per-tile misses land in ranks k..2k far more often
    # than outside the widened set, so this buys ~half a recall point for
    # the cost of a (qc, 16) sort (measured: bf16 0.9896 -> gate at rt=0.995)
    k_cand = min(max(k, rerank_depth), scores.shape[1])
    best_v, pos = lax.approx_max_k(scores, k_cand,
                                   recall_target=recall_target)
    pos = pos.astype(jnp.int32)
    best_i = rid[pos]
    if shadow is None and k_cand > k:
        best_v, sel = lax.top_k(best_v, k)
        best_i = jnp.take_along_axis(best_i, sel, axis=1)
    if shadow is not None:
        # exact rerank of the quantized scan's candidates: the int8 cross
        # term caps recall@10 at ~0.980 (measured, 1M x 384); re-scoring
        # rerank_depth candidates per query against the bf16 shadow rows
        # (a tiny gather + batched matvec) buys back the bf16-level 0.993
        slot = u[pos // window] * window + pos % window      # (qc, k_cand)
        srows = shadow[slot].astype(jnp.float32)             # (qc, kc, D)
        dots = jnp.einsum(
            "qd,qkd->qk", q, srows, preferred_element_type=jnp.float32
        )
        # self-consistent norms (|x̂|², not the exact stored norm): see
        # ops/quantize.int8_rerank_search — the mixed form's 2·q·(x−x̂)
        # error scales with ‖q‖ and scrambles near-tied neighbors
        ssq = jnp.sum(srows * srows, axis=-1)
        sc = 2.0 * dots - ssq if metric == "L2" else dots
        # re-mask: with fewer than k_cand live candidates the PartialReduce
        # pads from masked slots, and the exact re-score would RESURRECT a
        # filtered/tombstoned row
        sc = jnp.where(_live_rows(best_i, filt), sc, NEG_INF)
        best_v, sel = lax.top_k(sc, min(k, k_cand))
        best_i = jnp.take_along_axis(best_i, sel, axis=1)
    return best_v, best_i


def _chunk_body_pq(
    q: jax.Array,              # (qc, D) f32
    qr: jax.Array,             # (qc, D) f32 OPQ-rotated queries (== q when
    #                            no rotation; drives the residual matmul)
    u: jax.Array,              # (U,) union list ids (sorted)
    cdu: jax.Array,            # (qc, U) raw q·centroid dots of the union
    codes: jax.Array,          # ((nlist+1)*window, M) uint8 PQ codes
    sorted_sq: jax.Array,      # ((nlist+1)*window,) f32 ||c + r̂||²
    sorted_ids: jax.Array,
    pq_cb: jax.Array,          # (M, ksub, dsub) compute-dtype codebooks
    *,
    k: int,
    window: int,
    metric: str,
    recall_target: float,
    rerank_depth: int,
    filt: Optional[jax.Array] = None,
    pq_w: Optional[jax.Array] = None,   # grouped codebook -> Pallas decode
    interpret: bool = False,
    shadow: Optional[Tuple[jax.Array, ...]] = None,
    useg: int = 1,                      # union segments (memory bound)
) -> Tuple[jax.Array, jax.Array]:
    """PQ-storage chunk stage: the union block gather moves M BYTES per row
    (the whole point of the tier), codes decode to dense rows against the
    VMEM-resident codebook, one MXU matmul scores the residual part, and
    the coarse stage's q·centroid dots supply the residual shift:
    ``q·x̂ = q·c_list + q·r̂`` (residual encoding), so
    L2 internal score = 2(q·c + q·r̂) - ||c + r̂||² with exact stored norms.

    ``pq_w`` present -> the decode runs the Pallas one-hot MXU kernel
    (ops/pallas_pq.py; XLA's gather decode measured 121 ms vs ~2 ms for
    the matmul it feeds).

    ``shadow`` present -> int8/bf16 REFINE (FAISS ``IndexRefine`` analog,
    measured rationale in docs/PERF.md "PQ on TPU": ADC ranking scrambles
    near-tied neighbors, capping recall@10 at ~0.32 on shell-structured
    data while recall@1 hits 0.97 — coverage is fine, the CODE ranking
    isn't). A 4-tuple ``(codes, scales|None, exact_sq, slot_to_row)`` of
    COMPACT shadow rows (n_rows x D, not block-padded — the padded layout
    is slots/rows x larger and OOMs at 10M) plus an int32 slot->row map;
    the top ``rerank_depth`` ADC candidates per query are re-scored
    exactly against the dequantized shadow (a tiny mapped gather +
    batched matvec, same shape as the int8 tier's bf16 rerank)."""
    from .pq import _decode_bf16

    m = codes.shape[1]
    qc_n = q.shape[0]
    u_count = u.shape[0]
    codes3 = codes.reshape(-1, window, m)
    ids2 = sorted_ids.reshape(-1, window)
    sq2 = sorted_sq.reshape(-1, window)
    sent = codes3.shape[0] - 1          # sentinel list id (rows carry -1)

    def seg_scores(u_s, cdu_s):
        """ADC-score one union segment: (S,) sorted list ids + (qc, S)
        coarse dots -> ((qc, S*window) scores, row ids, global slots)."""
        rows = codes3[u_s].reshape(-1, m)
        rid = ids2[u_s].reshape(-1)
        rsq = sq2[u_s].reshape(-1)
        if pq_w is not None:
            from .pallas_pq import decode as pq_decode_pallas

            dec = pq_decode_pallas(
                tuple(pq_cb.shape), rows, w=pq_w, interpret=interpret
            )                                          # (S*window, D) bf16
        else:
            dec = _decode_bf16(pq_cb, rows)            # (S*window, D)
        qs = qr.astype(dec.dtype)
        dots_r = jnp.dot(qs, dec.T, preferred_element_type=jnp.float32,
                         precision=_matmul_precision(qs))
        dots = jnp.repeat(cdu_s, window, axis=1) + dots_r
        scores = 2.0 * dots - rsq[None, :] if metric == "L2" else dots
        scores = jnp.where(_live_rows(rid, filt)[None, :], scores, NEG_INF)
        slots = (u_s[:, None].astype(jnp.int32) * window
                 + jnp.arange(window, dtype=jnp.int32)[None, :]).reshape(-1)
        return scores, rid, slots

    k_cand = min(max(k, rerank_depth), u_count * window)
    if useg <= 1:
        scores, rid, slots = seg_scores(u, cdu)
        best_v, pos = lax.approx_max_k(scores, k_cand,
                                       recall_target=recall_target)
        pos = pos.astype(jnp.int32)
        best_i = rid[pos]
        best_slot = slots[pos]
    else:
        # Union segmentation: at large nprobe x window the decoded dense
        # rows (U*window*D*4 B) alone can bust the step budget — round 3's
        # 10M config collapsed qc to 8 instead and paid a 50x QPS cliff at
        # nprobe>=32 (SCALE_r03). Stream the union in `useg` segments with
        # a running top-k_cand merge: per-step memory is bounded by the
        # SEGMENT, qc stays at its recall-optimal size, and each union row
        # is still decoded exactly once.
        seg = -(-u_count // useg)
        pad = useg * seg - u_count
        u_p = jnp.concatenate(
            [u, jnp.full((pad,), sent, u.dtype)]) if pad else u
        cdu_p = jnp.concatenate(
            [cdu, jnp.zeros((qc_n, pad), cdu.dtype)], axis=1) if pad else cdu
        u_segs = u_p.reshape(useg, seg)
        cdu_segs = jnp.moveaxis(cdu_p.reshape(qc_n, useg, seg), 1, 0)
        kc_seg = min(k_cand, seg * window)

        def body(carry, xs):
            bv, bs = carry
            scores, _, slots = seg_scores(*xs)
            v_s, pos = lax.approx_max_k(scores, kc_seg,
                                        recall_target=recall_target)
            s_s = slots[pos.astype(jnp.int32)]
            allv = jnp.concatenate([bv, v_s], axis=1)
            alls = jnp.concatenate([bs, s_s], axis=1)
            bv, sel = lax.top_k(allv, k_cand)
            return (bv, jnp.take_along_axis(alls, sel, axis=1)), None

        init = (jnp.full((qc_n, k_cand), NEG_INF, jnp.float32),
                jnp.zeros((qc_n, k_cand), jnp.int32))
        (best_v, best_slot), _ = lax.scan(body, init, (u_segs, cdu_segs))
        best_i = jnp.where(best_v > NEG_INF, sorted_ids[best_slot], -1)
    if shadow is not None:
        # COMPACT refine shadow: (n_rows, D) rows + a slot->row map.
        # Block-padding the D-wide shadow would cost slots/rows x its dense
        # size (17.7 GB vs 7.7 GB at 10M x 384 / window 1408 — an OOM on a
        # 16 GB chip); only the M-byte codes pay the padded layout. Dead
        # slots map to -1 -> clamped to row 0; their scores are re-masked
        # below (best_i == -1 never survives _live_rows).
        s_codes, s_scales, s_sq, s_pos = shadow
        cp = jnp.maximum(s_pos[best_slot], 0)                # (qc, k_cand)
        srows = s_codes[cp].astype(jnp.float32)              # (qc, kc, D)
        if s_scales is not None:
            srows = srows * s_scales[cp][..., None]
        dots = jnp.einsum(
            "qd,qkd->qk", q, srows, preferred_element_type=jnp.float32
        )
        # self-consistent norms (|x̂|² of the dequantized shadow row, NOT
        # the exact stored s_sq): the mixed form's 2·q·(x−x̂) error scales
        # with ‖q‖ and scrambles near-tied neighbors — measured recall@10
        # 0.60 → 0.93 (int8) / 0.98 (bf16) on clustered near-ties
        ssq = jnp.sum(srows * srows, axis=-1)
        sc = 2.0 * dots - ssq if metric == "L2" else dots
        # re-mask: the PartialReduce pads from masked slots when fewer
        # than k_cand candidates are live, and the exact re-score would
        # RESURRECT a filtered/tombstoned row (same as _chunk_body)
        sc = jnp.where(_live_rows(best_i, filt), sc, NEG_INF)
        best_v, sel = lax.top_k(sc, min(k, k_cand))
        best_i = jnp.take_along_axis(best_i, sel, axis=1)
    elif k_cand > k:
        best_v, sel = lax.top_k(best_v, k)
        best_i = jnp.take_along_axis(best_i, sel, axis=1)
    return best_v, best_i


def fused_ivf_search_math(
    q: jax.Array,              # (Nq, D) f32 queries
    centroids: jax.Array,      # (nlist, D) coarse-scan dtype
    cent_sq: jax.Array,        # (nlist,) f32
    codes: jax.Array,          # ((nlist+1)*window, D) block-padded
    scales: Optional[jax.Array],
    sorted_sq: jax.Array,
    sorted_ids: jax.Array,
    spill: Optional[Tuple[jax.Array, ...]],  # (codes, scales|None, sq, ids)
    shadow: Optional[jax.Array] = None,  # bf16 rerank rows (int8 storage)
    filt: Optional[jax.Array] = None,    # (next_id,) bool, True = searchable
    pq: Optional[jax.Array] = None,      # (M, ksub, dsub) codebooks -> codes
    #                                      are ((nlist+1)*window, M) uint8
    pq_w: Optional[jax.Array] = None,    # grouped codebook: Pallas decode
    pq_shadow: Optional[Tuple[jax.Array, ...]] = None,  # (codes, scales|None,
    #                                      exact_sq, slot_to_row) COMPACT
    #                                      refine rows (PQ storage)
    pq_r: Optional[jax.Array] = None,    # (D, D) OPQ rotation: codes encode
    #                                      (x - c)@R, so q·r̂ = (q@R)·dec
    *,
    k: int,
    nprobe: int,
    window: int,
    metric: str,
    recall_target: float,
    union_cap: int,
    qc: int,
    rerank_depth: int = 16,
    union_mode: str = "minrank",
    backend: str = "xla",
    pallas_cap: int = 2,
    pallas_variant: int = 1,
    interpret: bool = False,
    useg: Optional[int] = None,  # PQ union segments (None = auto from the
    #                              step budget; see _pq_union_segments)
) -> Tuple[jax.Array, jax.Array]:
    """Whole-batch fused search; one dispatch. Returns (values, ids) on the
    FINAL scale (L2: squared distance ascending; IP: score descending).

    ``backend="pallas"`` routes the chunk stage through the Pallas fused
    union-scan kernel (ops/pallas_ivf.py; requires full-precision storage).

    Exposed unjitted so the benchmark can wrap THIS function (the shipped
    path) in its checksum-amortized timing harness.
    """
    nlist = centroids.shape[0]
    nq, d = q.shape
    nprobe = min(nprobe, nlist)
    quantized = scales is not None
    qf = q.astype(jnp.float32)
    q_sq = jnp.sum(qf * qf, axis=-1)
    chunkmax = union_mode == "chunkmax" and nlist > _COARSE_APPROX_MIN_NLIST

    # 1. coarse scores for the whole batch (one MXU matmul)
    qcast = qf.astype(centroids.dtype)
    cdots = jnp.dot(
        qcast, centroids.T,
        preferred_element_type=jnp.float32,
        precision=_matmul_precision(qcast),
    )
    cscores = 2.0 * cdots - cent_sq[None, :] if metric == "L2" else cdots

    if chunkmax:
        # CHUNK-AGGREGATE union (the large-nlist fast path): per-query
        # top-k over (Nq, nlist) plus the min-rank compaction cost ~1ms of
        # a ~3ms batch. Instead: normalize each query's scores to its own
        # best (cross-query comparable), sort queries by their argmax cell,
        # then rank lists per CHUNK by the max normalized score any member
        # query gives — ONE exact top-union_cap per chunk (steps x nlist,
        # a handful of rows). A query's own best lists score near 0 by
        # construction, so they survive chunk ranking; outlier queries are
        # protected by the max (a mean would dilute them).
        rel = cscores - jnp.max(cscores, axis=1, keepdims=True)
        top1 = jnp.argmax(cscores, axis=1)
        perm = jnp.argsort(top1, stable=True)
        qp = qf[perm]
        rel_p = rel[perm]
        pad = (-nq) % qc
        if pad:
            qp = jnp.concatenate([qp, jnp.broadcast_to(qp[-1:], (pad, d))])
            rel_p = jnp.concatenate(
                [rel_p, jnp.broadcast_to(rel_p[-1:], (pad, nlist))]
            )
        steps = qp.shape[0] // qc
        chunk_rel = jnp.max(
            rel_p.reshape(steps, qc, nlist), axis=1
        )                                         # (steps, nlist)
        take = min(union_cap, nlist)
        _, u_all = lax.top_k(chunk_rel, take)
        u_all = jnp.sort(u_all.astype(jnp.int32), axis=1)
    else:
        if nlist > _COARSE_APPROX_MIN_NLIST:
            # widen-then-trim: probe misses cost end recall directly
            # (measured -0.3pt@10 at plain rt=0.99) but raising rt to
            # 0.999 is a throughput cliff (PartialReduce degenerates
            # toward a full sort). Selecting nprobe+8 at rt=0.99 and
            # exact-trimming to nprobe gets exact-quality probes at the
            # cheap target's cost.
            cand = min(nlist, nprobe + 8)
            cv, cp = lax.approx_max_k(cscores, cand, recall_target=0.99)
            _, sel = lax.top_k(cv, nprobe)
            probes = jnp.take_along_axis(cp.astype(jnp.int32), sel, axis=1)
        else:
            _, probes = lax.top_k(cscores, nprobe)   # (Nq, nprobe)

        # 2. cell-sort the queries; pad with replicas of the last sorted
        # query (their probes are duplicates — they cost no union slots)
        perm = jnp.argsort(probes[:, 0], stable=True)
        qp = qf[perm]
        pp = probes[perm]
        pad = (-nq) % qc
        if pad:
            qp = jnp.concatenate([qp, jnp.broadcast_to(qp[-1:], (pad, d))])
            pp = jnp.concatenate(
                [pp, jnp.broadcast_to(pp[-1:], (pad, nprobe))]
            )
        steps = qp.shape[0] // qc
        # 3. ALL chunk unions in one batched pass: the per-chunk lexsort
        # chain inside a sequential scan was HALF the search time (measured
        # 3.1ms of 6.2ms per 1024-query batch) — batched, the sorts fuse
        # into a few (steps, qc*nprobe) kernels
        u_all = jax.vmap(
            lambda p: _select_union(p, nlist, union_cap)
        )(pp.reshape(steps, qc, nprobe))             # (steps, U)

    if backend == "pallas":
        # Pallas fused union scan (ops/pallas_ivf.py): the chunk stage —
        # block DMA, per-block MXU matmul, streaming slot-binned selection —
        # runs on-chip; only (qc, cap*window) packed candidates per chunk
        # come back. Shares this function's coarse/union head and
        # spill/finalize tail with the XLA backend.
        from .pallas_ivf import (
            decode_selected, decode_topk, pick_bb, union_scan,
        )

        # direct math-level callers (bench sweeps, sharded tier) bypass the
        # pallas_eligible dispatch guard — fail loud rather than cast f32
        # queries into int8 codes and skip the shadow rerank silently
        if quantized or shadow is not None:
            raise ValueError(
                "backend='pallas' requires full-precision storage "
                "(int8/shadow configs run the XLA backend)"
            )
        if filt is not None:
            raise ValueError(
                "backend='pallas' has no filter operand; filtered "
                "searches run the XLA backend"
            )
        if pq is not None:
            raise ValueError(
                "backend='pallas' has no PQ decode stage; PQ storage "
                "runs the XLA backend"
            )
        bb = pick_bb(window, d, codes.dtype.itemsize, u_all.shape[1])
        u_pad = (-u_all.shape[1]) % bb
        if u_pad:
            u_all = jnp.concatenate([
                u_all,
                jnp.full((steps, u_pad), nlist, jnp.int32),
            ], axis=1)
        qs = qp.astype(codes.dtype).reshape(steps, qc, d)
        # variant 2 with small k: select in-kernel (VMEM-resident
        # candidates; the XLA top_k here was 0.29 ms of the 0.93 ms
        # headline batch) and decode only the emitted pairs
        ktop = k if (pallas_variant == 2
                     and k <= min(16, pallas_cap * window - 1)) else 0
        packed = union_scan(
            qs, u_all,
            codes.reshape(-1, window, d), sorted_sq, sorted_ids,
            window=window, cap=pallas_cap, bb=bb, metric=metric,
            interpret=interpret, variant=pallas_variant, ktop=ktop,
        )
        if ktop:
            vals_p, ids_p = decode_selected(
                packed[0], packed[1], u_all, sorted_ids,
                window=window, k=k)
        else:
            vals_p, ids_p = decode_topk(packed, u_all, sorted_ids,
                                        window=window, k=k)
        inv = jnp.argsort(perm)
        best_v = vals_p[:nq][inv]
        best_i = ids_p[:nq][inv]
        return _spill_and_finalize(
            best_v, best_i, qf, q_sq, spill, quantized, metric, k, nq,
            filt=filt,
        )

    if pq is not None:
        # residual shift: raw q·centroid dots gathered for each chunk's
        # union lists (already computed by the coarse stage); the sentinel
        # list id (== nlist) is clamped — its blocks carry rid -1 and are
        # masked regardless of the gathered value
        cd_p = cdots[perm]
        padq = steps * qc - nq
        if padq:
            cd_p = jnp.concatenate(
                [cd_p, jnp.broadcast_to(cd_p[-1:], (padq, nlist))]
            )
        cd_u = jnp.take_along_axis(
            cd_p.reshape(steps, qc, nlist),
            jnp.minimum(u_all, nlist - 1)[:, None, :],
            axis=2,
        )                                              # (steps, qc, U)
        # union segmentation (see _chunk_body_pq): bound per-step live
        # bytes by streaming the union in segments instead of shrinking qc
        if useg is None:
            useg = _pq_union_segments(u_all.shape[1], window,
                                      codes.shape[1], d, qc)
        body_pq = functools.partial(
            _chunk_body_pq,
            codes=codes, sorted_sq=sorted_sq, sorted_ids=sorted_ids,
            pq_cb=pq, k=k, window=window, metric=metric,
            recall_target=recall_target, rerank_depth=rerank_depth,
            filt=filt, pq_w=pq_w, interpret=interpret, shadow=pq_shadow,
            useg=useg,
        )
        rows_per_chunk = -(-u_all.shape[1] // useg) * window  # per segment
        # live bytes per chunk: gathered codes + gather indices + DECODED
        # dense rows (with headroom for XLA's fusion copies of the decode)
        # + the score matrix
        chunk_bytes = (rows_per_chunk * (codes.shape[1] + 4 + 4 * d)
                       + qc * rows_per_chunk * 4)
        sb_max = int(max(1, min(steps,
                                _VMAP_BYTES_BUDGET // max(chunk_bytes, 1))))
        outer = -(-steps // sb_max)
        sb = -(-steps // outer)
        pad_c = outer * sb - steps
        qr_p = qp @ pq_r if pq_r is not None else qp
        qs = qp.reshape(steps, qc, d)
        qrs = qr_p.reshape(steps, qc, d)
        if pad_c:
            def padc(a):
                return jnp.concatenate(
                    [a, jnp.broadcast_to(a[-1:], (pad_c,) + a.shape[1:])]
                )
            qs, qrs, u_all, cd_u = padc(qs), padc(qrs), padc(u_all), padc(cd_u)
        qs = qs.reshape(outer, sb, qc, d)
        qrs = qrs.reshape(outer, sb, qc, d)
        us = u_all.reshape(outer, sb, -1)
        cds = cd_u.reshape(outer, sb, qc, -1)

        def step_pq(_, xs):
            return None, jax.vmap(body_pq)(xs[0], xs[1], xs[2], xs[3])

        xs = (qs, qrs, us, cds)
        if outer == 1:
            _, (v, i) = step_pq(None, jax.tree.map(lambda a: a[0], xs))
            v, i = v[None], i[None]
        else:
            _, (v, i) = lax.scan(step_pq, None, xs)
        vals_p = v.reshape(outer * sb * qc, -1)
        ids_p = i.reshape(outer * sb * qc, -1)
        inv = jnp.argsort(perm)
        best_v = vals_p[:nq][inv]
        best_i = ids_p[:nq][inv]
        return _spill_and_finalize(
            best_v, best_i, qf, q_sq, spill, quantized, metric, k, nq,
            filt=filt,
        )

    if quantized:
        qp_i8, qp_scale = quantize_rows(qp)
    else:
        qp_i8 = qp_scale = None

    body = functools.partial(
        _chunk_body,
        codes=codes, scales=scales,
        sorted_sq=sorted_sq, sorted_ids=sorted_ids, shadow=shadow,
        k=k, window=window, metric=metric,
        recall_target=recall_target, rerank_depth=rerank_depth, filt=filt,
    )
    # 4. chunks advance as a scan of VMAPPED super-batches: inside one
    # super-batch the gathers/matmuls of several chunks are independent, so
    # the compiler overlaps HBM gathers with MXU work; the outer scan
    # bounds live intermediates
    rows_per_chunk = u_all.shape[1] * window
    chunk_bytes = rows_per_chunk * d * codes.dtype.itemsize \
        + qc * rows_per_chunk * 4
    sb_max = int(max(1, min(steps, _VMAP_BYTES_BUDGET // max(chunk_bytes, 1))))
    outer = -(-steps // sb_max)
    sb = -(-steps // outer)  # even split: sb_max=11 on 16 chunks would pad
    #                          6 wasted replica chunks; 8+8 pads none
    pad_c = outer * sb - steps
    qs = qp.reshape(steps, qc, d)
    if pad_c:
        def padc(a):
            return jnp.concatenate(
                [a, jnp.broadcast_to(a[-1:], (pad_c,) + a.shape[1:])]
            )
        qs, u_all = padc(qs), padc(u_all)
    qs = qs.reshape(outer, sb, qc, d)
    us = u_all.reshape(outer, sb, -1)
    if quantized:
        q8s = qp_i8.reshape(steps, qc, d)
        qss = qp_scale.reshape(steps, qc)
        if pad_c:
            q8s, qss = padc(q8s), padc(qss)
        q8s = q8s.reshape(outer, sb, qc, d)
        qss = qss.reshape(outer, sb, qc)

        def step(_, xs):
            return None, jax.vmap(body)(xs[0], xs[1], xs[2], xs[3])

        xs = (qs, q8s, qss, us)
    else:

        def step(_, xs):
            return None, jax.vmap(
                lambda qcf, u: body(qcf, None, None, u)
            )(xs[0], xs[1])

        xs = (qs, us)
    if outer == 1:
        _, (v, i) = step(None, jax.tree.map(lambda a: a[0], xs))
        v, i = v[None], i[None]
    else:
        _, (v, i) = lax.scan(step, None, xs)
    vals_p = v.reshape(outer * sb * qc, -1)
    ids_p = i.reshape(outer * sb * qc, -1)

    # un-permute back to caller order (internal score scale, higher better)
    inv = jnp.argsort(perm)
    best_v = vals_p[:nq][inv]
    best_i = ids_p[:nq][inv]
    return _spill_and_finalize(
        best_v, best_i, qf, q_sq, spill, quantized, metric, k, nq,
        filt=filt,
    )


def _spill_and_finalize(best_v, best_i, qf, q_sq, spill, quantized, metric,
                        k, nq, filt=None):
    """Shared tail of both chunk backends: spill-tier merge + conversion
    from the internal higher-better scale to the FAISS return scale."""
    # spill tier (window-cap overflow + streaming adds): ONE whole-batch
    # MXU matmul, exact top-k, exact merge
    if spill is not None:
        s_codes, s_scales, s_sq, s_ids = spill
        if quantized:
            qf_i8, qf_scale = quantize_rows(qf)
        else:
            qf_i8 = qf_scale = None
        sscores = _score_rows(
            qf, qf_i8, qf_scale, s_codes, s_scales, s_sq, s_ids, metric,
            filt=filt,
        )
        k_spill = min(k, sscores.shape[1])
        if sscores.shape[1] > 8192:
            # exact top_k over a (Nq, S) score matrix dominates the whole
            # search once the spill tier is large (measured: 28ms/batch at
            # S=380k, ~4x the fused probe cost); PartialReduce selection at
            # a high target keeps the tier's contribution near-exact
            sv, sp = lax.approx_max_k(sscores, k_spill, recall_target=0.999)
            sp = sp.astype(jnp.int32)
        elif k_spill <= 16:
            # sort-based top_k on the (Nq, 1024)-padded spill scores was
            # 0.73 ms of the 1.49 ms headline batch — HALF the search —
            # for 38 live spill rows (benchmarks/pallas_profile.py r04)
            sv, sp = small_topk(sscores, k_spill)
        else:
            sv, sp = lax.top_k(sscores, k_spill)
        si = s_ids[sp]
        best_v, best_i = merge_topk(
            best_v, best_i, sv, si,
            min(k, best_v.shape[1] + k_spill),
        )

    # final scale conversion + k padding
    ok = best_v > NEG_INF
    best_i = jnp.where(ok, best_i, -1)
    if metric == "L2":
        vals = jnp.maximum(q_sq[:, None] - best_v, 0.0)
        vals = jnp.where(ok, vals, jnp.inf)
    else:
        vals = jnp.where(ok, best_v, -jnp.inf)
    if vals.shape[1] < k:
        padk = k - vals.shape[1]
        fill = jnp.inf if metric == "L2" else -jnp.inf
        vals = jnp.concatenate(
            [vals, jnp.full((nq, padk), fill, vals.dtype)], axis=1
        )
        best_i = jnp.concatenate(
            [best_i, jnp.full((nq, padk), -1, jnp.int32)], axis=1
        )
    return vals, best_i


_fused_jit = functools.partial(
    jax.jit,
    static_argnames=(
        "k", "nprobe", "window", "metric", "recall_target", "union_cap",
        "qc", "rerank_depth", "union_mode", "backend", "pallas_cap",
        "pallas_variant", "interpret", "useg",
    ),
)(fused_ivf_search_math)


def fused_ivf_search(
    q: jax.Array,              # (Nq, D)
    centroids: jax.Array,
    cent_sq: jax.Array,
    codes: jax.Array,
    scales: Optional[jax.Array],
    sorted_sq: jax.Array,
    sorted_ids: jax.Array,
    spill: Optional[Tuple[jax.Array, ...]] = None,
    shadow: Optional[jax.Array] = None,
    filt: Optional[jax.Array] = None,
    pq: Optional[jax.Array] = None,
    pq_w: Optional[jax.Array] = None,
    pq_shadow: Optional[Tuple[jax.Array, ...]] = None,
    pq_r: Optional[jax.Array] = None,
    *,
    k: int,
    nprobe: int,
    window: int,
    metric: str = "L2",
    recall_target: float = 0.995,
    union_cap: Optional[int] = None,
    qc: Optional[int] = None,
    rerank_depth: int = 16,
    union_mode: str = "minrank",
    backend: str = "auto",
    pallas_cap: int = 2,
    pallas_variant: int = 1,
) -> Tuple[jax.Array, jax.Array]:
    """Batched fused IVF search over a block-padded index.

    ``backend``: "auto" picks the Pallas union-scan kernel when eligible
    (TPU, full-precision storage, aligned shapes — ops/pallas_ivf.py),
    else the XLA chunk path; "xla" / "pallas" force a choice ("pallas"
    off-TPU runs in interpret mode, for tests). A search filter (``filt``:
    (next_id,) bool, True = searchable — the FAISS ``IDSelector`` analog)
    auto-routes to the XLA backend: the Pallas kernel has no filter
    operand.

    Returns (values, indices), (Nq, k)."""
    nq, dim = q.shape
    nlist = centroids.shape[0]
    # decide from where the index actually lives (a registered TPU
    # plugin may own jax.devices() while the arrays are on CPU)
    try:
        platform = next(iter(codes.devices())).platform
    except Exception:
        platform = jax.devices()[0].platform
    resolved = resolve_fused_dispatch(
        nq=nq, dim=dim, nlist=nlist, window=window,
        code_bytes=jnp.dtype(codes.dtype).itemsize,
        quantized=scales is not None, has_shadow=shadow is not None,
        has_pq=pq is not None, has_filter=filt is not None,
        nprobe=nprobe, union_cap=union_cap, qc=qc, backend=backend,
        platform=platform,
    )
    nprobe, union_cap, qc, backend, interpret = (
        resolved["nprobe"], resolved["union_cap"], resolved["qc"],
        resolved["backend"], resolved["interpret"],
    )
    if pq_w is not None:
        # Pallas PQ decode: interpret mode off-TPU (tests)
        interpret = platform != "tpu"
    # PQ union segmentation is part of the jit cache key (computed here,
    # outside the trace, so a changed step budget re-specializes)
    useg = _pq_union_segments(union_cap, window, codes.shape[1], dim,
                              qc) if pq is not None else None
    return _fused_jit(
        jnp.asarray(q, jnp.float32), centroids, cent_sq, codes, scales,
        sorted_sq, sorted_ids, spill, shadow, filt, pq, pq_w, pq_shadow,
        pq_r,
        k=k, nprobe=nprobe, window=window, metric=metric,
        recall_target=recall_target, union_cap=union_cap, qc=qc,
        rerank_depth=rerank_depth, union_mode=union_mode,
        backend=backend, pallas_cap=pallas_cap,
        pallas_variant=pallas_variant, interpret=interpret,
        useg=useg,
    )
