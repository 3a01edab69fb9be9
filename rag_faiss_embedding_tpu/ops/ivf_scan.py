"""Fused batched IVF search: coarse quantize + union probe scan in ONE jit.

This is the IVF fast path (the per-query windowed gather in
``index/ivf.py:probe_scan_math`` is the semantics reference and the
small-batch fallback). It replaces ``faiss.IndexIVFFlat.search``
(BASELINE.md config #3; the reference itself never gets past
``faiss.IndexFlatL2``, ``faiss_store.py:29``) with a TPU-first design:

Why the per-query path is slow on TPU: each query gathers its own
(nprobe, window, D) block and scores it with an einsum whose contraction is
a batch of M=1 GEMVs — the MXU runs at a tiny fraction of peak, and the
gather traffic is paid per query. Measured round 1: 12.8k QPS at 1M x 384
vs 394k for the flat int8 scan it is supposed to beat.

The fused design amortizes over a query CHUNK (``qc`` queries):

1. coarse: one (qc, nlist) matmul + ``lax.top_k`` -> probe lists per query;
2. union: the qc*nprobe probed list ids are sorted and deduplicated
   (duplicates -> a sentinel list of length 0), giving U monotone list
   slots — one gather of U fixed-size windows (U*window rows, ascending
   offsets = near-sequential HBM reads);
3. score: ONE (qc, D) x (D, U*window) matmul on the MXU — int8 codes run
   with int32 accumulation at 2x bf16 throughput; every query is scored
   against the whole union, a SUPERSET of its own probed lists, so recall
   is >= the per-query window path by construction (distances are exact);
4. select: ``lax.approx_max_k`` over the union scores (XLA's TPU
   PartialReduce selection), then an optional fused scan over the spill
   tier (rows past the window cap + streaming adds) merged exactly.

Everything — coarse scan, gather, matmul, selection, spill merge — runs in
one jitted program; large query batches ``lax.scan`` over chunks inside
that same program, so per-dispatch overhead is paid once per BATCH, not
once per stage per chunk.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .distance import NEG_INF, _matmul_precision, merge_topk
from .quantize import quantize_rows

# Per-step HBM budget for the two big intermediates (gathered rows and the
# (qc, U*window) score matrix). Conservative: v5e has 16 GB HBM and the
# database itself can be most of it.
_STEP_BYTES_BUDGET = 1 << 30


def pick_query_chunk(
    nprobe: int, window: int, dim: int, code_bytes: int, n_queries: int
) -> int:
    """Largest power-of-two query chunk whose per-step intermediates fit.

    Rows gathered per step = qc * nprobe * window (before dedup); the score
    matrix adds qc * rows * 4 bytes. Bigger chunks amortize selection and
    dispatch but scan a bigger union per query (cost/query grows ~linearly
    with qc), so the chunk is also capped at 256.
    """
    qc = 256
    while qc > 8:
        rows = qc * nprobe * window
        step_bytes = rows * dim * code_bytes + qc * rows * 4
        if step_bytes <= _STEP_BYTES_BUDGET:
            break
        qc //= 2
    return max(8, min(qc, max(8, n_queries)))


def _union_lists(probes: jax.Array, nlist: int) -> jax.Array:
    """Sorted, deduplicated probe list ids; duplicates -> sentinel ``nlist``.

    Sorting makes the subsequent window gather walk HBM in ascending-offset
    order; the sentinel indexes the extra (offset=anywhere, length=0) slot
    appended to offsets/lengths, so its window is fully masked.
    """
    flat = jnp.sort(probes.reshape(-1).astype(jnp.int32))
    dup = jnp.concatenate(
        [jnp.zeros((1,), bool), flat[1:] == flat[:-1]]
    )
    return jnp.where(dup, jnp.int32(nlist), flat)


def _chunk_body(
    q: jax.Array,              # (qc, D) f32
    centroids: jax.Array,      # (nlist, D) storage dtype
    cent_sq: jax.Array,        # (nlist,) f32
    codes: jax.Array,          # (Npad, D) int8 / bf16 / f32, cluster-sorted
    scales: Optional[jax.Array],   # (Npad,) f32 for int8 codes, else None
    sorted_sq: jax.Array,      # (Npad,) f32 exact row norms
    sorted_ids: jax.Array,     # (Npad,) int32, -1 past live data
    offsets_ext: jax.Array,    # (nlist+1,) int32 (sentinel slot appended)
    lengths_ext: jax.Array,    # (nlist+1,) int32 (sentinel length 0)
    spill: Optional[Tuple[jax.Array, ...]],  # (codes, scales|None, sq, ids)
    *,
    k: int,
    nprobe: int,
    window: int,
    metric: str,
    recall_target: float,
) -> Tuple[jax.Array, jax.Array]:
    """Search one query chunk. Returns (values, ids) on the FINAL scale
    (L2: squared distance ascending; IP: score descending)."""
    nlist = centroids.shape[0]
    qc = q.shape[0]
    quantized = scales is not None

    qf = q.astype(jnp.float32)
    q_sq = jnp.sum(qf * qf, axis=-1)  # (qc,)

    # 1. coarse top-nprobe (internal score: higher is better)
    qc_cast = qf.astype(centroids.dtype)
    cdots = jnp.dot(
        qc_cast, centroids.T,
        preferred_element_type=jnp.float32,
        precision=_matmul_precision(qc_cast),
    )
    cscores = 2.0 * cdots - cent_sq[None, :] if metric == "L2" else cdots
    _, probes = lax.top_k(cscores, nprobe)  # (qc, nprobe)

    # 2. union of probed lists -> one windowed gather
    u = _union_lists(probes, nlist)               # (qc*nprobe,)
    starts = offsets_ext[u]                       # (U,)
    lens = lengths_ext[u]                         # (U,)
    slot = jnp.arange(window, dtype=jnp.int32)
    idx = starts[:, None] + slot[None, :]         # (U, window)
    valid = slot[None, :] < lens[:, None]
    idx = jnp.where(valid, idx, 0).reshape(-1)    # (R,)

    rows = codes[idx]                             # (R, D)
    rsq = sorted_sq[idx]                          # (R,)
    rid = jnp.where(valid.reshape(-1), sorted_ids[idx], -1)

    # 3. one MXU matmul for the whole chunk x union
    if quantized:
        q_i8, q_scale = quantize_rows(qf)
        dots_i32 = jnp.dot(q_i8, rows.T, preferred_element_type=jnp.int32)
        dots = (
            dots_i32.astype(jnp.float32)
            * q_scale[:, None]
            * scales[idx][None, :]
        )
    else:
        q_cast = qf.astype(codes.dtype)
        dots = jnp.dot(
            q_cast, rows.T,
            preferred_element_type=jnp.float32,
            precision=_matmul_precision(q_cast),
        )
    scores = 2.0 * dots - rsq[None, :] if metric == "L2" else dots
    scores = jnp.where(rid[None, :] >= 0, scores, NEG_INF)

    # 4. select; spill tier (capped-window overflow + streaming adds) is
    # scanned exactly and merged on the same internal score scale
    k_union = min(k, scores.shape[1])
    best_v, pos = lax.approx_max_k(scores, k_union,
                                   recall_target=recall_target)
    best_i = rid[pos.astype(jnp.int32)]

    if spill is not None:
        s_codes, s_scales, s_sq, s_ids = spill
        if quantized:
            sdots = jnp.dot(q_i8, s_codes.T,
                            preferred_element_type=jnp.int32)
            sdots = (
                sdots.astype(jnp.float32)
                * q_scale[:, None]
                * s_scales[None, :]
            )
        else:
            qs_cast = qf.astype(s_codes.dtype)
            sdots = jnp.dot(
                qs_cast, s_codes.T,
                preferred_element_type=jnp.float32,
                precision=_matmul_precision(qs_cast),
            )
        sscores = 2.0 * sdots - s_sq[None, :] if metric == "L2" else sdots
        sscores = jnp.where(s_ids[None, :] >= 0, sscores, NEG_INF)
        k_spill = min(k, sscores.shape[1])
        sv, sp = lax.top_k(sscores, k_spill)
        si = s_ids[sp]
        best_v, best_i = merge_topk(
            best_v, best_i, sv, si, min(k, k_union + k_spill)
        )

    ok = best_v > NEG_INF
    best_i = jnp.where(ok, best_i, -1)
    if metric == "L2":
        vals = jnp.maximum(q_sq[:, None] - best_v, 0.0)
        vals = jnp.where(ok, vals, jnp.inf)
    else:
        vals = jnp.where(ok, best_v, -jnp.inf)
    if vals.shape[1] < k:  # tiny union/corpus: pad out to the requested k
        pad = k - vals.shape[1]
        fill = jnp.inf if metric == "L2" else -jnp.inf
        vals = jnp.concatenate(
            [vals, jnp.full((qc, pad), fill, vals.dtype)], axis=1
        )
        best_i = jnp.concatenate(
            [best_i, jnp.full((qc, pad), -1, jnp.int32)], axis=1
        )
    return vals, best_i


def fused_ivf_search_math(
    qstack: jax.Array,         # (steps, qc, D) f32 query chunks
    centroids: jax.Array,
    cent_sq: jax.Array,
    codes: jax.Array,
    scales: Optional[jax.Array],
    sorted_sq: jax.Array,
    sorted_ids: jax.Array,
    offsets_ext: jax.Array,
    lengths_ext: jax.Array,
    spill: Optional[Tuple[jax.Array, ...]],
    *,
    k: int,
    nprobe: int,
    window: int,
    metric: str,
    recall_target: float,
) -> Tuple[jax.Array, jax.Array]:
    """lax.scan over query chunks; one dispatch for the whole batch.

    Exposed unjitted so the benchmark can wrap THIS function (the shipped
    path) in its checksum-amortized timing harness.
    """
    body = functools.partial(
        _chunk_body,
        centroids=centroids, cent_sq=cent_sq, codes=codes, scales=scales,
        sorted_sq=sorted_sq, sorted_ids=sorted_ids,
        offsets_ext=offsets_ext, lengths_ext=lengths_ext, spill=spill,
        k=k, nprobe=nprobe, window=window, metric=metric,
        recall_target=recall_target,
    )
    if qstack.shape[0] == 1:
        v, i = body(qstack[0])
        return v[None], i[None]

    def step(_, q):
        return None, body(q)

    _, (vals, ids) = lax.scan(step, None, qstack)
    return vals, ids


_fused_jit = functools.partial(
    jax.jit,
    static_argnames=("k", "nprobe", "window", "metric", "recall_target"),
)(fused_ivf_search_math)


def fused_ivf_search(
    q: jax.Array,              # (Nq, D)
    centroids: jax.Array,
    cent_sq: jax.Array,
    codes: jax.Array,
    scales: Optional[jax.Array],
    sorted_sq: jax.Array,
    sorted_ids: jax.Array,
    offsets_ext: jax.Array,
    lengths_ext: jax.Array,
    spill: Optional[Tuple[jax.Array, ...]] = None,
    *,
    k: int,
    nprobe: int,
    window: int,
    metric: str = "L2",
    recall_target: float = 0.995,
    qc: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Batched fused IVF search. Returns (values, indices), (Nq, k).

    ``q`` is padded to a multiple of the query chunk ``qc`` (budget-picked
    when not given) and processed by one jitted scan.
    """
    nq, dim = q.shape
    if qc is None:
        qc = pick_query_chunk(
            nprobe, window, dim, jnp.dtype(codes.dtype).itemsize, nq
        )
    pad = (-nq) % qc
    qf = q.astype(jnp.float32)
    if pad:
        qf = jnp.pad(qf, ((0, pad), (0, 0)))
    qstack = qf.reshape(-1, qc, dim)
    vals, ids = _fused_jit(
        qstack, centroids, cent_sq, codes, scales, sorted_sq, sorted_ids,
        offsets_ext, lengths_ext, spill,
        k=k, nprobe=nprobe, window=window, metric=metric,
        recall_target=recall_target,
    )
    vals = vals.reshape(-1, vals.shape[-1])[:nq]
    ids = ids.reshape(-1, ids.shape[-1])[:nq]
    return vals, ids
