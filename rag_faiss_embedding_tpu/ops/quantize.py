"""Int8 scalar quantization for the vector index (FAISS SQ8 analog).

TPU rationale: the v5e MXU runs int8 matmuls at 2x bf16 throughput with
int32 accumulation, and int8 storage packs 4x more corpus rows per GB of
HBM than f32 (2x vs bf16) — the cheapest route toward the 1M-QPS/chip
north star for the exact-ish tier.

Scheme: symmetric per-row quantization. Each row r stores
``int8 = round(127 * x / amax_r)`` plus its fp32 scale ``amax_r / 127``.
Query rows are quantized the same way per batch. The L2 expansion uses the
EXACT fp32 row norms (computed pre-quantization), so only the cross term
``q . d`` carries quantization error:

    ||q - d||^2  ≈  ||q||^2 - 2 * sq * sd * <q_i8, d_i8> + ||d||^2

which keeps rank order tight (recall@10 ~= bf16's in practice) while the
matmul runs fully int8 on the MXU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .distance import NEG_INF, merge_topk


def quantize_rows(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(int8 values, fp32 per-row scales). x: (N, D) float."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127).astype(jnp.int8)
    return q, scale[:, 0]


def dequantize(q: jax.Array, scales: jax.Array) -> jax.Array:
    return q.astype(jnp.float32) * scales[:, None]


# int8 scores carry quantization error on top of the approx selection's
# own misses. 0.995 is the best approx operating point (0.999 falls off a
# throughput cliff), but measured honestly at 1024 queries int8+approx
# still sits at ~0.980 recall@10 on mixture data — the quantized cross
# term, not selection, is the binding loss. Use selector="rerank" (exact
# bf16 re-scoring of the approx candidates) when the 0.99 gate matters;
# docs/PERF.md.
DEFAULT_INT8_RECALL_TARGET = 0.995


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "chunk_size", "selector", "recall_target"),
)
def int8_search(
    q_i8: jax.Array,       # (Q, D) int8
    q_scale: jax.Array,    # (Q,) f32
    q_sq: jax.Array,       # (Q,) f32 exact query norms
    db_i8: jax.Array,      # (N, D) int8
    db_scale: jax.Array,   # (N,) f32
    db_sq: jax.Array,      # (N,) f32 exact row norms
    k: int,
    *,
    metric: str,
    n_valid: jax.Array,
    chunk_size: int,
    selector: str = "exact",
    recall_target: float = DEFAULT_INT8_RECALL_TARGET,
    dead: Optional[jax.Array] = None,  # (N,) bool tombstones (remove_ids)
) -> Tuple[jax.Array, jax.Array]:
    """Chunked int8 scan with running top-k; same contract as exact_search."""
    n, d = db_i8.shape
    nq = q_i8.shape[0]
    k_eff = min(k, n)

    n_chunks = max(1, -(-n // chunk_size))
    pad = n_chunks * chunk_size - n
    if pad:
        db_i8 = jnp.pad(db_i8, ((0, pad), (0, 0)))
        db_scale = jnp.pad(db_scale, (0, pad))
        db_sq = jnp.pad(db_sq, (0, pad))
        if dead is not None:
            dead = jnp.pad(dead, (0, pad))
    db_c = db_i8.reshape(n_chunks, chunk_size, d)
    sc_c = db_scale.reshape(n_chunks, chunk_size)
    sq_c = db_sq.reshape(n_chunks, chunk_size)
    dead_c = dead.reshape(n_chunks, chunk_size) if dead is not None else None

    init = (
        jnp.full((nq, k_eff), NEG_INF, jnp.float32),
        jnp.full((nq, k_eff), -1, jnp.int32),
    )

    def step(carry, inp):
        best_v, best_i = carry
        chunk, scales, sqs, start, chunk_dead = inp
        # int8 x int8 -> int32 on the MXU
        dots_i32 = jnp.dot(q_i8, chunk.T, preferred_element_type=jnp.int32)
        dots = dots_i32.astype(jnp.float32) * q_scale[:, None] * scales[None, :]
        if metric == "L2":
            scores = 2.0 * dots - sqs[None, :]
        else:
            scores = dots
        # 1-D column iota: a full (Q, chunk) int32 gidx feeding both the
        # mask and the index take materializes multi-GB intermediates per
        # chunk (measured 3x the whole scan); chunk-local positions turn
        # into global ids AFTER selection as start + cp
        col = lax.iota(jnp.int32, scores.shape[1])
        live = col[None, :] < n_valid - start
        if chunk_dead is not None:
            live = live & ~chunk_dead[None, :]
        scores = jnp.where(live, scores, NEG_INF)
        kc = min(k_eff, chunk_size)
        if selector == "approx":
            cv, cp = lax.approx_max_k(scores, kc, recall_target=recall_target)
            cp = cp.astype(jnp.int32)
        else:
            cv, cp = lax.top_k(scores, kc)
        ci = start + cp
        return merge_topk(best_v, best_i, cv, ci, k_eff), None

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_size
    (best_v, best_i), _ = lax.scan(
        step, init, (db_c, sc_c, sq_c, starts, dead_c)
    )

    valid = best_v > NEG_INF
    best_i = jnp.where(valid, best_i, -1)
    if metric == "L2":
        dist = jnp.maximum(q_sq[:, None] - best_v, 0.0)
        values = jnp.where(valid, dist, jnp.inf)
    else:
        values = jnp.where(valid, best_v, -jnp.inf)
    if k_eff < k:
        fill = jnp.inf if metric == "L2" else -jnp.inf
        values = jnp.concatenate(
            [values, jnp.full((nq, k - k_eff), fill, values.dtype)], axis=-1
        )
        best_i = jnp.concatenate(
            [best_i, jnp.full((nq, k - k_eff), -1, jnp.int32)], axis=-1
        )
    return values, best_i


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "chunk_size", "cand_per_chunk", "recall_target"
    ),
)
def int8_rerank_search(
    q: jax.Array,          # (Q, D) float — full-precision queries for rerank
    q_i8: jax.Array,       # (Q, D) int8
    q_scale: jax.Array,    # (Q,) f32
    q_sq: jax.Array,       # (Q,) f32 exact query norms
    db_i8: jax.Array,      # (N, D) int8
    db_scale: jax.Array,   # (N,) f32
    db_sq: jax.Array,      # (N,) f32 exact row norms
    shadow: Optional[jax.Array],  # (N, D) bf16 rerank copy, or None
    k: int,
    *,
    metric: str,
    n_valid: jax.Array,
    chunk_size: int,
    cand_per_chunk: int,
    recall_target: float = 0.99,
    dead: Optional[jax.Array] = None,  # (N,) bool tombstones (remove_ids)
) -> Tuple[jax.Array, jax.Array]:
    """Two-stage retrieve-then-rerank over SQ8 storage.

    Stage 1 scans the int8 codes chunk by chunk and keeps each chunk's
    approx top-``cand_per_chunk`` WITHOUT a cross-chunk merge — the merge is
    what forces k-wide selection per chunk; deferring ranking keeps the
    selection cheap. Stage 2 gathers the n_chunks*cand_per_chunk candidate
    rows (from the bf16 ``shadow`` if given, else dequantized int8 codes)
    and reranks them exactly against the full-precision query, restoring
    the recall the quantized cross term loses.
    """
    n, d = db_i8.shape
    nq = q_i8.shape[0]

    n_chunks = max(1, -(-n // chunk_size))
    pad = n_chunks * chunk_size - n
    if pad:
        db_i8 = jnp.pad(db_i8, ((0, pad), (0, 0)))
        db_scale = jnp.pad(db_scale, (0, pad))
        db_sq = jnp.pad(db_sq, (0, pad))
        if dead is not None:
            dead = jnp.pad(dead, (0, pad))
    db_c = db_i8.reshape(n_chunks, chunk_size, d)
    sc_c = db_scale.reshape(n_chunks, chunk_size)
    sq_c = db_sq.reshape(n_chunks, chunk_size)
    dead_c = dead.reshape(n_chunks, chunk_size) if dead is not None else None
    kc = min(cand_per_chunk, chunk_size)

    def step(_, inp):
        chunk, scales, sqs, start, chunk_dead = inp
        dots_i32 = jnp.dot(q_i8, chunk.T, preferred_element_type=jnp.int32)
        dots = dots_i32.astype(jnp.float32) * q_scale[:, None] * scales[None, :]
        scores = 2.0 * dots - sqs[None, :] if metric == "L2" else dots
        # 1-D column iota: a full (Q, chunk) int32 gidx feeding both the
        # mask and the index take materializes multi-GB intermediates per
        # chunk (measured 3x the whole scan); chunk-local positions turn
        # into global ids AFTER selection as start + cp
        col = lax.iota(jnp.int32, scores.shape[1])
        live = col[None, :] < n_valid - start
        if chunk_dead is not None:
            live = live & ~chunk_dead[None, :]
        scores = jnp.where(live, scores, NEG_INF)
        _, cp = lax.approx_max_k(scores, kc, recall_target=recall_target)
        return None, cp.astype(jnp.int32) + start

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_size
    _, cand_ids = lax.scan(
        step, None, (db_c, sc_c, sq_c, starts, dead_c)
    )
    # (n_chunks, Q, kc) -> (Q, n_chunks*kc); chunks are disjoint row ranges,
    # so candidate ids are unique (invalid ones are masked below)
    cand_ids = jnp.transpose(cand_ids, (1, 0, 2)).reshape(nq, -1)

    cand_valid = cand_ids < n_valid
    if dead is not None:
        # the exact stage-2 re-score would otherwise RESURRECT a tombstoned
        # row that slipped into the candidate set (stage 1 only sees its
        # NEG_INF-masked score when the chunk had spare candidate slots)
        cand_valid = cand_valid & ~dead[jnp.minimum(cand_ids, n - 1)]
    safe_ids = jnp.where(cand_valid, cand_ids, 0)
    if shadow is not None:
        cand_rows = shadow[safe_ids].astype(jnp.float32)   # (Q, C, D)
    else:
        cand_rows = (
            db_i8[safe_ids].astype(jnp.float32)
            * db_scale[safe_ids][..., None]
        )
    # self-consistent norms: L2-score with the candidate row's OWN norm
    # |x̂|², not the exact stored ‖x‖². Mixing exact norms with quantized
    # dots leaves a 2·q·(x−x̂) error (∝ ‖q‖) on every candidate — larger
    # than the gaps between near-tied neighbors, which is exactly what the
    # rerank exists to resolve. With |x̂|² the ranking error is
    # 2·(q−x)·(x−x̂) (∝ the neighbor distance): measured recall@10 on
    # near-tied clusters 0.60 → 0.93 (int8) / 0.98 (bf16)
    # (tests/test_pq.py::test_ivfpq_refine_beats_pure_adc).
    cand_sq = jnp.sum(cand_rows * cand_rows, axis=-1)      # (Q, C) |x̂|²
    qf = q.astype(jnp.float32)
    dots = jnp.einsum(
        "qd,qcd->qc", qf, cand_rows, preferred_element_type=jnp.float32
    )
    scores = 2.0 * dots - cand_sq if metric == "L2" else dots
    scores = jnp.where(cand_valid, scores, NEG_INF)

    k_eff = min(k, scores.shape[1])
    best, pos = lax.top_k(scores, k_eff)
    best_i = jnp.take_along_axis(cand_ids, pos, axis=1)
    valid = best > NEG_INF
    best_i = jnp.where(valid, best_i, -1)
    if metric == "L2":
        dist = jnp.maximum(q_sq[:, None] - best, 0.0)
        values = jnp.where(valid, dist, jnp.inf)
    else:
        values = jnp.where(valid, best, -jnp.inf)
    if k_eff < k:
        fill = jnp.inf if metric == "L2" else -jnp.inf
        values = jnp.concatenate(
            [values, jnp.full((nq, k - k_eff), fill, values.dtype)], axis=-1
        )
        best_i = jnp.concatenate(
            [best_i, jnp.full((nq, k - k_eff), -1, jnp.int32)], axis=-1
        )
    return values, best_i
