"""Exact distance computation fused with top-k selection.

This replaces the brute-force scan inside ``faiss.IndexFlatL2.search`` (the
reference's hot loop #3, ``rag_datastore_manager.py:218``; C++ FAISS under a
Python wrapper, ``faiss_store.py:49-81``) with a TPU-native design:

- The distance core is one large matmul ``Q @ DB^T`` that XLA tiles onto the
  MXU. L2 uses the ``||q||^2 - 2 q.db + ||db||^2`` expansion so the FLOPs are
  in the matmul, with fp32 accumulation (``preferred_element_type``) so rank
  order matches FAISS's fp32 exact scan.
- The database axis is processed in fixed-size chunks under ``lax.scan`` with
  a running top-k merge, so the full (Q, N) distance matrix never touches HBM
  (at 1M x 1024 queries that matrix would be 4 GB). Each chunk's matmul and
  its top-k reduction fuse in one XLA loop body.
- A Pallas kernel (ops/pallas_scan.py) implements the same contract with
  explicit VMEM tiling; this module is the reference semantics and the
  fallback path, and both are tested against a numpy oracle.

Conventions: top-k is always selected on an internal "score" where HIGHER is
better (negated L2). Public results return (values, indices) where values are
raw distances for L2 (ascending) and inner products for IP (descending),
matching FAISS return conventions.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

NEG_INF = jnp.finfo(jnp.float32).min


def _matmul_precision(a: jax.Array) -> lax.Precision:
    """fp32 inputs get HIGHEST precision (true fp32 MXU passes) so distances
    and rank order match a CPU fp32 exact scan (FAISS parity); bf16 inputs
    run at native MXU speed with fp32 accumulation."""
    return (
        lax.Precision.HIGHEST
        if a.dtype == jnp.float32
        else lax.Precision.DEFAULT
    )


def sqnorms(db: jax.Array) -> jax.Array:
    """Per-row squared norms, fp32. Precomputed once at index build."""
    dbf = db.astype(jnp.float32)
    return jnp.sum(dbf * dbf, axis=-1)


def pairwise_l2(
    q: jax.Array, db: jax.Array, db_sq: Optional[jax.Array] = None
) -> jax.Array:
    """Squared-L2 distances (Q, N), fp32 accumulation.

    Matches ``faiss.IndexFlatL2`` semantics (squared L2, not rooted).
    """
    if db_sq is None:
        db_sq = sqnorms(db)
    qf = q.astype(jnp.float32)
    q_sq = jnp.sum(qf * qf, axis=-1, keepdims=True)
    # The MXU does the heavy lifting; fp32 accumulation for exactness.
    dots = jnp.dot(q, db.T, preferred_element_type=jnp.float32,
                   precision=_matmul_precision(q))
    d = q_sq - 2.0 * dots + db_sq[None, :]
    return jnp.maximum(d, 0.0)


def pairwise_ip(q: jax.Array, db: jax.Array) -> jax.Array:
    """Inner-product scores (Q, N), fp32 accumulation (IndexFlatIP analog)."""
    return jnp.dot(q, db.T, preferred_element_type=jnp.float32,
                   precision=_matmul_precision(q))


def small_topk(x: jax.Array, k: int) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k along the last axis for SMALL k, as k masked-max passes.

    ``lax.top_k`` lowers to a bitonic sort on TPU, which dominates the
    fused-IVF tail at the 1M headline config: 0.24 ms for the (1024, 512)
    packed-candidate tile and 0.69 ms for the (1024, 1024) spill scores —
    vs ~4·k·n·m elementwise VPU ops here (profiled stage-by-stage in
    benchmarks/pallas_profile.py). Each pass takes the row max, resolves
    ties to the LOWEST index (lax.top_k parity), and masks the winner with
    the dtype's minimum. Exact for any input; intended for k <= ~16 where
    the pass count stays far below sort depth.
    """
    n, m = x.shape
    if k >= m:
        return lax.top_k(x, k)
    sent = (
        jnp.iinfo(x.dtype).min
        if jnp.issubdtype(x.dtype, jnp.integer)
        else jnp.array(-jnp.inf, x.dtype)
    )
    iota = lax.broadcasted_iota(jnp.int32, (n, m), 1)
    cur = x
    vals, idxs = [], []
    for _ in range(k):
        v = jnp.max(cur, axis=1)
        hit = cur == v[:, None]
        i = jnp.min(jnp.where(hit, iota, m), axis=1).astype(jnp.int32)
        vals.append(v)
        idxs.append(i)
        cur = jnp.where(iota == i[:, None], sent, cur)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1)


def merge_topk(
    vals_a: jax.Array, idx_a: jax.Array, vals_b: jax.Array, idx_b: jax.Array, k: int
) -> Tuple[jax.Array, jax.Array]:
    """Merge two candidate sets of top-k (higher-is-better scores).

    Used for the running merge in the chunked scan and for the cross-device
    all-gather merge (parallel/sharded.py).
    """
    vals = jnp.concatenate([vals_a, vals_b], axis=-1)
    idx = jnp.concatenate([idx_a, idx_b], axis=-1)
    best, pos = lax.top_k(vals, k)
    return best, jnp.take_along_axis(idx, pos, axis=-1)


def _chunk_scores(
    q: jax.Array,
    chunk: jax.Array,
    chunk_sq: Optional[jax.Array],
    metric: str,
) -> jax.Array:
    if metric == "L2":
        # Rank by (2 q.db - ||db||^2): ||q||^2 is constant per query and is
        # added back only at the end, halving per-chunk VPU work.
        dots = jnp.dot(q, chunk.T, preferred_element_type=jnp.float32,
                       precision=_matmul_precision(q))
        return 2.0 * dots - chunk_sq[None, :]
    return jnp.dot(q, chunk.T, preferred_element_type=jnp.float32,
                   precision=_matmul_precision(q))


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "chunk_size", "selector", "recall_target"),
)
def _exact_search_impl(
    q: jax.Array,
    db: jax.Array,
    k: int,
    *,
    metric: str,
    db_sq: Optional[jax.Array],
    n_valid: jax.Array,
    chunk_size: int,
    selector: str = "exact",
    recall_target: float = 0.99,
    dead: Optional[jax.Array] = None,  # (N,) bool tombstones (remove_ids)
) -> Tuple[jax.Array, jax.Array]:
    n = db.shape[0]
    nq = q.shape[0]
    k_eff = min(k, n)

    if metric == "L2" and db_sq is None:
        db_sq = sqnorms(db)

    # Pad the DB axis to a multiple of chunk_size for a static scan.
    n_chunks = max(1, -(-n // chunk_size))
    n_pad = n_chunks * chunk_size - n
    if n_pad:
        db = jnp.pad(db, ((0, n_pad), (0, 0)))
        if db_sq is not None:
            db_sq = jnp.pad(db_sq, (0, n_pad))
        if dead is not None:
            dead = jnp.pad(dead, (0, n_pad))

    db_c = db.reshape(n_chunks, chunk_size, db.shape[1])
    sq_c = (
        db_sq.reshape(n_chunks, chunk_size)
        if db_sq is not None
        else jnp.zeros((n_chunks, chunk_size), jnp.float32)
    )
    dead_c = (
        dead.reshape(n_chunks, chunk_size) if dead is not None else None
    )

    init_vals = jnp.full((nq, k_eff), NEG_INF, jnp.float32)
    init_idx = jnp.full((nq, k_eff), -1, jnp.int32)

    def step(carry, inp):
        best_v, best_i = carry
        chunk, chunk_sq, start, chunk_dead = inp
        scores = _chunk_scores(q, chunk, chunk_sq, metric)
        # 1-D column iota: a full (Q, chunk) int32 gidx feeding both the
        # mask and the index take materializes multi-GB intermediates per
        # chunk (measured 3x the whole scan); chunk-local positions turn
        # into global ids AFTER selection as start + cp
        col = lax.iota(jnp.int32, scores.shape[1])
        live = col[None, :] < n_valid - start
        if chunk_dead is not None:
            live = live & ~chunk_dead[None, :]
        scores = jnp.where(live, scores, NEG_INF)
        kc = min(k_eff, chunk_size)  # a chunk can contribute at most its rows
        if selector == "approx":
            # XLA's TPU PartialReduce ANN selection (the ScaNN-style
            # reduction); per-chunk recall>=0.99, cross-chunk merge exact.
            cv, cp = lax.approx_max_k(scores, kc, recall_target=recall_target)
            cp = cp.astype(jnp.int32)
        else:
            cv, cp = lax.top_k(scores, kc)
        ci = start + cp
        return merge_topk(best_v, best_i, cv, ci, k_eff), None

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_size
    xs = (db_c, sq_c, starts, dead_c)
    (best_v, best_i), _ = lax.scan(step, (init_vals, init_idx), xs)

    valid = best_v > NEG_INF
    best_i = jnp.where(valid, best_i, -1)
    if metric == "L2":
        qf = q.astype(jnp.float32)
        q_sq = jnp.sum(qf * qf, axis=-1, keepdims=True)
        dist = jnp.maximum(q_sq - best_v, 0.0)
        dist = jnp.where(valid, dist, jnp.inf)
        values = dist
    else:
        values = jnp.where(valid, best_v, -jnp.inf)

    if k_eff < k:  # corpus smaller than k: pad out to the requested k
        pad_v = jnp.full((nq, k - k_eff), jnp.inf if metric == "L2" else -jnp.inf)
        values = jnp.concatenate([values, pad_v.astype(values.dtype)], axis=-1)
        best_i = jnp.concatenate(
            [best_i, jnp.full((nq, k - k_eff), -1, jnp.int32)], axis=-1
        )
    return values, best_i


def exact_search(
    q: jax.Array,
    db: jax.Array,
    k: int,
    *,
    metric: str = "L2",
    db_sq: Optional[jax.Array] = None,
    n_valid: Optional[int] = None,
    chunk_size: int = 524288,
    selector: str = "exact",
    recall_target: float = 0.99,
    dead: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k scan over ``db`` for a batch of queries.

    The 512k default chunk is measured (docs/PERF.md): fewer selection
    invocations/merges nearly halve per-batch latency vs 128k chunks, while
    a single 1M chunk regresses (score-matrix materialization).

    Args:
      q: (Q, D) queries.
      db: (N, D) database; N may include padding rows past ``n_valid``.
      k: neighbors to return.
      metric: "L2" (squared L2, ascending) or "IP" (descending).
      db_sq: optional precomputed row squared-norms (fp32, shape (N,)).
      n_valid: number of real rows (dynamic — no recompile on streaming adds);
        rows >= n_valid are masked out.
      chunk_size: database rows per scan step (static).
      selector: "exact" (lax.top_k, rank-exact) or "approx"
        (lax.approx_max_k, TPU-optimized selection with per-chunk
        recall@k >= recall_target; the distance computation stays exact).
      recall_target: per-chunk selection recall for selector="approx".
      dead: optional (N,) bool tombstone mask (``remove_ids``); True rows
        are never returned, for both metrics and both selectors.

    Returns:
      (values, indices): (Q, k) raw distances/scores and int32 row indices.
      Invalid slots (k > n_valid) hold index -1, FAISS-style
      (``faiss_store.py:70`` filters idx == -1).
    """
    if metric not in ("L2", "IP"):
        raise ValueError(f"metric must be 'L2' or 'IP', got {metric!r}")
    n = db.shape[0]
    if selector not in ("exact", "approx"):
        raise ValueError(f"selector must be 'exact' or 'approx', got {selector!r}")
    nv = jnp.asarray(n if n_valid is None else n_valid, jnp.int32)
    chunk_size = min(chunk_size, max(1, n))
    return _exact_search_impl(
        q, db, k, metric=metric, db_sq=db_sq, n_valid=nv,
        chunk_size=chunk_size, selector=selector,
        recall_target=recall_target, dead=dead,
    )
