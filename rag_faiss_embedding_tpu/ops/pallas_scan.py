"""Pallas fused distance + top-k flat-scan kernel.

The performance core of the flat index (SURVEY.md §7 "hard parts": fuse the
top-k selection into the distance kernel so the (Q, N) distance matrix never
round-trips HBM). Replaces FAISS's C++ brute-force scan
(``faiss_store.py:49``, ``rag_datastore_manager.py:218``) with a TPU kernel:

Grid: (Q tiles, DB tiles), DB innermost. Each step
  1. loads a (TILE_Q, D) query tile and a (TILE_N, D) database tile into VMEM,
  2. computes the (TILE_Q, TILE_N) score tile on the MXU
     (L2 ranks by ``2 q.db - ||db||^2``; IP by the raw dot product),
  3. extracts the tile-local top-k by iterative masked argmax (k passes on
     the VPU — negligible next to the 2*TILE_Q*TILE_N*D matmul FLOPs),
  4. merges into a running (TILE_Q, K) best-list kept in VMEM scratch that
     persists across the DB-tile axis of the grid.

Only (Q, K) values+indices ever leave the chip. Ties break toward the lower
database index, matching FAISS and ops/distance.py.

The jnp chunked scan (ops/distance.py) is the reference semantics; this
kernel is tested for exact agreement against it and runs in interpret mode
off-TPU.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .distance import NEG_INF, sqnorms

_INT_MAX = jnp.iinfo(jnp.int32).max

DEFAULT_TILE_Q = 256
DEFAULT_TILE_N = 1024


def _round_up(x: int, m: int) -> int:
    return max(m, -(-x // m) * m)


def _monotone_i32(scores):
    """Order-preserving f32 -> int32 map.

    Standard sortable-float trick lands in uint32; Mosaic has no unsigned
    reductions on TPU, so the top bit is flipped once more to translate the
    unsigned order into signed int32 order (u ^ 0x80000000 as int32).
    Net effect: negatives get all-but-top bits flipped, positives pass
    through — i.e. int32 max == f32 max.
    """
    bits = pltpu.bitcast(scores, jnp.int32)
    # negatives: flip all magnitude bits (keeps sign bit -> stays below all
    # positives, reverses the descending magnitude order); positives: as-is
    return jnp.where(bits < 0, bits ^ jnp.int32(0x7FFFFFFF), bits)


def _extract_topk(scores, gidx, k: int):
    """Iterative masked argmax: k (value, index) pairs, ties -> lowest index.

    ``scores``: (Q, T) fp32, ``gidx``: (Q, T) int32 global row ids.
    """
    vals = []
    idxs = []
    s = scores
    for _ in range(k):
        m = jnp.max(s, axis=1, keepdims=True)                    # (Q, 1)
        sel = jnp.min(jnp.where(s == m, gidx, _INT_MAX), axis=1)  # (Q,)
        vals.append(m[:, 0])
        idxs.append(sel)
        s = jnp.where(gidx == sel[:, None], NEG_INF, s)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1)       # (Q, k)


def _scan_kernel(
    n_valid_ref,  # SMEM (1, 1) int32
    q_ref,        # VMEM (TILE_Q, D)
    db_ref,       # VMEM (TILE_N, D)
    db_sq_ref,    # VMEM (1, TILE_N)
    out_v_ref,    # VMEM (TILE_Q, K)
    out_i_ref,    # VMEM (TILE_Q, K)
    best_v,       # scratch VMEM (TILE_Q, K)
    best_i,       # scratch VMEM (TILE_Q, K)
    *,
    k: int,
    metric: str,
    tile_n: int,
    precision,
):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        best_v[:] = jnp.full_like(best_v, NEG_INF)
        best_i[:] = jnp.full_like(best_i, -1)

    dots = jnp.dot(
        q_ref[:], db_ref[:].T,
        preferred_element_type=jnp.float32, precision=precision,
    )
    if metric == "L2":
        scores = 2.0 * dots - db_sq_ref[0, :][None, :]
    else:
        scores = dots
    start = j * tile_n
    gidx = start + lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(gidx < n_valid_ref[0, 0], scores, NEG_INF)

    tile_v, tile_i = _extract_topk(scores, gidx, k)

    # merge running best (Q, K) with tile best (Q, K) -> top K of 2K
    cand_v = jnp.concatenate([best_v[:], tile_v], axis=1)
    cand_i = jnp.concatenate([best_i[:], tile_i], axis=1)
    # tie-break safety: invalid (-1) slots carry NEG_INF values, and merged
    # index selection must prefer the lower *database* index, so map -1 to
    # INT_MAX during selection
    sel_idx = jnp.where(cand_i < 0, _INT_MAX, cand_i)
    merged_v, merged_sel = _extract_topk(cand_v, sel_idx, k)
    best_v[:] = merged_v
    best_i[:] = jnp.where(merged_sel == _INT_MAX, -1, merged_sel)

    @pl.when(j == nj - 1)
    def _():
        out_v_ref[:] = best_v[:]
        out_i_ref[:] = best_i[:]


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "tile_q", "tile_n", "interpret"),
)
def _flat_search_impl(
    q, db, db_sq, n_valid, *, k, metric, tile_q, tile_n, interpret,
):
    nq, d = q.shape
    n = db.shape[0]
    n_qt = nq // tile_q
    n_dt = n // tile_n
    precision = (
        lax.Precision.HIGHEST if q.dtype == jnp.float32 else lax.Precision.DEFAULT
    )
    kernel = functools.partial(
        _scan_kernel, k=k, metric=metric, tile_n=tile_n, precision=precision,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_qt, n_dt),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_q, d), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_n, d), lambda i, j: (j, 0)),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((tile_q, k), lambda i, j: (i, 0)),
            pl.BlockSpec((tile_q, k), lambda i, j: (i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_q, k), jnp.float32),
            pltpu.VMEM((tile_q, k), jnp.int32),
        ],
    )
    out_v, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((nq, k), jnp.float32),
            jax.ShapeDtypeStruct((nq, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * nq * n * d,
            bytes_accessed=n * d * db.dtype.itemsize + nq * d * 4 + nq * k * 8,
            transcendentals=0,
        ),
        interpret=interpret,
    )(jnp.reshape(n_valid.astype(jnp.int32), (1, 1)), q, db, db_sq[None, :])
    return out_v, out_i


def flat_search(
    q: jax.Array,
    db: jax.Array,
    k: int,
    *,
    metric: str = "L2",
    db_sq: Optional[jax.Array] = None,
    n_valid: Optional[int] = None,
    tile_q: int = DEFAULT_TILE_Q,
    tile_n: int = DEFAULT_TILE_N,
    interpret: Optional[bool] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Fused top-k scan (rank-exact iterative masked-argmax selection);
    same contract as ops.distance.exact_search.

    A per-group packed top-1 "approx" mode existed through round 2 but
    never shipped: it lost to ``lax.approx_max_k`` at the flat tier
    (docs/STATUS.md round-2 §3) — the flat scan is matmul-bound, so
    cheaper selection buys little — and the slot-binned streaming design
    that DOES win lives in the IVF union kernel (ops/pallas_ivf.py).
    Dropped per the round-2 review (fix-or-delete).
    """
    if metric not in ("L2", "IP"):
        raise ValueError(f"metric must be 'L2' or 'IP', got {metric!r}")
    n, d = db.shape
    nq = q.shape[0]
    if db_sq is None:
        db_sq = sqnorms(db) if metric == "L2" else jnp.zeros((n,), jnp.float32)
    nv = jnp.asarray(n if n_valid is None else n_valid, jnp.int32)
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    k_eff = min(k, n)
    tile_q = min(tile_q, _round_up(nq, 8))
    tile_n = min(tile_n, _round_up(n, 128))

    # pad queries and database rows to tile multiples
    nq_pad = _round_up(nq, tile_q) - nq
    n_pad = _round_up(n, tile_n) - n
    if nq_pad:
        q = jnp.pad(q, ((0, nq_pad), (0, 0)))
    if n_pad:
        db = jnp.pad(db, ((0, n_pad), (0, 0)))
        db_sq = jnp.pad(db_sq, (0, n_pad))

    best_v, best_i = _flat_search_impl(
        q, db, db_sq, nv,
        k=k_eff, metric=metric, tile_q=tile_q, tile_n=tile_n,
        interpret=interpret,
    )
    best_v, best_i = best_v[:nq], best_i[:nq]

    valid = best_i >= 0
    if metric == "L2":
        qf = q[:nq].astype(jnp.float32)
        q_sq = jnp.sum(qf * qf, axis=-1, keepdims=True)
        values = jnp.maximum(q_sq - best_v, 0.0)
        values = jnp.where(valid, values, jnp.inf)
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
