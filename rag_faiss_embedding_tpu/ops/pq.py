"""Product quantization (PQ): codebook training, encode/decode, ADC scan.

TPU-native analog of FAISS's PQ family (``IndexPQ`` / ``IndexIVFPQ`` —
beyond the reference, which never leaves flat fp32 storage,
``faiss_store.py:29``; BASELINE.md's >10M-rows-per-chip memory budgets are
unreachable without sub-byte-per-dim codes).

TPU-first design — PQ is BANDWIDTH COMPRESSION FOR THE MXU, not a CPU
table-addition trick:

- FAISS scans PQ codes by summing M per-subspace lookup tables per row —
  scalar gathers, perfect for CPU caches, hopeless on the MXU. Here the
  scan DECODES codes back to bf16 rows (a (M, ksub, dsub) codebook gather
  that lives in VMEM in the Pallas path) and runs ONE dense matmul per
  chunk. The math is identical to ADC: with reconstruction x̂ and exact
  stored ||x̂||², ``||q - x̂||² = ||q||² - 2 q·x̂ + ||x̂||²`` — the same
  asymmetric distance FAISS's LUT sum computes, via the MXU instead.
- HBM traffic per row is M bytes of codes instead of 2D bytes of bf16
  (16x at D=384, M=48); flat scans are HBM-bound, so compression ratio is
  the speedup ceiling.
- codebook TRAINING is one vmapped Lloyd over all M subspaces at once —
  (M, n, dsub) x (M, ksub, dsub) batched einsums on the MXU — not M
  sequential k-means runs.

Accuracy: pure PQ recall@10 is bounded by code expressiveness (FAISS
IndexPQ behaves the same); pair with a rerank shadow or the IVF-PQ tier's
residual encoding for gated recall.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logging import get_logger
from .distance import NEG_INF, merge_topk

logger = get_logger(__name__)


# ---------------------------------------------------------------- training
@functools.partial(jax.jit, static_argnames=("n_iters",), donate_argnums=(1,))
def _lloyd_batched(
    x: jax.Array,      # (M, n, dsub) f32 training points per subspace
    cents: jax.Array,  # (M, ksub, dsub) f32 initial codebooks
    key: jax.Array,
    n_iters: int,
) -> jax.Array:
    """Lloyd iterations for ALL subspaces at once (MXU-batched)."""
    m, n, dsub = x.shape
    ksub = cents.shape[1]
    x_sq = jnp.sum(x * x, axis=-1)                       # (M, n)

    def step(carry, key_i):
        cents = carry
        c_sq = jnp.sum(cents * cents, axis=-1)           # (M, ksub)
        dots = jnp.einsum(
            "mnd,mkd->mnk", x, cents, preferred_element_type=jnp.float32
        )
        assign = jnp.argmax(2.0 * dots - c_sq[:, None, :], axis=-1)  # (M, n)
        onehot = jax.nn.one_hot(assign, ksub, dtype=jnp.float32)     # (M,n,k)
        sums = jnp.einsum(
            "mnk,mnd->mkd", onehot, x, preferred_element_type=jnp.float32
        )
        counts = jnp.sum(onehot, axis=1)                 # (M, ksub)
        new = sums / jnp.maximum(counts, 1.0)[..., None]
        # empty codewords: re-seed from a random training point with a tiny
        # deterministic perturbation (FAISS's re-init trick)
        ridx = jax.random.randint(key_i, (m, ksub), 0, n)
        jitter = 1e-4 * jax.random.normal(key_i, (m, ksub, dsub))
        reseed = jnp.take_along_axis(x, ridx[..., None], axis=1) + jitter
        new = jnp.where((counts > 0)[..., None], new, reseed)
        return new, None

    keys = jax.random.split(key, n_iters)
    cents, _ = jax.lax.scan(step, cents, keys)
    return cents


def train_pq(
    x: np.ndarray | jax.Array,
    m: int,
    ksub: int = 256,
    n_iters: int = 25,
    seed: int = 0,
    train_sample: int = 65536,
) -> jax.Array:
    """Train per-subspace codebooks. Returns (M, ksub, dsub) f32.

    ``x`` is (N, D) with D divisible by ``m``; training runs on a
    deterministic subsample of up to ``train_sample`` rows (PQ codebooks
    are tiny — 256 codewords per subspace saturate well below 64k rows)."""
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by M={m}")
    if n == 0:
        raise ValueError("cannot train PQ on an empty set")
    ksub = min(ksub, n)
    key = jax.random.PRNGKey(seed)
    if n > train_sample:
        sel = jax.random.choice(key, n, (train_sample,), replace=False)
        x = x[sel]
        n = train_sample
    dsub = d // m
    xs = x.reshape(n, m, dsub).transpose(1, 0, 2)        # (M, n, dsub)
    init_idx = jax.random.choice(
        jax.random.fold_in(key, 1), n, (ksub,), replace=False
    )
    cents = xs[:, init_idx, :]                           # (M, ksub, dsub)
    cents = _lloyd_batched(xs, cents, jax.random.fold_in(key, 2), n_iters)
    logger.debug("trained PQ codebooks M=%d ksub=%d dsub=%d on %d rows",
                 m, ksub, dsub, n)
    return cents


def train_opq(
    x: np.ndarray | jax.Array,
    m: int,
    ksub: int = 256,
    n_iters: int = 25,
    outer_iters: int = 10,
    seed: int = 0,
    train_sample: int = 65536,
) -> Tuple[jax.Array, jax.Array]:
    """OPQ (Ge et al.): learn an orthogonal rotation R that minimizes PQ
    reconstruction error, alternating Procrustes and Lloyd:

      repeat: train codebooks on X@R -> reconstruct X̂ ->
              R = UVᵀ of SVD(XᵀX̂)  (the rotation-side optimum)

    Returns (R (D, D) f32, codebooks trained on the rotated data). Encode
    ``x @ R``; rotations preserve L2/IP, so searches just rotate the query.
    Gains come from cross-subspace correlation/anisotropy — on isotropic
    data OPQ ~= PQ (same as FAISS's OPQMatrix)."""
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by M={m}")
    key = jax.random.PRNGKey(seed)
    if n > train_sample:
        sel = jax.random.choice(key, n, (train_sample,), replace=False)
        x = x[sel]
    r = jnp.eye(d, dtype=jnp.float32)
    cb = None
    for it in range(outer_iters):
        xr = x @ r
        # cheap inner Lloyd while alternating; full train on the last pass
        inner = n_iters if it == outer_iters - 1 else max(4, n_iters // 4)
        cb = train_pq(xr, m, ksub=ksub, n_iters=inner,
                      seed=seed + it, train_sample=train_sample)
        if it == outer_iters - 1:
            break
        codes, _ = pq_encode(cb, xr)
        rec = pq_decode(cb, codes)                       # X̂ in rotated space
        u, _, vt = jnp.linalg.svd(x.T @ rec, full_matrices=False)
        r = u @ vt
    return r, cb


# ----------------------------------------------------------- encode/decode
@functools.partial(jax.jit, static_argnames=())
@jax.jit
def _encode_chunk(codebooks: jax.Array, xc: jax.Array) -> jax.Array:
    m, ksub, dsub = codebooks.shape
    xs = xc.reshape(xc.shape[0], m, dsub).transpose(1, 0, 2)  # (M, c, dsub)
    c_sq = jnp.sum(codebooks * codebooks, axis=-1)            # (M, ksub)

    # sequential over subspaces (lax.map = scan): the one-shot einsum
    # materializes a (M, c, ksub) f32 — 6.4 GB at M=48 / c=131072 — which
    # OOM'd the 10M refine build once the 7.7 GB shadow was resident.
    # Per-step memory is one (c, ksub) tile (~134 MB); jit keeps it a
    # single dispatch through the axon tunnel.
    def one(args):
        xm, cbm, csqm = args                                  # (c, dsub)...
        dots = jnp.dot(xm, cbm.T, preferred_element_type=jnp.float32)
        return jnp.argmax(2.0 * dots - csqm[None, :], axis=-1)

    assign = jax.lax.map(one, (xs, codebooks, c_sq))          # (M, c)
    return assign.T.astype(jnp.uint8)                          # (c, M)


def pq_encode(
    codebooks: jax.Array,
    x: np.ndarray | jax.Array,
    chunk_size: int = 131072,
) -> Tuple[jax.Array, jax.Array]:
    """Encode rows to (N, M) uint8 codes + exact (N,) reconstruction
    squared norms (the ADC identity needs ||x̂||², not ||x||²)."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    codes_parts, sq_parts = [], []
    for start in range(0, n, chunk_size):
        xc = x[start : start + chunk_size]
        cc = _encode_chunk(codebooks, xc)
        codes_parts.append(cc)
        sq_parts.append(jnp.sum(pq_decode(codebooks, cc) ** 2, axis=-1))
    if not codes_parts:
        m = codebooks.shape[0]
        return (jnp.zeros((0, m), jnp.uint8), jnp.zeros((0,), jnp.float32))
    return jnp.concatenate(codes_parts), jnp.concatenate(sq_parts)


def pq_decode(codebooks: jax.Array, codes: jax.Array) -> jax.Array:
    """Reconstruct (N, D) f32 rows from (N, M) codes (one gather per
    subspace, batched over M)."""
    dec = jnp.take_along_axis(
        codebooks,                                        # (M, ksub, dsub)
        codes.astype(jnp.int32).T[:, :, None],            # (M, N, 1)
        axis=1,
    )                                                     # (M, N, dsub)
    return dec.transpose(1, 0, 2).reshape(codes.shape[0], -1)


# ------------------------------------------------------------------ search
def _decode_bf16(codebooks_bf16, codes):
    """(chunk, M) codes -> (chunk, D) reconstruction in the codebook's
    dtype. ROW-MAJOR formulation: one flat gather of (chunk, M) rows from
    the (M*ksub, dsub) codebook table — no (M, chunk, dsub) transposed
    intermediate (the subspace-major layout cost XLA two chunk-sized
    layout copies per step, OOMing the fused IVF-PQ scan)."""
    m, ksub, dsub = codebooks_bf16.shape
    flat_cb = codebooks_bf16.reshape(m * ksub, dsub)
    idx = codes.astype(jnp.int32) + (
        jnp.arange(m, dtype=jnp.int32) * ksub
    )[None, :]                                            # (chunk, M)
    return flat_cb[idx].reshape(codes.shape[0], m * dsub)


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "chunk_size", "selector", "recall_target",
                     "compute_dtype", "interpret"),
)
def pq_search(
    q: jax.Array,            # (Q, D) f32
    codes: jax.Array,        # (N, M) uint8
    codebooks: jax.Array,    # (M, ksub, dsub) f32
    rec_sq: jax.Array,       # (N,) f32 exact ||x̂||²
    k: int,
    *,
    metric: str = "L2",
    n_valid: jax.Array | int = 0,
    chunk_size: int = 524288,
    selector: str = "exact",
    recall_target: float = 0.99,
    dead: Optional[jax.Array] = None,
    compute_dtype: str = "bf16",
    pq_w: Optional[jax.Array] = None,  # grouped codebook -> Pallas decode
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Chunked ADC scan: decode -> one MXU matmul -> running top-k.

    Same contract as ``ops.distance.exact_search`` (L2 returns the squared
    distance TO THE RECONSTRUCTION, ascending; IP returns q·x̂ descending;
    ``dead`` masks tombstoned/filtered rows).

    ``compute_dtype``: "bf16" decodes and multiplies in bf16 at native MXU
    speed (default — the PQ flat scan is compute-bound: codes compress HBM
    traffic, not FLOPs); "f32" is bit-faithful to the f32 ADC identity
    (rank parity with a float ADC oracle — tests, small corpora)."""
    n, m = codes.shape
    nq = q.shape[0]
    k_eff = min(k, max(n, 1))
    qf = q.astype(jnp.float32)
    q_sq = jnp.sum(qf * qf, axis=-1)
    from .distance import _matmul_precision

    if compute_dtype == "bf16":
        cb_s = codebooks.astype(jnp.bfloat16)
        qs = qf.astype(jnp.bfloat16)
    else:
        cb_s = codebooks
        qs = qf
    prec = _matmul_precision(qs)
    n_chunks = max(1, -(-n // chunk_size))
    pad = n_chunks * chunk_size - n
    if pad:
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
        rec_sq = jnp.pad(rec_sq, (0, pad))
        if dead is not None:
            dead = jnp.pad(dead, (0, pad))
    codes_c = codes.reshape(n_chunks, chunk_size, m)
    sq_c = rec_sq.reshape(n_chunks, chunk_size)
    dead_c = dead.reshape(n_chunks, chunk_size) if dead is not None else None

    init = (
        jnp.full((nq, k_eff), NEG_INF, jnp.float32),
        jnp.full((nq, k_eff), -1, jnp.int32),
    )

    def step(carry, inp):
        best_v, best_i = carry
        chunk, sqs, start, chunk_dead = inp
        if pq_w is not None:
            from .pallas_pq import decode as decode_pallas

            dec = decode_pallas(tuple(codebooks.shape), chunk, w=pq_w,
                                interpret=interpret)     # (c, D) bf16
        else:
            dec = _decode_bf16(cb_s, chunk)              # (c, D)
        dots = jnp.dot(qs, dec.T, preferred_element_type=jnp.float32,
                       precision=prec)
        scores = 2.0 * dots - sqs[None, :] if metric == "L2" else dots
        col = jax.lax.iota(jnp.int32, scores.shape[1])
        live = col[None, :] < n_valid - start
        if chunk_dead is not None:
            live = live & ~chunk_dead[None, :]
        scores = jnp.where(live, scores, NEG_INF)
        kc = min(k_eff, chunk_size)
        if selector == "approx":
            cv, cp = jax.lax.approx_max_k(
                scores, kc, recall_target=recall_target
            )
        else:
            cv, cp = jax.lax.top_k(scores, kc)
        ci = cp.astype(jnp.int32) + start
        return merge_topk(best_v, best_i, cv, ci, k_eff), None

    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk_size
    (best_v, best_i), _ = jax.lax.scan(
        step, init, (codes_c, sq_c, starts, dead_c)
    )
    valid = best_v > NEG_INF
    best_i = jnp.where(valid, best_i, -1)
    if metric == "L2":
        vals = jnp.maximum(q_sq[:, None] - best_v, 0.0)
        vals = jnp.where(valid, vals, jnp.inf)
    else:
        vals = jnp.where(valid, best_v, -jnp.inf)
    if k_eff < k:
        fill = jnp.inf if metric == "L2" else -jnp.inf
        vals = jnp.concatenate(
            [vals, jnp.full((nq, k - k_eff), fill, jnp.float32)], axis=1
        )
        best_i = jnp.concatenate(
            [best_i, jnp.full((nq, k - k_eff), -1, jnp.int32)], axis=1
        )
    return vals, best_i
