"""Decompose the unpack stage (probe2 found it costs 9.7 of 10 ms).

  topk_f32    exact lax.top_k over (4096, 512) f32
  topk_i32    exact lax.top_k over (4096, 512) int32 (packed order)
  gather_ids  sorted_ids[...] random gather at candidate width
  take_blk    take_along_axis over u_all at candidate width
  unmono      the bit-twiddle + where chain at candidate width
  unpack_v2   top-k FIRST on packed int32, decode only the k winners

Run: PYTHONPATH=. python benchmarks/pallas_kernel_probe3.py
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rag_faiss_embedding_tpu.ops.distance import NEG_INF
from rag_faiss_embedding_tpu.ops.pallas_ivf import _unmonotone_f32

NLIST, WINDOW = 8192, 256
QC, U, CAP, K = 256, 260, 2, 10
CHUNKS, REPS = 4, 8
NQ = CHUNKS * QC
CW = CAP * WINDOW
NBITS, MASK = 9, (1 << 9) - 1

key = jax.random.PRNGKey(0)
packed_all = jax.random.randint(key, (REPS, CHUNKS, QC, CW), 0, 1 << 30,
                                jnp.int32)
fvals_all = jax.random.normal(jax.random.fold_in(key, 1),
                              (REPS, NQ, CW), jnp.float32)
idx_all = jax.random.randint(jax.random.fold_in(key, 2),
                             (REPS, NQ, CW), 0, (NLIST + 1) * WINDOW,
                             jnp.int32)
sorted_ids = jnp.arange((NLIST + 1) * WINDOW, dtype=jnp.int32)
u_all = jnp.stack([
    jnp.sort(jax.random.permutation(jax.random.fold_in(key, 10 + c),
                                    NLIST)[:U].astype(jnp.int32))
    for c in range(CHUNKS)
])
jax.block_until_ready((packed_all, fvals_all, idx_all, sorted_ids, u_all))
trivial = jax.jit(lambda x: x.sum())
float(trivial(u_all))


def timed(fn, *args):
    jax.block_until_ready(fn(*args))
    rtts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(trivial(u_all))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return max((best - rtt) / REPS, 1e-9)


def scan_over(fn, xs_args, static_args=()):
    @jax.jit
    def many(*args):
        xs = args[: len(xs_args)]
        rest = args[len(xs_args):]

        def body(acc, x):
            out = fn(*x, *rest)
            return acc + out, None
        acc, _ = lax.scan(body, jnp.float32(0.0), xs)
        return acc
    return many, tuple(xs_args) + tuple(static_args)


def topk_f32(fv):
    bv, pos = lax.top_k(fv, K)
    return bv.sum() + pos.sum().astype(jnp.float32)


def topk_i32(packed):
    p = packed.reshape(NQ, CW)
    bv, pos = lax.top_k(p, K)
    return (bv.sum() + pos.sum()).astype(jnp.float32)


def gather_ids(idx, sorted_ids):
    return sorted_ids[idx].sum().astype(jnp.float32)


def take_blk(packed, u_all):
    jglob = packed & MASK
    blk = jnp.take_along_axis(
        u_all[:, None, :], jnp.minimum(jglob, U - 1), axis=2
    )
    return blk.sum().astype(jnp.float32)


def unmono(packed):
    vals = _unmonotone_f32(packed & ~MASK)
    ok = vals > 0.5 * NEG_INF
    return jnp.where(ok, vals, 0.0).sum()


def unpack_v2(packed, u_all, sorted_ids):
    p = packed.reshape(NQ, CW)
    bv, pos = lax.top_k(p, K)                     # packed order == score order
    lane = pos % WINDOW
    jg = bv & MASK
    chunk = (
        lax.broadcasted_iota(jnp.int32, (NQ, K), 0) // QC
    )
    blk = u_all[chunk, jnp.minimum(jg, U - 1)]
    ids = sorted_ids[blk * WINDOW + lane]
    vals = _unmonotone_f32(bv & jnp.int32(~MASK))
    ok = (vals > 0.5 * NEG_INF) & (ids >= 0)
    return jnp.where(ok, vals, 0.0).sum() + ids.sum().astype(jnp.float32)


variants = [
    ("topk_f32", *scan_over(topk_f32, (fvals_all,))),
    ("topk_i32", *scan_over(topk_i32, (packed_all,))),
    ("gather_ids", *scan_over(gather_ids, (idx_all,), (sorted_ids,))),
    ("take_blk", *scan_over(take_blk, (packed_all,), (u_all,))),
    ("unmono", *scan_over(unmono, (packed_all,))),
    ("unpack_v2", *scan_over(unpack_v2, (packed_all,), (u_all, sorted_ids))),
]
for name, fn, args in variants:
    try:
        per = timed(fn, *args)
        print(json.dumps({"variant": name,
                          "ms_per_batch": round(per * 1e3, 3)}), flush=True)
    except Exception as e:
        print(json.dumps({"variant": name,
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)
