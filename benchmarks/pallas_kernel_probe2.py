"""Stage isolation for the Pallas IVF path at 1M shapes (TPU).

The v1 probe showed the kernel alone at ~0.4 ms/batch while the full
fused path measured 9.6 ms — this probe finds the missing ~9 ms. All
variants use synthetic data at the production shapes (no k-means build)
and VARY the queries per rep (v1's identical-input scan was CSE-hoisted,
under-reporting 8x — the docs/PERF.md pitfall).

  kernel3d   union_scan fed 3-D-born codes (as v1, but CSE-proof)
  kernel2d   union_scan fed a 2-D codes array reshaped in-jit (tests the
             operand layout-copy theory for the 1.6 GB codes buffer)
  decode     decode_topk (top-k on packed + winners-only decode)
  fused_pl   full fused_ivf_search_math backend="pallas"
  fused_xla  full fused_ivf_search_math backend="xla" (reference point)

Run: PYTHONPATH=. python benchmarks/pallas_kernel_probe2.py
"""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rag_faiss_embedding_tpu.ops.ivf_scan import fused_ivf_search_math
from rag_faiss_embedding_tpu.ops.pallas_ivf import union_scan, decode_topk

NLIST, WINDOW, DIM = 8192, 256, 384
QC, U, BB, CAP, K = 256, 260, 10, 2, 10
CHUNKS, REPS = 4, 8

key = jax.random.PRNGKey(0)
codes3 = jax.random.normal(key, (NLIST + 1, WINDOW, DIM), jnp.bfloat16)
codes2 = codes3.reshape(-1, DIM)
sorted_sq = jnp.abs(jax.random.normal(
    jax.random.fold_in(key, 2), ((NLIST + 1) * WINDOW,))) * 300 + 100
sorted_ids = jnp.arange((NLIST + 1) * WINDOW, dtype=jnp.int32)
cent = jax.random.normal(jax.random.fold_in(key, 3), (NLIST, DIM),
                         jnp.bfloat16)
cent_sq = jnp.abs(jax.random.normal(jax.random.fold_in(key, 4),
                                    (NLIST,))) * 300 + 100
qs_all = jax.random.normal(jax.random.fold_in(key, 5),
                           (REPS, CHUNKS, QC, DIM), jnp.bfloat16)
qf_all = jax.random.normal(jax.random.fold_in(key, 6),
                           (REPS, CHUNKS * QC, DIM), jnp.float32)
u_base = jnp.stack([
    jnp.sort(jax.random.permutation(jax.random.fold_in(key, 10 + c),
                                    NLIST)[:U].astype(jnp.int32))
    for c in range(CHUNKS)
])
packed_all = jax.random.randint(jax.random.fold_in(key, 7),
                                (REPS, CHUNKS, QC, CAP * WINDOW),
                                0, 1 << 30, jnp.int32)
jax.block_until_ready((codes3, sorted_sq, sorted_ids, cent, cent_sq,
                       qs_all, qf_all, u_base, packed_all))
trivial = jax.jit(lambda x: x.sum())
float(trivial(cent_sq))


def timed(fn, *args):
    jax.block_until_ready(fn(*args))
    rtts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(trivial(cent_sq))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return max((best - rtt) / REPS, 1e-9)


@jax.jit
def kernel3d(qs_all, u_base, codes3, sorted_sq, sorted_ids):
    def body(acc, qs):
        out = union_scan(qs, u_base, codes3, sorted_sq, sorted_ids,
                         window=WINDOW, cap=CAP, bb=BB, metric="L2",
                         interpret=False)
        return acc + out.sum(dtype=jnp.int32), None
    acc, _ = lax.scan(body, jnp.int32(0), qs_all)
    return acc


@jax.jit
def kernel2d(qs_all, u_base, codes2, sorted_sq, sorted_ids):
    c3 = codes2.reshape(NLIST + 1, WINDOW, DIM)
    def body(acc, qs):
        out = union_scan(qs, u_base, c3, sorted_sq, sorted_ids,
                         window=WINDOW, cap=CAP, bb=BB, metric="L2",
                         interpret=False)
        return acc + out.sum(dtype=jnp.int32), None
    acc, _ = lax.scan(body, jnp.int32(0), qs_all)
    return acc


@jax.jit
def unpack_stage(packed_all, u_base, sorted_ids):
    def body(acc, packed):
        bv, bi = decode_topk(packed, u_base, sorted_ids, window=WINDOW, k=K)
        return acc + bv.sum() + bi.sum().astype(jnp.float32), None
    acc, _ = lax.scan(body, jnp.float32(0.0), packed_all)
    return acc


def make_fused(backend):
    @jax.jit
    def fused(qf_all, cent, cent_sq, codes2, sorted_sq, sorted_ids):
        def body(acc, q):
            v, i = fused_ivf_search_math(
                q, cent, cent_sq, codes2, None, sorted_sq, sorted_ids,
                None, None,
                k=K, nprobe=16, window=WINDOW, metric="L2",
                recall_target=0.99, union_cap=256, qc=QC,
                rerank_depth=16, union_mode="chunkmax",
                backend=backend, pallas_cap=CAP,
            )
            v = jnp.where(jnp.isfinite(v), v, 0.0)
            return acc + v.sum() + i.sum().astype(jnp.float32), None
        acc, _ = lax.scan(body, jnp.float32(0.0), qf_all)
        return acc
    return fused


variants = [
    ("kernel3d", kernel3d, (qs_all, u_base, codes3, sorted_sq, sorted_ids)),
    ("kernel2d", kernel2d, (qs_all, u_base, codes2, sorted_sq, sorted_ids)),
    ("decode", unpack_stage, (packed_all, u_base, sorted_ids)),
    ("fused_pl", make_fused("pallas"),
     (qf_all, cent, cent_sq, codes2, sorted_sq, sorted_ids)),
    ("fused_xla", make_fused("xla"),
     (qf_all, cent, cent_sq, codes2, sorted_sq, sorted_ids)),
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
