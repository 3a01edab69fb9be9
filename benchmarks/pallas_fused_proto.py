"""Prototype: Pallas fused block-DMA + matmul + exact per-block top-k for
the IVF union scan (the round-3 headline lever; run on TPU:
PYTHONPATH=. python benchmarks/pallas_fused_proto.py).

MEASURED (TPU v5e, 1M x 384, nlist 8192, ucap=qc=256, bf16):
  recall@10 0.9931  (vs 0.9907 shipped XLA path — per-block selection is
                     EXACT, validating the recall upside)
  252k QPS (4.06 ms/batch)  vs 644-707k for the shipped XLA path.

Why it loses today, i.e. what round 3 must fix:
- grid is (chunks, U) = 1024 tiny cells; per-cell fixed cost (revisited
  q block, pipeline bubbles) dominates -> process SEVERAL union blocks
  per cell (e.g. 8) so the matmul grows to (qc, 8*window) and the DMA
  pipeline gets long contiguous work;
- the per-block top-k is an iterative masked argmax (KP=10 serial VPU
  passes over (qc, window)); switch to the _group_top1 packed-reduction
  trick from ops/pallas_scan.py (k-independent, ~3 VPU passes) with a
  small K-wide final merge, or keep a running top-k across the blocks of
  a cell in VMEM scratch;
- scalar-prefetch dynamic index maps themselves are CORRECT and fast on
  this stack (the pure block-gather probe hit 512 GB/s materialized /
  721 GB/s fused into a reduce) — the DMA pattern is not the problem.

Kept as a runnable reference so round 3 starts from a working kernel,
not a cold start.
"""
import time, json, functools
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rag_faiss_embedding_tpu.ops.distance import NEG_INF
from rag_faiss_embedding_tpu.ops.pallas_scan import _extract_topk
from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex
from rag_faiss_embedding_tpu.ops import distance as dist_ops
from rag_faiss_embedding_tpu.ops.ivf_scan import fused_ivf_search_math

N_DB, DIM, K, Q_BATCH, REPS = 1_048_576, 384, 10, 1024, 8
UCAP = QC = 256
KP = 10  # per-block candidates (>= K for exactness within the union)

key = jax.random.PRNGKey(0)

@jax.jit
def gen_db(k):
    kc, km, kn = jax.random.split(k, 3)
    centers = jax.random.normal(kc, (8192, DIM), jnp.float32)
    mode = jax.random.randint(km, (N_DB,), 0, 8192)
    return centers[mode] + 0.7 * jax.random.normal(kn, (N_DB, DIM), jnp.float32)

db = gen_db(key)
q_all = (db[:REPS*Q_BATCH] + 0.3*jax.random.normal(jax.random.fold_in(key,1), (REPS*Q_BATCH, DIM))).reshape(REPS, Q_BATCH, DIM)
jax.block_until_ready((db, q_all))
trivial = jax.jit(lambda x: x.sum())
float(trivial(q_all))

idx = IVFFlatIndex(DIM, nlist=8192, dtype="bfloat16", train_iters=10, balance="reassign")
idx.build(db)
sub_q = q_all[0]
_, truth = dist_ops.exact_search(sub_q, db, K, metric="L2", chunk_size=524288)
truth = np.asarray(truth)
del db
window, nlist = idx._window, idx.nlist
cent, cent_sq = idx._cent_store, idx._cent_sq
codes3 = idx._sorted_vecs.reshape(nlist + 1, window, DIM)
sq2 = idx._sorted_sq.reshape(nlist + 1, 1, window)
ids2 = idx._sorted_ids.reshape(nlist + 1, 1, window)

def kern(u_ref, q_ref, blk_ref, rsq_ref, rid_ref, out_v_ref, out_i_ref):
    q = q_ref[0]                        # (QC, D) bf16
    blk = blk_ref[0]                    # (window, D) bf16
    dots = jax.lax.dot_general(
        q, blk, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                   # (QC, window)
    rsq = rsq_ref[0, 0]                 # (window,)
    rid = rid_ref[0, 0]                 # (window,)
    scores = 2.0 * dots - rsq[None, :]
    gidx = jnp.broadcast_to(rid[None, :], scores.shape)
    scores = jnp.where(gidx >= 0, scores, NEG_INF)
    v, i = _extract_topk(scores, gidx, KP)
    out_v_ref[0, 0] = v
    out_i_ref[0, 0] = i

def fused_pallas_chunks(qs_bf16, u_all, codes3, sq2, ids2):
    """qs_bf16: (CHUNKS, QC, D); u_all: (CHUNKS, U) int32."""
    chunks = qs_bf16.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(chunks, UCAP),
        in_specs=[
            pl.BlockSpec((1, QC, DIM), lambda c, b, u_pre: (c, 0, 0)),
            pl.BlockSpec((1, window, DIM),
                         lambda c, b, u_pre: (u_pre[c, b], 0, 0)),
            pl.BlockSpec((1, 1, window),
                         lambda c, b, u_pre: (u_pre[c, b], 0, 0)),
            pl.BlockSpec((1, 1, window),
                         lambda c, b, u_pre: (u_pre[c, b], 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, QC, KP), lambda c, b, u_pre: (c, b, 0, 0)),
            pl.BlockSpec((1, 1, QC, KP), lambda c, b, u_pre: (c, b, 0, 0)),
        ],
    )
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((chunks, UCAP, QC, KP), jnp.float32),
            jax.ShapeDtypeStruct((chunks, UCAP, QC, KP), jnp.int32),
        ],
    )(u_all, qs_bf16, codes3, sq2, ids2)

def search_pallas(q, cent, cent_sq, codes3, sq2, ids2):
    """Full search one batch: chunkmax coarse (XLA) + pallas union scan +
    exact final top-k."""
    qf = q.astype(jnp.float32)
    q_sq = jnp.sum(qf * qf, axis=-1)
    cdots = jnp.dot(qf.astype(cent.dtype), cent.T,
                    preferred_element_type=jnp.float32)
    cscores = 2.0 * cdots - cent_sq[None, :]
    rel = cscores - jnp.max(cscores, axis=1, keepdims=True)
    top1 = jnp.argmax(cscores, axis=1)
    perm = jnp.argsort(top1, stable=True)
    qp, rel_p = qf[perm], rel[perm]
    steps = q.shape[0] // QC
    chunk_rel = jnp.max(rel_p.reshape(steps, QC, nlist), axis=1)
    _, u_all = lax.top_k(chunk_rel, UCAP)
    u_all = jnp.sort(u_all.astype(jnp.int32), axis=1)
    qs = qp.astype(jnp.bfloat16).reshape(steps, QC, DIM)
    out_v, out_i = fused_pallas_chunks(qs, u_all, codes3, sq2, ids2)
    # (steps, U, QC, KP) -> per query (QC, U*KP)
    cv = jnp.transpose(out_v, (0, 2, 1, 3)).reshape(steps * QC, UCAP * KP)
    ci = jnp.transpose(out_i, (0, 2, 1, 3)).reshape(steps * QC, UCAP * KP)
    bv, pos = lax.top_k(cv, K)
    bi = jnp.take_along_axis(ci, pos, axis=1)
    inv = jnp.argsort(perm)
    bv, bi = bv[inv], bi[inv]
    ok = bv > NEG_INF
    vals = jnp.where(ok, jnp.maximum(q_sq[:, None] - bv, 0.0), jnp.inf)
    return vals, jnp.where(ok, bi, -1)

search_jit = jax.jit(search_pallas)
vals, ids = search_jit(sub_q, cent, cent_sq, codes3, sq2, ids2)
pred = np.asarray(ids)
rec = sum(len(set(p.tolist()) & set(t.tolist())) for p, t in zip(pred, truth)) / truth.size
print(json.dumps({"probe": "pallas_fused_recall", "recall": round(rec, 4)}), flush=True)

@jax.jit
def many(qstk, cent, cent_sq, codes3, sq2, ids2):
    def body(acc, q):
        v, i = search_pallas(q, cent, cent_sq, codes3, sq2, ids2)
        v = jnp.where(jnp.isfinite(v), v, 0.0)
        return acc + v.sum() + i.sum().astype(jnp.float32), None
    acc, _ = lax.scan(body, jnp.float32(0.0), qstk)
    return acc

args = (q_all, cent, cent_sq, codes3, sq2, ids2)
float(many(*args))
rtts = []
for _ in range(3):
    t0 = time.perf_counter(); float(trivial(q_all)); rtts.append(time.perf_counter() - t0)
rtt = sorted(rtts)[1]
best = None
for _ in range(3):
    t0 = time.perf_counter(); float(many(*args)); el = time.perf_counter() - t0
    best = el if best is None else min(best, el)
per = max((best - rtt) / REPS, 1e-9)
print(json.dumps({"probe": "pallas_fused_qps", "ms": round(per * 1e3, 3),
                  "qps": round(Q_BATCH / per, 1)}), flush=True)
