"""Prototype: Pallas fused block-DMA + matmul + exact per-block top-k for
the IVF union scan (the round-3 headline lever; run on TPU:
PYTHONPATH=. python benchmarks/pallas_fused_proto.py).

MEASURED (TPU v5e, 1M x 384, nlist 8192, ucap=qc=256, bf16):

| version | QPS | recall@10 | note |
|---|---|---|---|
| shipped XLA fused path | 644-707k | 0.9907 | approx selection |
| v1: one block per grid cell | 252k | 0.9931 | 1024 tiny cells; per-cell fixed costs dominate |
| v2: 8 blocks/cell | 653k | 0.9931 | amortized per-cell fixed costs |
| v2 (this file): 16 blocks/cell | 694k | 0.9931 | TIES the XLA path at exact-selection recall; VMEM ~11MB |

v2 validates the whole design: scalar-prefetched dynamic index maps DMA
arbitrary union blocks correctly at speed (the pure-gather probe measured
721 GB/s fused into a reduce), the per-cell (qc, BB*window) matmul is
MXU-shaped, and per-cell exact top-KP keeps recall at the exact-selection
level (+0.0024 over the shipped path). Remaining round-3 work to PASS the
XLA path rather than match it: the iterative masked argmax (KP serial VPU
passes over (qc, BB*window)) is now the bottleneck — replace with the
packed group-reduction trick from ops/pallas_scan._group_top1 plus a
K-wide merge, and/or keep a running top-k in VMEM scratch across a
chunk's cells to shrink the host-side merge. Exactness note: per-cell
top-KP with KP >= K stays exact for the final merge (any true top-K item
is within its own cell's top-K).
"""
import time, json
import numpy as np
import jax, jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rag_faiss_embedding_tpu.ops.distance import NEG_INF
from rag_faiss_embedding_tpu.ops.pallas_scan import _extract_topk
from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex
from rag_faiss_embedding_tpu.ops import distance as dist_ops

N_DB, DIM, K, Q_BATCH, REPS = 1_048_576, 384, 10, 1024, 8
UCAP = QC = 256
KP = 10
BB = 16  # blocks per grid cell

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

def kern(u_ref, q_ref, *refs):
    # refs: BB x blk, BB x rsq, BB x rid, out_v, out_i
    blks = refs[:BB]
    rsqs = refs[BB:2*BB]
    rids = refs[2*BB:3*BB]
    out_v_ref, out_i_ref = refs[3*BB], refs[3*BB+1]
    q = q_ref[0]
    parts_s, parts_i = [], []
    for j in range(BB):
        dots = jax.lax.dot_general(
            q, blks[j][0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        rsq = rsqs[j][0, 0]
        rid = rids[j][0, 0]
        s = 2.0 * dots - rsq[None, :]
        g = jnp.broadcast_to(rid[None, :], s.shape)
        parts_s.append(jnp.where(g >= 0, s, NEG_INF))
        parts_i.append(g)
    scores = jnp.concatenate(parts_s, axis=1)   # (QC, BB*window)
    gidx = jnp.concatenate(parts_i, axis=1)
    v, i = _extract_topk(scores, gidx, KP)
    out_v_ref[0, 0] = v
    out_i_ref[0, 0] = i

def fused_pallas_chunks(qs_bf16, u_all, codes3, sq2, ids2):
    chunks = qs_bf16.shape[0]
    nb = UCAP // BB
    in_specs = [pl.BlockSpec((1, QC, DIM), lambda c, b, u_pre: (c, 0, 0))]
    for j in range(BB):
        in_specs.append(pl.BlockSpec(
            (1, window, DIM),
            lambda c, b, u_pre, j=j: (u_pre[c, b * BB + j], 0, 0)))
    for j in range(BB):
        in_specs.append(pl.BlockSpec(
            (1, 1, window),
            lambda c, b, u_pre, j=j: (u_pre[c, b * BB + j], 0, 0)))
    for j in range(BB):
        in_specs.append(pl.BlockSpec(
            (1, 1, window),
            lambda c, b, u_pre, j=j: (u_pre[c, b * BB + j], 0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(chunks, nb),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 1, QC, KP), lambda c, b, u_pre: (c, b, 0, 0)),
            pl.BlockSpec((1, 1, QC, KP), lambda c, b, u_pre: (c, b, 0, 0)),
        ],
    )
    args = [u_all, qs_bf16] + [codes3]*BB + [sq2]*BB + [ids2]*BB
    return pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((chunks, nb, QC, KP), jnp.float32),
            jax.ShapeDtypeStruct((chunks, nb, QC, KP), jnp.int32),
        ],
    )(*args)

def search_pallas(q, cent, cent_sq, codes3, sq2, ids2):
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
    nb = UCAP // BB
    cv = jnp.transpose(out_v, (0, 2, 1, 3)).reshape(steps * QC, nb * KP)
    ci = jnp.transpose(out_i, (0, 2, 1, 3)).reshape(steps * QC, nb * KP)
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
print(json.dumps({"probe": "pallas_v2_recall", "recall": round(rec, 4)}), flush=True)

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
print(json.dumps({"probe": "pallas_v2_qps", "ms": round(per * 1e3, 3),
                  "qps": round(Q_BATCH / per, 1)}), flush=True)
