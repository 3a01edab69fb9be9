"""TPU benchmark: Pallas fused IVF backend vs the XLA chunk backend.

Times the SHIPPED path (ops/ivf_scan.fused_ivf_search_math with
backend="pallas"/"xla") under the honest protocol from bench.py (REPS
batches in one jit, checksum output, median RTT subtracted, fastest of 3),
recall-gated through IVFFlatIndex.search at the same parameters.

Run: PYTHONPATH=. python benchmarks/pallas_ivf_bench.py  (TPU; ~10 min)
Env: RFE_PB_SMALL=1 for a quick 64k compile-check only.
"""
import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex
from rag_faiss_embedding_tpu.ops import distance as dist_ops
from rag_faiss_embedding_tpu.ops.ivf_scan import (
    default_union_cap, fused_ivf_search_math, pick_query_chunk,
)

DIM, K, Q_BATCH, REPS = 384, 10, 1024, 8
SMALL = bool(os.environ.get("RFE_PB_SMALL"))
N_DB = 131_072 if SMALL else 1_048_576
NLIST = 1024 if SMALL else 8192
N_MODES = 8192

key = jax.random.PRNGKey(0)


def log(**kw):
    print(json.dumps(kw), flush=True)


@jax.jit
def gen_db(k):
    kc, km, kn = jax.random.split(k, 3)
    centers = jax.random.normal(kc, (N_MODES, DIM), jnp.float32)
    mode = jax.random.randint(km, (N_DB,), 0, N_MODES)
    return centers[mode] + 0.7 * jax.random.normal(kn, (N_DB, DIM), jnp.float32)


db = gen_db(key)
q_all = (db[: REPS * Q_BATCH] + 0.3 * jax.random.normal(
    jax.random.fold_in(key, 1), (REPS * Q_BATCH, DIM)
)).reshape(REPS, Q_BATCH, DIM)
jax.block_until_ready((db, q_all))
trivial = jax.jit(lambda x: x.sum())
float(trivial(q_all))
log(stage="data_ready", n_db=N_DB)

idx = IVFFlatIndex(DIM, nlist=NLIST, dtype="bfloat16", train_iters=10,
                   balance="reassign")
t0 = time.perf_counter()
idx.build(db)
log(stage="built", build_s=round(time.perf_counter() - t0, 1),
    window=idx._window, spill=int(idx._pending.ntotal))

sub_q = q_all[0]
_, truth = dist_ops.exact_search(sub_q, db, K, metric="L2",
                                 chunk_size=524288)
truth = np.asarray(truth)
del db

window = idx._window
spill = idx._pending_dev() if idx._pending.ntotal else None
fused_args = (idx._cent_store, idx._cent_sq, idx._sorted_vecs,
              idx._sorted_scales, idx._sorted_sq, idx._sorted_ids,
              idx._sorted_shadow)


def recall_of(pred):
    return sum(len(set(p.tolist()) & set(t.tolist()))
               for p, t in zip(np.asarray(pred), truth)) / truth.size


def make_many(nprobe, ucap, qc, backend, cap):
    def many(qs, cent, cent_sq, codes, scales, sq, ids, shadow, *sp):
        sp = sp if sp else None

        def body(acc, q):
            v, i = fused_ivf_search_math(
                q, cent, cent_sq, codes, scales, sq, ids, sp, shadow,
                k=K, nprobe=nprobe, window=window, metric="L2",
                recall_target=idx.recall_target, union_cap=ucap, qc=qc,
                rerank_depth=idx.rerank_depth, union_mode="chunkmax",
                backend=backend, pallas_cap=cap,
            )
            v = jnp.where(jnp.isfinite(v), v, 0.0)
            return acc + v.sum() + i.sum().astype(jnp.float32), None

        acc, _ = lax.scan(body, jnp.float32(0.0), qs)
        return acc
    return jax.jit(many)


def timed(fn, *args):
    float(fn(*args))
    rtts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(trivial(q_all))
        rtts.append(time.perf_counter() - t0)
    rtt = sorted(rtts)[1]
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        el = time.perf_counter() - t0
        best = el if best is None else min(best, el)
    return max((best - rtt) / REPS, 1e-9)


configs = [("xla", 0, 16), ("pallas", 2, 16), ("pallas", 3, 16),
           ("pallas", 2, 24)]
if SMALL:
    configs = [("xla", 0, 16), ("pallas", 2, 16)]

for backend, cap, nprobe in configs:
    ucap = default_union_cap(idx.nlist, nprobe)
    qc = pick_query_chunk(nprobe, window, DIM, 2, Q_BATCH, union_cap=ucap)
    try:
        # recall through the shipped class at identical parameters
        idx.backend = backend if backend == "pallas" else "xla"
        idx.pallas_cap = max(cap, 2)
        idx.nprobe = nprobe
        idx.union_cap = ucap
        idx.query_chunk = qc
        t0 = time.perf_counter()
        _, pred = idx.search(sub_q, K, nprobe=nprobe)
        rec = recall_of(pred)
        many = make_many(nprobe, ucap, qc, backend, max(cap, 2))
        args = fused_args + (spill if spill is not None else ())
        per = timed(many, q_all, *args)
        log(backend=backend, cap=cap, nprobe=nprobe, ucap=ucap, qc=qc,
            recall=round(rec, 4), ms=round(per * 1e3, 3),
            qps=round(Q_BATCH / per, 1))
    except Exception as e:
        log(backend=backend, cap=cap, nprobe=nprobe,
            error=f"{type(e).__name__}: {e}"[:500])
