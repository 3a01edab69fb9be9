"""TPU tuning sweep for the fused IVF path (library defaults come from here).

Sweeps {balance mode x nlist x dtype x nprobe x union_cap x query chunk} on
the bench's 1M x 384 mixture workload, printing one JSON line per config:
amortized QPS (bench.py protocol: REPS batches inside one jit, checksum
output, trivial-dispatch RTT subtracted) and recall@10 vs the fp32 exact
oracle at >=1024 queries.

Usage (ONE process at a time on the tunneled TPU — CLAUDE.md):
    python -m benchmarks.ivf_sweep                      # default grid
    python -m benchmarks.ivf_sweep --configs reassign:4096:int8:8:64:64 ...

Each config string is balance:nlist:dtype:nprobe:union_cap:qc
(union_cap/qc 0 = auto).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

N_DB = 1_048_576
DIM = 384
K = 10
Q_BATCH = 1024
REPS = 8
RECALL_QUERIES = 1024

DEFAULT_GRID = [
    # balance:nlist:dtype:nprobe:union_cap:qc
    "reassign:8192:bfloat16:16:256:128",
    "reassign:8192:bfloat16:12:256:128",
    "reassign:8192:bfloat16:16:128:64",
    "reassign:8192:bfloat16:24:384:128",
    "reassign:8192:int8:16:256:128",
    "reassign:8192:int8:12:256:128",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="*", default=DEFAULT_GRID)
    ap.add_argument("--train-iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex
    from rag_faiss_embedding_tpu.ops import distance as dist_ops
    from rag_faiss_embedding_tpu.ops.ivf_scan import (
        default_union_cap,
        fused_ivf_search_math,
        pick_query_chunk,
    )

    platform = jax.devices()[0].platform
    n_db = N_DB if platform == "tpu" else 131072

    key = jax.random.PRNGKey(0)
    n_modes = 8192

    @jax.jit
    def gen_db(k):
        kc, km, kn = jax.random.split(k, 3)
        centers = jax.random.normal(kc, (n_modes, DIM), jnp.float32)
        mode = jax.random.randint(km, (n_db,), 0, n_modes)
        noise = jax.random.normal(kn, (n_db, DIM), jnp.float32)
        return centers[mode] + 0.7 * noise

    @jax.jit
    def gen_q(k, db):
        ks, kn = jax.random.split(k)
        src = jax.random.randint(ks, (REPS * Q_BATCH,), 0, db.shape[0])
        noise = jax.random.normal(kn, (REPS * Q_BATCH, DIM), jnp.float32)
        return db[src] + 0.3 * noise

    db = gen_db(key)
    qstack = gen_q(jax.random.fold_in(key, 1), db).reshape(
        REPS, Q_BATCH, DIM
    )
    jax.block_until_ready((db, qstack))

    trivial = jax.jit(lambda x: x.sum())
    float(trivial(qstack))

    sub_q = qstack[0][:RECALL_QUERIES]
    _, truth = dist_ops.exact_search(sub_q, db, K, metric="L2",
                                     chunk_size=524288)
    truth = np.asarray(truth)

    built = {}
    for spec in args.configs:
        balance, nlist, dtype, nprobe, ucap, qc = spec.split(":")
        nlist, nprobe, ucap, qc = int(nlist), int(nprobe), int(ucap), int(qc)
        build_key = (balance, nlist, dtype)
        try:
            if build_key not in built:
                idx = IVFFlatIndex(DIM, nlist=nlist, dtype=dtype,
                                   train_iters=args.train_iters,
                                   balance=balance)
                t0 = time.perf_counter()
                idx.build(db)
                built[build_key] = (idx, time.perf_counter() - t0)
            idx, build_s = built[build_key]
            window = idx._window
            if ucap == 0:
                ucap = default_union_cap(idx.nlist, nprobe)
            if qc == 0:
                qc = pick_query_chunk(
                    nprobe, window, DIM, jnp.dtype(idx.dtype).itemsize,
                    Q_BATCH, union_cap=ucap,
                )
            spill = idx._pending_dev() if idx._pending.ntotal else None
            fused_args = (idx._cent_store, idx._cent_sq, idx._sorted_vecs,
                          idx._sorted_scales, idx._sorted_sq,
                          idx._sorted_ids, idx._sorted_shadow)

            def many(qs, cent, cent_sq, codes, scales, sq, ids, shadow, *sp):
                sp = sp if sp else None

                def body(acc, q):
                    v, i = fused_ivf_search_math(
                        q, cent, cent_sq, codes, scales, sq, ids, sp, shadow,
                        k=K, nprobe=nprobe, window=window, metric="L2",
                        recall_target=idx.recall_target,
                        union_cap=ucap, qc=qc,
                        rerank_depth=idx.rerank_depth,
                        union_mode=(
                            "chunkmax" if idx.nlist > 2048 else "minrank"
                        ),
                    )
                    v = jnp.where(jnp.isfinite(v), v, 0.0)
                    return acc + v.sum() + i.sum().astype(jnp.float32), None

                acc, _ = lax.scan(body, jnp.float32(0.0), qs)
                return acc

            many = jax.jit(many)
            call_args = fused_args + (spill if spill is not None else ())
            float(many(qstack, *call_args))  # compile + warm
            # tunnel RTT fluctuates by tens of ms — use the median of 3
            # trivial dispatches and the fastest of 3 timed runs
            rtts = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(trivial(qstack))
                rtts.append(time.perf_counter() - t0)
            rtt = sorted(rtts)[1]
            best = None
            for _ in range(3):
                t0 = time.perf_counter()
                float(many(qstack, *call_args))
                el = time.perf_counter() - t0
                best = el if best is None else min(best, el)
            per = max((best - rtt) / REPS, 1e-9)

            idx.union_cap = ucap
            idx.query_chunk = qc  # recall at the TIMED config, not defaults
            _, pred = idx.search(sub_q, K, nprobe=nprobe)
            pred = np.asarray(pred)
            hits = sum(len(set(p.tolist()) & set(t.tolist()))
                       for p, t in zip(pred, truth))
            rec = hits / truth.size
            print(json.dumps({
                "config": spec, "qps": round(Q_BATCH / per, 1),
                "recall_at_10": round(rec, 4), "window": window,
                "union_cap": ucap, "qc": qc,
                "spill_rows": int(idx._pending.ntotal),
                "build_s": round(build_s, 1),
                "batch_ms": round(per * 1e3, 3),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"config": spec, "error": f"{type(e).__name__}: {e}"}),
                  flush=True)


if __name__ == "__main__":
    main()
