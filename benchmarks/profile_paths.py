"""Stage-by-stage TPU profile of the two headline paths (run AFTER any
sweep finishes — ONE TPU process at a time, CLAUDE.md).

Prints per-stage amortized ms/batch (bench.py protocol: REPS batches in one
jit, checksum output, trivial-dispatch RTT subtracted). Stages are CUMULATIVE
prefixes of the real kernels, so stage N+1 minus stage N isolates one
component. All device arrays are passed as jit ARGUMENTS — closing over them
bakes multi-hundred-MB constants into the HLO and the axon remote-compile
tunnel rejects the request body (HTTP 413).

Usage: python -m benchmarks.profile_paths [--flat] [--ivf]
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
CHUNK = 524288


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--flat", action="store_true")
    ap.add_argument("--ivf", action="store_true")
    ap.add_argument("--nlist", type=int, default=8192)
    ap.add_argument("--nprobe", type=int, default=16)
    ap.add_argument("--union-cap", type=int, default=128)
    ap.add_argument("--qc", type=int, default=32)
    args = ap.parse_args()
    if not (args.flat or args.ivf):
        args.flat = args.ivf = True

    import jax
    import jax.numpy as jnp
    from jax import lax

    from rag_faiss_embedding_tpu.ops.distance import NEG_INF, merge_topk
    from rag_faiss_embedding_tpu.ops.quantize import quantize_rows

    key = jax.random.PRNGKey(0)
    n_modes = 8192

    @jax.jit
    def gen_db(k):
        kc, km, kn = jax.random.split(k, 3)
        centers = jax.random.normal(kc, (n_modes, DIM), jnp.float32)
        mode = jax.random.randint(km, (N_DB,), 0, n_modes)
        noise = jax.random.normal(kn, (N_DB, DIM), jnp.float32)
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

    def timeit(label, fn, *fn_args):
        f = jax.jit(fn)
        float(f(*fn_args))  # compile+warm
        t0 = time.perf_counter()
        float(trivial(qstack))
        rtt = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f(*fn_args))
        per = (time.perf_counter() - t0 - rtt) / REPS
        print(json.dumps({"stage": label, "ms_per_batch": round(per * 1e3, 3),
                          "qps": round(Q_BATCH / max(per, 1e-9), 1)}),
              flush=True)

    if args.flat:
        print("# flat int8 stages", flush=True)
        db_i8, db_scale = jax.jit(quantize_rows)(db)
        db_sq = jax.jit(lambda x: jnp.sum(x * x, -1))(db)
        jax.block_until_ready((db_i8, db_scale, db_sq))
        n_chunks = N_DB // CHUNK

        def scan_stage(stage):
            def run_batch(q, d8, dsc, dsq):
                q_i8, q_scale = quantize_rows(q)
                d8c = d8.reshape(n_chunks, CHUNK, DIM)
                dscc = dsc.reshape(n_chunks, CHUNK)
                dsqc = dsq.reshape(n_chunks, CHUNK)
                init = (jnp.full((Q_BATCH, K), NEG_INF),
                        jnp.full((Q_BATCH, K), -1, jnp.int32))

                def step(carry, inp):
                    chunk, scales, sqs, start = inp
                    dots = jnp.dot(q_i8, chunk.T,
                                   preferred_element_type=jnp.int32)
                    scores = (dots.astype(jnp.float32)
                              * q_scale[:, None] * scales[None, :])
                    scores = 2.0 * scores - sqs[None, :]
                    if stage == "matmul":
                        return carry, scores.sum()
                    cv, cp = lax.approx_max_k(scores, K, recall_target=0.995)
                    if stage == "select":
                        return carry, (cv.sum(), cp.sum())
                    gidx = start + cp.astype(jnp.int32)
                    return merge_topk(carry[0], carry[1], cv, gidx, K), None

                starts = jnp.arange(n_chunks, dtype=jnp.int32) * CHUNK
                carry, extra = lax.scan(
                    step, init, (d8c, dscc, dsqc, starts)
                )
                if stage == "matmul":
                    return extra[1].sum() if isinstance(extra, tuple) else jnp.sum(extra)
                if stage == "select":
                    return sum(jnp.sum(e) for e in extra)
                return carry[0].sum() + carry[1].sum().astype(jnp.float32)

            def many(qs, d8, dsc, dsq):
                def body(acc, q):
                    return acc + run_batch(q, d8, dsc, dsq).astype(
                        jnp.float32
                    ), None
                acc, _ = lax.scan(body, jnp.float32(0.0), qs)
                return acc
            return many

        for stage in ("matmul", "select", "full"):
            timeit(f"int8.{stage}", scan_stage(stage),
                   qstack, db_i8, db_scale, db_sq)

    if args.ivf:
        print(f"# fused IVF stages (nlist={args.nlist} nprobe={args.nprobe} "
              f"ucap={args.union_cap} qc={args.qc})", flush=True)
        from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex
        from rag_faiss_embedding_tpu.ops.ivf_scan import (
            _select_union, _score_rows,
        )

        idx = IVFFlatIndex(DIM, nlist=args.nlist, dtype="int8",
                           train_iters=10, balance="reassign")
        t0 = time.perf_counter()
        idx.build(db)
        print(json.dumps({"stage": "build", "s": round(time.perf_counter() - t0, 1),
                          "window": idx._window,
                          "spill": int(idx._pending.ntotal)}), flush=True)
        window, nlist = idx._window, idx.nlist
        ucap, qc, nprobe = args.union_cap, args.qc, args.nprobe

        def ivf_stage(stage):
            # cumulative prefixes of the CURRENT kernel flow (batched
            # unions, vmapped chunk super-batches, widen-trim selections)
            def run_batch(q, cent, cent_sq, codes, scales, sq, ids, shadow):
                qf = q.astype(jnp.float32)
                cdots = jnp.dot(qf.astype(cent.dtype), cent.T,
                                preferred_element_type=jnp.float32)
                cscores = 2.0 * cdots - cent_sq[None, :]
                cv, cp = lax.approx_max_k(cscores, nprobe + 8,
                                          recall_target=0.99)
                _, sel = lax.top_k(cv, nprobe)
                probes = jnp.take_along_axis(
                    cp.astype(jnp.int32), sel, axis=1
                )
                if stage == "coarse":
                    return probes.sum().astype(jnp.float32)
                perm = jnp.argsort(probes[:, 0], stable=True)
                qp, pp = qf[perm], probes[perm]
                q_i8, q_scale = quantize_rows(qp)
                steps = Q_BATCH // qc
                u_all = jax.vmap(
                    lambda p: _select_union(p, nlist, ucap)
                )(pp.reshape(steps, qc, nprobe))
                if stage == "union":
                    return u_all.sum().astype(jnp.float32)
                qs = qp.reshape(steps, qc, DIM)
                q8s = q_i8.reshape(steps, qc, DIM)
                qss = q_scale.reshape(steps, qc)

                def chunk(qcf, qc8, qcs, u):
                    rows = codes.reshape(-1, window, DIM)[u].reshape(-1, DIM)
                    rid = ids.reshape(-1, window)[u].reshape(-1)
                    rsq = sq.reshape(-1, window)[u].reshape(-1)
                    rsc = scales.reshape(-1, window)[u].reshape(-1)
                    if stage == "gather":
                        return (rows.astype(jnp.int32).sum().astype(
                            jnp.float32
                        ) + rsq.sum())
                    scores = _score_rows(qcf, qc8, qcs, rows, rsc, rsq,
                                         rid, "L2")
                    if stage == "matmul":
                        return scores.sum()
                    bv, pos = lax.approx_max_k(scores, 16,
                                               recall_target=0.99)
                    pos = pos.astype(jnp.int32)
                    bi = rid[pos]
                    if stage == "select":
                        return bv.sum() + bi.sum().astype(jnp.float32)
                    slot = u[pos // window] * window + pos % window
                    srows = shadow[slot].astype(jnp.float32)
                    dots = jnp.einsum("qd,qkd->qk", qcf, srows,
                                      preferred_element_type=jnp.float32)
                    sc = 2.0 * dots - rsq[pos]
                    rv, rsel = lax.top_k(sc, K)
                    ri = jnp.take_along_axis(bi, rsel, axis=1)
                    return rv.sum() + ri.sum().astype(jnp.float32)

                return jax.vmap(chunk)(qs, q8s, qss, u_all).sum()

            def many(qstk, *a):
                def body(acc, q):
                    return acc + run_batch(q, *a), None
                acc, _ = lax.scan(body, jnp.float32(0.0), qstk)
                return acc
            return many

        ivf_args = (qstack, idx._cent_store, idx._cent_sq, idx._sorted_vecs,
                    idx._sorted_scales, idx._sorted_sq, idx._sorted_ids,
                    idx._sorted_shadow)
        for stage in ("coarse", "union", "gather", "matmul", "select",
                      "rerank"):
            timeit(f"ivf.{stage}", ivf_stage(stage), *ivf_args)


if __name__ == "__main__":
    main()
