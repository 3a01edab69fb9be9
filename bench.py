"""Headline benchmark: top-10 QPS/chip at recall@10 >= 0.99 on 1M x 384-d.

BASELINE.json north star: >= 1M QPS/chip top-10 at recall@10 >= 0.99 on
1M x 384-d (metric: "query QPS/chip at recall@10>=0.99 (1M vecs);
index-build vectors/sec"). The reference publishes no numbers (BASELINE.md),
so ``vs_baseline`` is reported against the 1M-QPS north-star target.

Data distribution: a gaussian MIXTURE (8192 modes, spread 0.7, queries =
perturbed corpus points) — the realistic embedding-like regime. Isotropic
384-d noise is adversarial to ANY inverted-file method (FAISS included):
true neighbors spread uniformly over all lists (measured recall 0.11 @
nprobe=64), while flat-scan costs are distribution-independent.

Measurement protocol (IMPORTANT): this environment reaches the TPU through
the axon stdio tunnel, where ``block_until_ready`` can return before device
execution completes and any device->host fetch pays a ~30-90ms tunnel RTT.
Naive per-call timing is therefore fiction in both directions. The honest
protocol used here amortizes: REPS independent query batches run inside ONE
jitted ``lax.scan`` whose only output is a checksum scalar; wall time minus a
measured trivial-dispatch RTT, divided by REPS, is the per-batch latency.

Paths compared (best wins, recall-gated at 0.99 vs the fp32 exact oracle):
- exact:       bf16 storage, chunked fused scan, ``lax.top_k`` (rank-exact)
- approx:      bf16 storage, ``lax.approx_max_k`` per chunk (XLA's TPU
               PartialReduce ANN selection, recall_target=0.99) + exact merge
- int8_approx: SQ8 storage (per-row scales, exact fp32 norms), int8 MXU
               matmul with int32 accumulation (2x bf16 throughput on v5e),
               approx selection
- int8_rerank: two-stage — the int8 scan keeps its cheap per-chunk top-K
               selection but skips the cross-chunk merge, collecting all
               n_chunks*K candidates; an exact bf16 rerank over those rows
               (a tiny gather + matmul) restores the recall the quantized
               cross-term loses (classic retrieve-then-rerank)
- ivf:         IVF-Flat tier (nlist=4096, k-means++/Lloyd trained on-device),
               measured at the smallest nprobe whose recall passes the gate;
               index build time reported as index_build_vectors_per_s
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

N_DB = 1_048_576  # 1M, multiple of the chunk size
DIM = 384
K = 10
Q_BATCH = 1024
# Measured sweep (docs/PERF.md): 512k chunks nearly halve per-batch latency
# vs 128k (fewer approx_max_k invocations / merges; 1M single-chunk regresses)
CHUNK = 524288
REPS = 8
RECALL_QUERIES = 64
NORTH_STAR_QPS = 1_000_000.0


def _scan_factory(variant: str):
    import jax
    import jax.numpy as jnp
    from jax import lax

    quantized = variant.startswith("int8")

    def batch_topk(q, db_c, sq_c, starts, scale_c=None, q_scale=None,
                   k_sel=K):
        """One query batch over all chunks; returns (vals, idx) (Q, k_sel)."""
        def step(carry, inp):
            bv, bi = carry
            if quantized:
                chunk, s, start, scales = inp
                dots_i32 = jnp.dot(q, chunk.T, preferred_element_type=jnp.int32)
                dots = (dots_i32.astype(jnp.float32)
                        * q_scale[:, None] * scales[None, :])
            else:
                chunk, s, start = inp
                dots = jnp.dot(q, chunk.T, preferred_element_type=jnp.float32)
            scores = 2.0 * dots - s[None, :]
            if variant == "exact":
                cv, cp = lax.top_k(scores, k_sel)
            else:
                # int8 scores carry quantization error on top of the
                # selection's own misses; 0.995 buys the recall gate back
                # for ~6% QPS (measured sweep: 0.999 falls off a cliff)
                rt = 0.995 if quantized else 0.99
                cv, cp = lax.approx_max_k(scores, k_sel, recall_target=rt)
            ci = cp.astype(jnp.int32) + start
            v = jnp.concatenate([bv, cv], axis=1)
            i = jnp.concatenate([bi, ci], axis=1)
            nv, pos = lax.top_k(v, k_sel)
            return (nv, jnp.take_along_axis(i, pos, axis=1)), None

        init = (
            jnp.full((q.shape[0], k_sel), -1e30, jnp.float32),
            jnp.full((q.shape[0], k_sel), -1, jnp.int32),
        )
        xs = (db_c, sq_c, starts) if not quantized else (
            db_c, sq_c, starts, scale_c)
        (bv, bi), _ = lax.scan(step, init, xs)
        return bv, bi

    def batch_candidates(q, db_c, sq_c, starts, scale_c, q_scale):
        """Per-chunk top-K WITHOUT cross-chunk merge: (Q, n_chunks*K) ids.

        The merge is what forces k_sel-wide selection per chunk; collecting
        candidates instead keeps selection at K and defers ranking to the
        exact rerank stage."""
        def step(_, inp):
            chunk, s, start, scales = inp
            dots_i32 = jnp.dot(q, chunk.T, preferred_element_type=jnp.int32)
            dots = (dots_i32.astype(jnp.float32)
                    * q_scale[:, None] * scales[None, :])
            scores = 2.0 * dots - s[None, :]
            cv, cp = lax.approx_max_k(scores, 2 * K, recall_target=0.99)
            return None, cp.astype(jnp.int32) + start

        _, ids = lax.scan(step, None, (db_c, sq_c, starts, scale_c))
        return jnp.transpose(ids, (1, 0, 2)).reshape(q.shape[0], -1)

    if quantized:
        from rag_faiss_embedding_tpu.ops.quantize import quantize_rows

        rerank = variant.endswith("rerank")

        def run_one(q_bf16, db_c, sq_c, starts, scale_c, db_flat16):
            q_i8, q_scale = quantize_rows(q_bf16)
            if not rerank:
                return batch_topk(q_i8, db_c, sq_c, starts, scale_c, q_scale)
            bi = batch_candidates(q_i8, db_c, sq_c, starts, scale_c, q_scale)
            # exact bf16 rerank over the (Q, n_chunks*K) candidates
            cand = db_flat16[bi]                        # gather
            cand_sq = sq_c.reshape(-1)[bi]
            dots = jnp.einsum(
                "qd,qkd->qk", q_bf16, cand, preferred_element_type=jnp.float32
            )
            scores = 2.0 * dots - cand_sq
            nv2, pos = lax.top_k(scores, K)
            return nv2, jnp.take_along_axis(bi, pos, axis=1)

        @jax.jit
        def many(qstack, db_c, sq_c, starts, scale_c, db_flat16):
            def body(acc, q):
                bv, bi = run_one(q, db_c, sq_c, starts, scale_c, db_flat16)
                return acc + bv.sum() + bi.sum().astype(jnp.float32), None
            acc, _ = lax.scan(body, jnp.float32(0.0), qstack)
            return acc

        @jax.jit
        def single(q, db_c, sq_c, starts, scale_c, db_flat16):
            return run_one(q, db_c, sq_c, starts, scale_c, db_flat16)

        return many, single

    @jax.jit
    def many(qstack, db_c, sq_c, starts):
        def body(acc, q):
            bv, bi = batch_topk(q, db_c, sq_c, starts)
            return acc + bv.sum() + bi.sum().astype(jnp.float32), None
        acc, _ = lax.scan(body, jnp.float32(0.0), qstack)
        return acc

    @jax.jit
    def single(q, db_c, sq_c, starts):
        return batch_topk(q, db_c, sq_c, starts)

    return many, single


def main() -> None:
    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    # CPU fallback scales for dev runs (numbers only meaningful on TPU)
    global REPS, Q_BATCH, CHUNK
    if platform != "tpu":
        n_db, REPS, Q_BATCH, CHUNK = 131072, 2, 256, 131072
    else:
        n_db = N_DB
    n_chunks = n_db // CHUNK

    # Generate data ON DEVICE: shipping ~768MB through the axon tunnel takes
    # several minutes; jax.random on-chip takes milliseconds.
    key = jax.random.PRNGKey(0)
    n_modes = 8192

    @jax.jit
    def gen_db(k):
        kc, km, kn = jax.random.split(k, 3)
        centers = jax.random.normal(kc, (n_modes, DIM), jnp.float32)
        mode = jax.random.randint(km, (n_chunks * CHUNK,), 0, n_modes)
        noise = jax.random.normal(kn, (n_chunks * CHUNK, DIM), jnp.float32)
        db = centers[mode] + 0.7 * noise
        return db.reshape(n_chunks, CHUNK, DIM)

    @jax.jit
    def gen_q(k, db_flat):
        ks, kn = jax.random.split(k)
        src = jax.random.randint(ks, (REPS * Q_BATCH,), 0, db_flat.shape[0])
        noise = jax.random.normal(kn, (REPS * Q_BATCH, DIM), jnp.float32)
        q = db_flat[src] + 0.3 * noise
        return q.reshape(REPS, Q_BATCH, DIM)

    db_c32 = gen_db(key)
    db_c = db_c32.astype(jnp.bfloat16)
    sq_c = jnp.sum(db_c32**2, axis=-1)
    qstack32 = gen_q(jax.random.fold_in(key, 1), db_c32.reshape(-1, DIM))
    qstack = qstack32.astype(jnp.bfloat16)
    starts = jnp.arange(n_chunks, dtype=jnp.int32) * CHUNK
    jax.block_until_ready((db_c, sq_c, qstack))

    trivial = jax.jit(lambda x: x.sum())
    float(trivial(sq_c))

    import os

    # SQ8 arrays (derived on device from the same f32 data)
    from rag_faiss_embedding_tpu.ops.quantize import quantize_rows

    db_i8_flat, db_scales = jax.jit(quantize_rows)(db_c32.reshape(n_db, DIM))
    db_i8_c = db_i8_flat.reshape(n_chunks, CHUNK, DIM)
    scale_c = db_scales.reshape(n_chunks, CHUNK)
    jax.block_until_ready((db_i8_c, scale_c))

    db_flat16 = db_c.reshape(n_db, DIM)
    variants = ("approx", "int8_rerank") if os.environ.get("RFE_BENCH_FAST") else (
        "approx", "int8_approx", "int8_rerank", "exact")
    results = {}
    singles = {}
    for variant in variants:
        try:
            many, single = _scan_factory(variant)
            if variant.startswith("int8"):
                args = (qstack, db_i8_c, sq_c, starts, scale_c, db_flat16)
            else:
                args = (qstack, db_c, sq_c, starts)
            float(many(*args))  # compile + warm
            t0 = time.perf_counter()
            float(trivial(sq_c))
            rtt = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(many(*args))
            total = time.perf_counter() - t0
            per_batch = max((total - rtt) / REPS, 1e-9)
            results[variant] = {
                "qps": Q_BATCH / per_batch,
                "batch_ms": per_batch * 1e3,
                "rtt_ms": rtt * 1e3,
            }
            singles[variant] = single
        except Exception as e:  # one broken variant must not kill the bench
            print(f"# variant {variant} failed: {type(e).__name__}: {e}")
    if not results:
        raise SystemExit("all benchmark variants failed")

    # recall@10 vs float32 exact oracle on a query subsample
    from rag_faiss_embedding_tpu.ops import distance as dist_ops

    sub_q = qstack32[0][:RECALL_QUERIES]
    db32 = db_c32.reshape(n_db, DIM)
    _, truth = dist_ops.exact_search(
        sub_q, db32, K, metric="L2", chunk_size=CHUNK
    )
    truth = np.asarray(truth)

    recalls = {}
    for variant, single in singles.items():
        try:
            if variant.startswith("int8"):
                _, pred = single(
                    qstack[0][:RECALL_QUERIES], db_i8_c, sq_c, starts,
                    scale_c, db_flat16,
                )
            else:
                _, pred = single(
                    qstack[0][:RECALL_QUERIES], db_c, sq_c, starts,
                )
            pred = np.asarray(pred)
            hits = sum(
                len(set(p.tolist()) & set(t.tolist()))
                for p, t in zip(pred, truth)
            )
            recalls[variant] = hits / truth.size
        except Exception as e:
            print(f"# recall check for {variant} failed: {e}")
            recalls[variant] = 0.0

    # ------------------------------------------------------------- IVF tier
    ivf_extras = {}
    if not os.environ.get("RFE_BENCH_NO_IVF"):
        try:
            from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex, \
                probe_scan_math
            from rag_faiss_embedding_tpu.ops import distance as ivf_dist

            idx = IVFFlatIndex(DIM, nlist=4096 if n_db >= 500_000 else 64,
                               dtype="bfloat16", train_iters=10)
            t0 = time.perf_counter()
            idx.build(db_c.reshape(n_db, DIM))
            build_s = time.perf_counter() - t0
            ivf_extras["index_build_vectors_per_s"] = round(n_db / build_s, 1)

            cents = idx.centroids.astype(jnp.bfloat16)
            window = idx._window

            # sub-chunk queries: the (Qc, nprobe, window, D) f32 probe gather
            # at Qc=1024, window~1024, nprobe=4 is ~6 GB -> OOM; Qc=128 keeps
            # it under 1 GB
            qsub = 128

            def make_ivf(nprobe):
                @jax.jit
                def many(qs, sv, ssq, sid, off, lens, c):
                    qs = qs.reshape(-1, qsub, DIM)

                    def body(acc, q):
                        _, probes = ivf_dist._exact_search_impl(
                            q, c, nprobe, metric="L2", db_sq=None,
                            n_valid=jnp.int32(c.shape[0]),
                            chunk_size=c.shape[0],
                        )
                        v, i = probe_scan_math(
                            q.astype(jnp.float32), sv, ssq, sid, off, lens,
                            probes, k=K, window=window,
                        )
                        return acc + v.sum() + i.sum().astype(jnp.float32), None
                    acc, _ = jax.lax.scan(body, jnp.float32(0.0), qs)
                    return acc
                return many

            ivf_args = (idx._sorted_vecs, idx._sorted_sq, idx._sorted_ids,
                        idx._offsets, idx._lengths, cents)
            sweep = {}
            best = None
            for nprobe in (1, 2, 4):
                _, pred = idx.search(qstack[0][:RECALL_QUERIES], K,
                                     nprobe=nprobe)
                pred = np.asarray(pred)
                hits = sum(len(set(p.tolist()) & set(t.tolist()))
                           for p, t in zip(pred, truth))
                rec = hits / truth.size
                many = make_ivf(nprobe)
                float(many(qstack, *ivf_args))
                t0 = time.perf_counter()
                float(trivial(sq_c))
                rtt = time.perf_counter() - t0
                t0 = time.perf_counter()
                float(many(qstack, *ivf_args))
                per = max((time.perf_counter() - t0 - rtt) / REPS, 1e-9)
                qps = Q_BATCH / per
                sweep[str(nprobe)] = {"qps": round(qps, 1),
                                      "recall_at_10": round(rec, 4)}
                if rec >= 0.99 and best is None:
                    best = (nprobe, qps, rec)
            ivf_extras["ivf_sweep"] = sweep
            if best is not None:
                results["ivf"] = {"qps": best[1], "batch_ms": Q_BATCH / best[1] * 1e3,
                                  "rtt_ms": 0.0}
                recalls["ivf"] = best[2]
        except Exception as e:
            print(f"# ivf variant failed: {type(e).__name__}: {e}")

    # winner: fastest path meeting the recall gate
    eligible = {v: r for v, r in results.items() if recalls[v] >= 0.99}
    pool = eligible or results
    winner = max(pool, key=lambda v: pool[v]["qps"])
    win = results[winner]

    out = {
        "metric": f"top{K}_qps_1chip_{n_db/1e6:g}M_x_{DIM}d_recall99",
        "value": round(win["qps"], 1),
        "unit": "qps",
        "vs_baseline": round(win["qps"] / NORTH_STAR_QPS, 4),
        "recall_at_10_vs_fp32_exact": round(recalls[winner], 4),
        "winner": winner,
        "batch_latency_ms": round(win["batch_ms"], 3),
        "q_batch": Q_BATCH,
        "n_db": n_db,
        "all_paths": {
            v: {"qps": round(r["qps"], 1),
                "recall_at_10": round(recalls[v], 4)}
            for v, r in results.items()
        },
        "platform": platform,
        **ivf_extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
