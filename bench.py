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

Every measured path is the SHIPPED library code (ops/distance.exact_search,
ops/quantize.int8_search / int8_rerank_search) — the bench wraps them in the
amortized-timing scan but does not reimplement the kernels, so measured
tuning IS what a library user gets. Recall gates run on >=1024 queries
(sigma ~1e-3 at p=0.99, tight enough for 0.99-gate decisions).

Recall oracle note: no ``faiss`` wheel exists in this image, so recall@10 is
measured against this repo's fp32-exact scan (rank-order verified against
numpy float64 in tests/) rather than literal ``faiss.IndexFlatL2`` output —
BASELINE config #3's "parity with FAISS" is argued via that oracle.

Paths compared (best wins, recall-gated at 0.99 vs the fp32 exact oracle):
- exact:       bf16 storage, chunked fused scan, ``lax.top_k`` (rank-exact)
- approx:      bf16 storage, ``lax.approx_max_k`` per chunk (XLA's TPU
               PartialReduce ANN selection, recall_target=0.99) + exact merge
- int8_approx: SQ8 storage (per-row scales, exact fp32 norms), int8 MXU
               matmul with int32 accumulation (2x bf16 throughput on v5e),
               approx selection (recall_target=0.995, the library default)
- int8_rerank: two-stage — the int8 scan keeps its cheap per-chunk top-2K
               selection but skips the cross-chunk merge; an exact bf16
               rerank over the n_chunks*2K candidates (a tiny gather +
               matmul) restores the recall the quantized cross-term loses
               (FlatIndex(dtype="int8", selector="rerank"))
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
MAX_REPS = 512  # honest-timing escalation ceiling (see timed()): at the
#                 Pallas path's ~0.4 ms/batch, 512 reps ≈ 200 ms of real
#                 work — safely above any observed tunnel RTT (30-90 ms)
RECALL_QUERIES = 1024  # sigma(recall@10) ~ 1e-3 at p=0.99 — gate-decision grade
NORTH_STAR_QPS = 1_000_000.0
# Physical sanity bound for the roofline gate (docs/PERF.md checklist #5:
# "a number above the roofline is a measurement bug, not a win"). Every
# measured path is HBM-bound, so a generous upper bound on any current
# chip's HBM bandwidth (v5e 819 GB/s, v5p 2765, v6e 1640) caps plausible
# QPS; anything above it is a timing artifact and is excluded from the
# winner pool.
HBM_BYTES_PER_S_BOUND = 3.0e12


def _scan_factory(variant: str):
    """Wrap the SHIPPED library search paths in the amortized-timing harness.

    ``single(q, ...)`` is exactly what FlatIndex.search dispatches to for the
    corresponding (dtype, selector) config; ``many`` runs REPS batches inside
    one jit with a checksum-only output (the honest-timing protocol).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rag_faiss_embedding_tpu.ops import distance as dist_ops
    from rag_faiss_embedding_tpu.ops.quantize import (
        int8_rerank_search,
        int8_search,
        quantize_rows,
    )

    quantized = variant.startswith("int8")

    if quantized:
        rerank = variant.endswith("rerank")

        def run_one(q_f32, db_i8, db_scale, db_sq, shadow):
            n_valid = jnp.int32(db_i8.shape[0])
            q_sq = dist_ops.sqnorms(q_f32)
            q_i8, q_scale = quantize_rows(q_f32)
            if rerank:
                return int8_rerank_search(
                    q_f32, q_i8, q_scale, q_sq, db_i8, db_scale, db_sq,
                    shadow, K, metric="L2", n_valid=n_valid,
                    chunk_size=CHUNK, cand_per_chunk=2 * K,
                )
            return int8_search(
                q_i8, q_scale, q_sq, db_i8, db_scale, db_sq, K,
                metric="L2", n_valid=n_valid, chunk_size=CHUNK,
                selector="approx",
            )

        @jax.jit
        def many(qstack, db_i8, db_scale, db_sq, shadow):
            def body(acc, q):
                bv, bi = run_one(q, db_i8, db_scale, db_sq, shadow)
                bv = jnp.where(jnp.isfinite(bv), bv, 0.0)
                return acc + bv.sum() + bi.sum().astype(jnp.float32), None
            acc, _ = lax.scan(body, jnp.float32(0.0), qstack)
            return acc

        @jax.jit
        def single(q, db_i8, db_scale, db_sq, shadow):
            return run_one(q, db_i8, db_scale, db_sq, shadow)

        return many, single

    selector = "approx" if variant == "approx" else "exact"

    def run_one(q_bf16, db_bf16, db_sq):
        return dist_ops._exact_search_impl(
            q_bf16, db_bf16, K, metric="L2", db_sq=db_sq,
            n_valid=jnp.int32(db_bf16.shape[0]), chunk_size=CHUNK,
            selector=selector,
        )

    @jax.jit
    def many(qstack, db_bf16, db_sq):
        def body(acc, q):
            bv, bi = run_one(q, db_bf16, db_sq)
            bv = jnp.where(jnp.isfinite(bv), bv, 0.0)
            return acc + bv.sum() + bi.sum().astype(jnp.float32), None
        acc, _ = lax.scan(body, jnp.float32(0.0), qstack)
        return acc

    @jax.jit
    def single(q, db_bf16, db_sq):
        return run_one(q, db_bf16, db_sq)

    return many, single


def _orchestrate() -> None:
    """Run the flat paths and the IVF sweep in SEPARATE processes and merge.

    r04 evidence: the Pallas IVF sweep died twice with a TPU
    INVALID_ARGUMENT when run in the same process as the flat-path timing
    (dozens of compiled programs + a churned heap), while identical
    isolated runs passed. A fresh TPU client per stage is the only
    arrangement observed to be reliable, and it also respects the
    one-TPU-process rule (stages run strictly sequentially). Each stage
    regenerates the identical on-device dataset (same PRNG key), so the
    recall oracles agree across stages.
    """
    import os
    import subprocess
    import sys

    stage_out = {}
    for stage, flag in (("flat", "RFE_BENCH_NO_IVF"),
                        ("ivf", "RFE_BENCH_IVF_ONLY")):
        env = dict(os.environ)
        env[flag] = "1"
        env["RFE_BENCH_STAGE"] = stage
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            stdout=subprocess.PIPE, text=True, env=env)
        parsed = None
        for ln in proc.stdout.splitlines():
            if ln.startswith("{"):
                try:
                    parsed = json.loads(ln)
                except json.JSONDecodeError:
                    pass
            else:
                relay = ln[2:] if ln.startswith("# ") else ln
                print(f"# [{stage}] {relay}", flush=True)
        if parsed is None:
            print(f"# stage {stage} produced no JSON (rc={proc.returncode})",
                  flush=True)
        stage_out[stage] = parsed
    flat, ivf = stage_out.get("flat"), stage_out.get("ivf")
    if flat is None and ivf is None:
        raise SystemExit("both bench stages failed")
    base = flat or ivf
    all_paths = {}
    for src in (flat, ivf):
        if src:
            all_paths.update(src.get("all_paths", {}))
    if not all_paths:
        # e.g. the flat stage died without JSON and the IVF stage emitted
        # only its zero-pool diagnostic — still ship the sweep diagnostics
        out = dict(base)
        out.update({"all_paths": {}, "staged": True})
        print(json.dumps(out))
        return

    def _honest(r):
        roof = r.get("roofline_qps")
        return r.get("resolved", True) and (roof is None or r["qps"] <= roof)

    eligible = {v: r for v, r in all_paths.items()
                if r.get("recall_at_10", 0.0) >= 0.99 and _honest(r)}
    pool = (eligible or
            {v: r for v, r in all_paths.items() if _honest(r)} or all_paths)
    winner = max(pool, key=lambda v: pool[v]["qps"])
    win = all_paths[winner]
    qb = base.get("q_batch", Q_BATCH)
    out = dict(base)
    out.update({
        "value": round(win["qps"], 1),
        "vs_baseline": round(win["qps"] / NORTH_STAR_QPS, 4),
        "recall_at_10_vs_fp32_exact": win.get("recall_at_10"),
        "winner": winner,
        "batch_latency_ms": round(qb / win["qps"] * 1e3, 3),
        "timing_resolved": bool(win.get("resolved", True)),
        "all_paths": all_paths,
        "staged": True,
    })
    out.pop("timing_reps", None)
    if ivf:
        for k in ("index_build_vectors_per_s", "index_build_vectors_per_s_cold",
                  "index_build_s", "ivf_sweep", "ivf_window",
                  "ivf_spill_rows", "ivf_best"):
            if k in ivf:
                out[k] = ivf[k]
    print(json.dumps(out))


def main() -> None:
    import os as _os

    # Default on the real bench: split flat paths and the IVF sweep into
    # two fresh TPU processes (see _orchestrate). Dev/CPU/partial modes
    # run single-process as before.
    if _os.environ.get("RFE_BENCH_STAGE") is None and (
            _os.environ.get("RFE_BENCH_FORCE_SPLIT")
            or (not _os.environ.get("RFE_BENCH_NO_SPLIT")
                and not _os.environ.get("RFE_BENCH_IVF_ONLY")
                and not _os.environ.get("RFE_BENCH_NO_IVF")
                and not _os.environ.get("RFE_BENCH_FAST")
                and not _os.environ.get("RFE_BENCH_CPU")
                and _os.environ.get("JAX_PLATFORMS", "").lower() != "cpu")):
        return _orchestrate()

    import jax

    if _os.environ.get("RFE_BENCH_CPU"):
        # true CPU dev run: the axon env ignores JAX_PLATFORMS=cpu from the
        # environment — force it before first backend use
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    # CPU fallback scales for dev runs (numbers only meaningful on TPU)
    global REPS, Q_BATCH, CHUNK, RECALL_QUERIES
    if platform != "tpu":
        n_db, REPS, Q_BATCH, CHUNK = 131072, 2, 256, 131072
        RECALL_QUERIES = min(RECALL_QUERIES, Q_BATCH)
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
    jax.block_until_ready((db_c, sq_c, qstack))

    trivial = jax.jit(lambda x: x.sum())
    float(trivial(sq_c))

    import os

    # SQ8 arrays (derived on device from the same f32 data; identical to
    # what FlatIndex(dtype="int8").add computes)
    from rag_faiss_embedding_tpu.ops.quantize import quantize_rows

    db_i8_flat, db_scales = jax.jit(quantize_rows)(db_c32.reshape(n_db, DIM))
    jax.block_until_ready((db_i8_flat, db_scales))

    db_flat16 = db_c.reshape(n_db, DIM)
    db_sq = sq_c.reshape(-1)
    def timed(fn, qstack_in, *args, max_scan=None):
        """Median-of-3 trivial-dispatch RTT, fastest-of-3 PIPELINED timed
        regions — single-shot timing at <5 ms/batch is swamped by tunnel
        RTT jitter (one sweep measured 0.0 ms for a 2.7 ms batch).

        Each timed region dispatches ``PIPE`` executions back-to-back and
        blocks once at the end: executions serialize on-device, so the
        region covers PIPE*reps batches of pure device work plus ONE
        result fetch — the same region a steady-state service sees. This
        keeps the region comfortably above the RTT without growing the
        scan length (>=128-rep scans of the pallas program deterministically
        die on their second execution with a TPU INVALID_ARGUMENT, r04
        /tmp/repro_esc; 64-rep scans repeat indefinitely).

        Honest-timing guard (docs/PERF.md checklist #5): if the region
        STILL isn't comfortably larger than the RTT, escalate the scan
        length 4x and re-time (the jitted scan specializes on the leading
        dim); a length that crashes falls back to the last working
        length's lower bound. Returns (per_batch_s, rtt_s, reps_used,
        resolved); unresolved timings are excluded from the winner pool by
        the caller.
        """
        PIPE = 4
        reps = int(qstack_in.shape[0])
        stack = qstack_in
        prev = None
        while True:
            try:
                float(fn(stack, *args))  # compile+warm at this scan length
                rtts = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    float(trivial(sq_c))
                    rtts.append(time.perf_counter() - t0)
                rtt = sorted(rtts)[1]
                best = None
                for _ in range(3):
                    t0 = time.perf_counter()
                    outs = [fn(stack, *args) for _ in range(PIPE)]
                    float(outs[-1])
                    el = time.perf_counter() - t0
                    best = el if best is None else min(best, el)
            except Exception as e:
                if prev is not None:
                    print(f"# timed: {reps}-rep scan failed "
                          f"({type(e).__name__}); keeping {prev[2]}-rep "
                          f"lower bound", flush=True)
                    return prev
                if PIPE > 1:
                    # r04 lore: queueing a second execution of a Pallas
                    # program before the first is consumed can die with a
                    # TPU INVALID_ARGUMENT on the axon backend (the flat
                    # XLA programs pipeline fine). Retry this scan length
                    # with fully blocking single-execution regions.
                    print(f"# timed: {reps}-rep PIPE={PIPE} region failed "
                          f"({type(e).__name__}); retrying sequential",
                          flush=True)
                    PIPE = 1
                    continue
                raise
            # resolved when the WORK part both dominates the RTT and is
            # large in absolute terms (RTT jitter between trivial
            # dispatches is several ms — subtracting a 33±5 ms RTT from a
            # 40 ms region would put 15%+ noise on the headline)
            nb = reps * PIPE      # batches per timed region
            if best - rtt > max(rtt, 0.030):
                return (best - rtt) / nb, rtt, reps, True
            # ≥128-rep scans of a Pallas program die deterministically on
            # their second execution (r04 /tmp/repro_esc) and the crash
            # poisons the whole client; 64 is the proven-safe scan-length
            # ceiling for PALLAS programs (the caller flags them via
            # max_scan). XLA programs pipeline and scan fine at any length
            # (r04 evidence), so they keep the full escalation ceiling even
            # in sequential-fallback mode.
            ceiling = min(max_scan, 64) if max_scan else MAX_REPS
            if reps >= ceiling:
                # still RTT-dominated at the ceiling: report a LOWER BOUND
                # on latency (never a fictitious upper bound) and mark it
                per = max(best - rtt, 0.5 * rtt) / nb
                return per, rtt, reps, False
            prev = (max(best - rtt, 0.5 * rtt) / nb, rtt, reps, False)
            new_reps = min(ceiling, reps * 4)
            stack = jnp.concatenate([stack] * ((new_reps + reps - 1) // reps),
                                    axis=0)[:new_reps]
            reps = new_reps

    if os.environ.get("RFE_BENCH_IVF_ONLY"):
        variants = ()       # debug: isolate the IVF sweep from the flat paths
    elif os.environ.get("RFE_BENCH_FAST"):
        variants = ("approx", "int8_rerank")
    else:
        variants = ("approx", "int8_approx", "int8_rerank", "exact")
    results = {}
    singles = {}
    variant_args = {}
    for variant in variants:
        try:
            many, single = _scan_factory(variant)
            quant_v = variant.startswith("int8")
            if variant.startswith("int8"):
                args = (qstack32, db_i8_flat, db_scales, db_sq, db_flat16)
            else:
                args = (qstack, db_flat16, db_sq)
            variant_args[variant] = args[1:]
            per_batch, rtt, reps_used, resolved = timed(many, *args)
            # bytes the path must pull from HBM per query batch (storage
            # only — the roofline gate needs a floor, not an exact model)
            bpb = n_db * DIM * (1 if quant_v else 2)
            results[variant] = {
                "qps": Q_BATCH / per_batch,
                "batch_ms": per_batch * 1e3,
                "rtt_ms": rtt * 1e3,
                "reps": reps_used,
                "resolved": resolved,
                "roofline_qps": HBM_BYTES_PER_S_BOUND / bpb * Q_BATCH,
            }
            singles[variant] = single
        except Exception as e:  # one broken variant must not kill the bench
            print(f"# variant {variant} failed: {type(e).__name__}: {e}")
    if not results and not os.environ.get("RFE_BENCH_IVF_ONLY"):
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
            qsub = (qstack32 if variant.startswith("int8") else qstack)[0]
            _, pred = single(qsub[:RECALL_QUERIES], *variant_args[variant])
            pred = np.asarray(pred)
            hits = sum(
                len(set(p.tolist()) & set(t.tolist()))
                for p, t in zip(pred, truth)
            )
            recalls[variant] = hits / truth.size
        except Exception as e:
            print(f"# recall check for {variant} failed: {e}")
            recalls[variant] = 0.0

    # CI-style guard: the shipped FlatIndex CLASS in its gated int8 config
    # (selector="rerank" — plain int8+approx is honestly 0.980 at 1024
    # queries on mixture data; round 1's 0.9906 was a 64-query
    # overestimate) must itself meet the 0.99 gate — catches any future
    # bench/library divergence.
    library_class_recall = None
    try:
        if os.environ.get("RFE_BENCH_IVF_ONLY"):
            raise RuntimeError("skipped: RFE_BENCH_IVF_ONLY")
        from rag_faiss_embedding_tpu.index import FlatIndex

        fidx = FlatIndex(DIM, dtype="int8", selector="rerank",
                         capacity=n_db)
        fidx.add(db_c32.reshape(n_db, DIM))
        _, pred = fidx.search(sub_q, K, chunk_size=CHUNK)
        pred = np.asarray(pred)
        hits = sum(len(set(p.tolist()) & set(t.tolist()))
                   for p, t in zip(pred, truth))
        library_class_recall = hits / truth.size
        if library_class_recall < 0.99:
            print(f"# WARNING: FlatIndex int8+rerank below gate: "
                  f"{library_class_recall:.4f}")
        del fidx
    except Exception as e:
        print(f"# library-class recall guard failed: {type(e).__name__}: {e}")

    # free the flat-path device arrays before the IVF sweep: the bf16/int8
    # copies + scales total ~1.5 GB of ballast the sweep never touches, and
    # the r04 sweep's first timed run died twice in a row with a TPU
    # INVALID_ARGUMENT in the full-bench process while isolated repros with
    # a lean heap passed — keep the headline section's HBM headroom maximal
    mem = (jax.local_devices()[0].memory_stats() or {})
    print(f"# hbm in use before ivf sweep: "
          f"{mem.get('bytes_in_use', 0)/1e9:.2f} GB", flush=True)
    del singles, variant_args, db_flat16, db_c, db_i8_flat, db_scales, qstack

    # ------------------------------------------------------------- IVF tier
    # The fused batched kernel (ops/ivf_scan.py) IS the shipped
    # IVFFlatIndex.search path; the bench wraps fused_ivf_search_math in the
    # checksum harness and sweeps nprobe. int8 storage composes IVF pruning
    # with the int8 bandwidth/MXU win — the only route past the flat-scan
    # roofline (docs/PERF.md).
    ivf_extras = {}
    if not os.environ.get("RFE_BENCH_NO_IVF"):
        try:
            from jax import lax

            from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex
            from rag_faiss_embedding_tpu.ops.ivf_scan import (
                default_union_cap,
                fused_ivf_search_math,
                pick_query_chunk,
            )

            # nlist ~ sqrt(N)*8: at 1M the 8192-list build keeps windows at
            # 2x the 128-row mean with ZERO spill (donor-split training +
            # 2x-capacity greedy reassignment). bf16 storage wins the gated
            # sweep: int8's quantized cross term needs the shadow rerank to
            # pass 0.99, and that row gather costs more than bf16's extra
            # byte/dim of block-gather bandwidth (benchmarks/ivf_sweep.py).
            idx = IVFFlatIndex(DIM, nlist=8192 if n_db >= 500_000 else 64,
                               dtype="bfloat16", train_iters=10,
                               balance="reassign")
            t0 = time.perf_counter()
            idx.build(db_c32.reshape(n_db, DIM))
            build_s = time.perf_counter() - t0
            # warm/cold pair (VERDICT r03 #5): the cold number is dominated
            # by remote XLA compiles through the axon tunnel (~270 s of a
            # 330 s 1M build in BUILD_r03); a rebuild at identical shapes
            # reuses every compiled program and is what a long-lived
            # service actually pays per re-index.
            t0 = time.perf_counter()
            idx2 = IVFFlatIndex(DIM, nlist=idx.nlist, dtype="bfloat16",
                                train_iters=10, balance="reassign")
            idx2.build(db_c32.reshape(n_db, DIM))
            warm_s = time.perf_counter() - t0
            warm_stats = dict(idx2.build_stats)
            del idx2
            ivf_extras["index_build_vectors_per_s"] = round(n_db / warm_s, 1)
            ivf_extras["index_build_vectors_per_s_cold"] = round(
                n_db / build_s, 1)
            ivf_extras["index_build_s"] = {"cold": round(build_s, 1),
                                           "warm": round(warm_s, 1)}
            # stage decomposition (VERDICT r04 #5: the r04 artifact lost
            # it, making the 331->690 s cold regression unattributable)
            def _stages(stats):
                out = {k: round(v, 2) for k, v in stats.items()
                       if isinstance(v, (int, float))}
                if isinstance(stats.get("train"), dict):
                    out["train_stages"] = {
                        k: round(v, 2) if isinstance(v, float) else v
                        for k, v in stats["train"].items()}
                return out
            ivf_extras["index_build_stages_s"] = {
                "cold": _stages(idx.build_stats),
                "warm": _stages(warm_stats)}
            window = idx._window
            spill = idx._pending_dev() if idx._pending.ntotal else None
            fused_args = (idx._cent_store, idx._cent_sq, idx._sorted_vecs,
                          idx._sorted_scales, idx._sorted_sq, idx._sorted_ids,
                          idx._sorted_shadow)

            def make_ivf(nprobe, ucap, qc, backend, pv):
                # big arrays ride as jit ARGS (closed-over constants blow the
                # axon remote-compile body limit, HTTP 413)
                def many(qs, cent, cent_sq, codes, scales, sq, ids, shadow,
                         *sp):  # qs: (REPS, Q_BATCH, DIM)
                    sp = sp if sp else None

                    def body(acc, q):
                        v, i = fused_ivf_search_math(
                            q, cent, cent_sq, codes, scales, sq, ids, sp,
                            shadow,
                            k=K, nprobe=nprobe, window=window, metric="L2",
                            recall_target=idx.recall_target,
                            union_cap=ucap, qc=qc,
                            rerank_depth=idx.rerank_depth,
                            union_mode=idx._resolved_union_mode(),
                            backend=backend, pallas_cap=idx.pallas_cap,
                            pallas_variant=pv,
                        )
                        v = jnp.where(jnp.isfinite(v), v, 0.0)
                        return acc + v.sum() + i.sum().astype(jnp.float32), None

                    acc, _ = lax.scan(body, jnp.float32(0.0), qs)
                    return acc
                return jax.jit(many)

            # Explicit config sweep: both kernel variants and the XLA
            # backend (a Pallas regression can never silently cost the
            # headline), plus DMA-lever configs — the v2 kernel is
            # DMA-bound at ~410 GB/s effective (pallas_profile r04), so
            # bigger query chunks / tighter unions trade recall for block
            # reads. Recall is measured through the SAME math-level call
            # that is timed (identical nprobe/ucap/qc/backend/variant).
            def cfg(tag, nprobe, backend, pv, qc=None, ucap=None):
                return dict(tag=tag, nprobe=nprobe, backend=backend, pv=pv,
                            qc=qc, ucap=ucap)

            # The SHIP-WHAT-YOU-BENCH config (VERDICT r04 #8): exactly what
            # a defaults call to idx.search dispatches — resolved through
            # the same resolve_fused_dispatch the class uses, no sweep
            # overrides. Its QPS/recall is recorded as library_default_*
            # whatever the winner is, so a defaults/sweep divergence (r04:
            # the shipped default was a kernel the bench never timed) can
            # never again hide behind a passing headline.
            lib = idx.resolved_dispatch(nq=Q_BATCH, k=K)
            ivf_extras["library_default_dispatch"] = {
                k: v for k, v in lib.items()
                if isinstance(v, (int, float, str, bool))}

            # ORDER MATTERS: the first TPU INVALID_ARGUMENT poisons the
            # whole client process (r04: after one v2-kernel crash, even a
            # trivial device slice failed), so sweep most-reliable first —
            # XLA, then the r03-proven v1 kernel + its DMA levers, and the
            # v2 kernel (dies on its first scan-wrapped execution on the
            # axon backend; never yet produced a timed number — now demoted
            # to an experimental opt-in, kept here only as a one-slot
            # does-it-still-crash probe) dead last. The known-recall-broken
            # qc512 lever is gone: query_chunk_recall_safe(512, 256) is
            # False, so the slot could never pass the gate (r04 weak #6).
            cfgs = [
                cfg("xla_np16", 16, "xla", 1),
                cfg("library_default", lib["nprobe"], lib["backend"],
                    lib["pallas_variant"], qc=lib["qc"],
                    ucap=lib["union_cap"]),
                cfg("pallas_np16", 16, "pallas", 1),
                cfg("pallas_np12", 12, "pallas", 1),
                cfg("pallas_np16_u192", 16, "pallas", 1, ucap=192),
                cfg("pallas_np24", 24, "pallas", 1),
                cfg("pallas2_np16", 16, "pallas", 2),
            ] if platform == "tpu" else [
                cfg("xla_np16", 16, "xla", 1),
                cfg("library_default", lib["nprobe"], lib["backend"],
                    lib["pallas_variant"], qc=lib["qc"],
                    ucap=lib["union_cap"]),
            ]

            def make_single(nprobe, ucap, qc, backend, pv):
                def single(q, cent, cent_sq, codes, scales, sq, ids,
                           shadow, *sp):
                    sp = sp if sp else None
                    return fused_ivf_search_math(
                        q, cent, cent_sq, codes, scales, sq, ids, sp,
                        shadow,
                        k=K, nprobe=nprobe, window=window, metric="L2",
                        recall_target=idx.recall_target,
                        union_cap=ucap, qc=qc,
                        rerank_depth=idx.rerank_depth,
                        union_mode=idx._resolved_union_mode(),
                        backend=backend, pallas_cap=idx.pallas_cap,
                        pallas_variant=pv,
                    )
                return jax.jit(single)

            sweep = {}
            best = None
            for c in cfgs:
                # one crashing config must not lose the sweep (r04: a TPU
                # INVALID_ARGUMENT in the first cfg's timed run erased all
                # IVF results from the official artifact)
                try:
                    nprobe = c["nprobe"]
                    ucap = c["ucap"] or default_union_cap(idx.nlist, nprobe)
                    qc = c["qc"] or pick_query_chunk(
                        nprobe, window, DIM, jnp.dtype(idx.dtype).itemsize,
                        Q_BATCH, union_cap=ucap)
                    args = fused_args + (spill if spill is not None else ())
                    single = make_single(nprobe, ucap, qc, c["backend"],
                                         c["pv"])
                    _, pred = single(qstack32[0][:RECALL_QUERIES], *args)
                    pred = np.asarray(pred)
                    hits = sum(len(set(p.tolist()) & set(t.tolist()))
                               for p, t in zip(pred, truth))
                    rec = hits / truth.size
                    many = make_ivf(nprobe, ucap, qc, c["backend"], c["pv"])
                    per, _, reps_used, resolved = timed(
                        many, qstack32, *args,
                        max_scan=64 if c["backend"] == "pallas" else None)
                    qps = Q_BATCH / per
                    # union-block reads per batch (codes + sq + ids), the
                    # HBM floor of the fused path
                    n_qc = -(-Q_BATCH // qc)
                    bpb = n_qc * ucap * window * (DIM * 2 + 8)
                    roof = HBM_BYTES_PER_S_BOUND / bpb * Q_BATCH
                    sweep[c["tag"]] = {
                        "qps": round(qps, 1), "recall_at_10": round(rec, 4),
                        "union_cap": ucap, "query_chunk": qc,
                        "reps": reps_used, "resolved": resolved,
                        "roofline_qps": round(roof, 1)}
                    if (rec >= 0.99 and resolved and qps <= roof
                            and (best is None or qps > best[1])):
                        best = (nprobe, qps, rec, c["tag"])
                except Exception as e:
                    import traceback
                    print(f"# ivf cfg {c['tag']} failed: "
                          f"{type(e).__name__}: {e}", flush=True)
                    traceback.print_exc()
                    sweep[c["tag"]] = {"error": f"{type(e).__name__}: {e}"}
                    # a TPU INVALID_ARGUMENT poisons the client process —
                    # verify it still executes anything at all, else stop
                    # burning time on configs that can only fail
                    try:
                        float(trivial(sq_c))
                    except Exception:
                        print("# device client poisoned; abandoning the "
                              "remaining sweep configs", flush=True)
                        sweep["_client_poisoned_after"] = c["tag"]
                        break
            ivf_extras["ivf_sweep"] = sweep
            ivf_extras["ivf_window"] = window
            ivf_extras["ivf_spill_rows"] = int(idx._pending.ntotal)
            if best is not None:
                results["ivf"] = {"qps": best[1], "batch_ms": Q_BATCH / best[1] * 1e3,
                                  "rtt_ms": 0.0, "resolved": True,
                                  "roofline_qps": sweep[best[3]]["roofline_qps"]}
                recalls["ivf"] = best[2]
                ivf_extras["ivf_best"] = {"nprobe": best[0],
                                          "config": best[3]}
        except Exception as e:
            import traceback
            print(f"# ivf variant failed: {type(e).__name__}: {e}")
            traceback.print_exc()

    # winner: fastest path meeting the recall gate AND the honesty gates —
    # the timing must be RTT-resolved and physically below the HBM roofline
    # (docs/PERF.md checklist #5; round 3's 1.024e12 QPS artifact is what
    # these gates exist to reject)
    def _honest(r):
        return r.get("resolved", True) and r["qps"] <= r.get(
            "roofline_qps", float("inf"))

    eligible = {v: r for v, r in results.items()
                if recalls[v] >= 0.99 and _honest(r)}
    pool = eligible or {v: r for v, r in results.items() if _honest(r)}
    pool = pool or results
    if not pool:
        # IVF-only stage where no config passed the gates: still emit the
        # sweep diagnostics so the orchestrator can merge/record them
        print(json.dumps({
            "metric": f"top{K}_qps_1chip_{n_db/1e6:g}M_x_{DIM}d_recall99",
            "value": 0.0, "unit": "qps", "vs_baseline": 0.0,
            "winner": None, "q_batch": Q_BATCH, "n_db": n_db,
            "platform": platform, "all_paths": {}, **ivf_extras,
        }))
        return
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
        "timing_resolved": bool(win.get("resolved", True)),
        "timing_reps": win.get("reps"),
        "all_paths": {
            v: {"qps": round(r["qps"], 1),
                "recall_at_10": round(recalls[v], 4),
                "resolved": bool(r.get("resolved", True)),
                "roofline_qps": round(r["roofline_qps"], 1)
                if r.get("roofline_qps") is not None else None}
            for v, r in results.items()
        },
        "platform": platform,
        "recall_queries": RECALL_QUERIES,
        "recall_oracle": "fp32_exact_scan (no faiss wheel in image; "
                         "rank-parity vs numpy float64 covered in tests/)",
        **({"library_class_recall_at_10": round(library_class_recall, 4)}
           if library_class_recall is not None else {}),
        **ivf_extras,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
