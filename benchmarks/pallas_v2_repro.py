"""Isolated repro for the v2 Pallas union-scan TPU failure (VERDICT r04 #1).

The v2 kernel (premasked-sqnorm carrier + optional in-kernel top-k,
ops/pallas_ivf.py variant=2) passes CPU interpret-mode parity but dies on
the axon TPU backend with a Mosaic ``INVALID_ARGUMENT`` on its first
scan-wrapped execution — and the crash poisons the whole client process
(BENCH_r04 ivf_sweep["pallas2_np16"]). This tool isolates WHICH execution
shape kills it, cheaply and in the documented safe order.

FIRST TPU RESULT (r05, 2026-08-21): steps 1-3 all PASS on the real chip —
the v2 kernel body is NOT the problem: direct (un-jitted) execution works
both without and WITH the in-kernel top-k. Steps 4-6 of that run were
voided by a repro-tool bug (jit closures captured the index arrays ->
remote-compile HTTP 413, now fixed below: big arrays ride as jit
arguments). The remaining bisect — jit x1 / jit x2 / scan-wrapped — is
the standing first action on the next TPU window; the bench crash is now
known to live in the jit/scan execution wrapper, not in Mosaic codegen
of the kernel itself.

    1. v1 direct call            (control — known good)
    2. v2 direct, k=17           (no in-kernel top-k: base kernel only)
    3. v2 direct, k=10           (ktop path: in-kernel top-k engaged)
    4. v2 jit, 1 execution
    5. v2 jit, 2 executions      (r04: repeat-execution was the trigger
                                  for >=128-rep scans of v1)
    6. v2 inside lax.scan reps=4 (the bench harness shape that died)

Each step runs in its own subprocess so a poisoned runtime cannot mask
later steps; one failure does not block the rest of the report. Usage:

    python -m benchmarks.pallas_v2_repro            # all steps
    python -m benchmarks.pallas_v2_repro --step 4   # one step, in-process

Keep N small (256k) — the point is the execution wrapper, not scale.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

STEPS = {
    # (name, variant, mode, execs, k) — k=10 engages v2's in-kernel top-k
    # (ktop fires for k<=16); k=17 forces the packed-tile XLA decode path,
    # isolating the base v2 kernel from the ktop selection feature.
    1: ("v1 direct", "v1", "direct", 1, 10),
    2: ("v2 direct no-ktop", "v2", "direct", 1, 17),
    3: ("v2 direct ktop", "v2", "direct", 1, 10),
    4: ("v2 jit x1", "v2", "jit", 1, 10),
    5: ("v2 jit x2", "v2", "jit", 2, 10),
    6: ("v2 scan reps=4", "v2", "scan", 4, 10),
}


def run_step(step: int, cpu: bool = False) -> None:
    name, var, mode, execs, topk = STEPS[step]
    variant = 1 if var == "v1" else 2
    import jax

    if cpu:
        # true CPU smoke (interpret mode): the axon env ignores
        # JAX_PLATFORMS=cpu from the environment — force it before first
        # backend use, else a "smoke" run grabs the shared TPU tunnel
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex
    from rag_faiss_embedding_tpu.ops.ivf_scan import fused_ivf_search_math

    rng = np.random.default_rng(0)
    n, dim, nlist = 1 << 18, 384, 512
    db = rng.standard_normal((n, dim), dtype=np.float32)
    q = jnp.asarray(rng.standard_normal((256, dim), dtype=np.float32))
    idx = IVFFlatIndex(dim, nlist=nlist, dtype="bfloat16", train_iters=4,
                       balance="reassign", pallas_variant=variant)
    idx.build(db)
    args = (idx._cent_store, idx._cent_sq, idx._sorted_vecs,
            idx._sorted_scales, idx._sorted_sq, idx._sorted_ids, None, None)
    kw = dict(k=topk, nprobe=8, window=idx._window, metric="L2",
              recall_target=idx.recall_target,
              union_cap=idx.union_cap or 128, qc=64,
              rerank_depth=idx.rerank_depth,
              union_mode="minrank", backend="pallas",
              pallas_cap=idx.pallas_cap, pallas_variant=variant,
              interpret=jax.devices()[0].platform != "tpu")

    # big arrays ride as jit ARGUMENTS, never closures: closed-over
    # device arrays bake into the HLO as constants and overflow the axon
    # remote-compile body (HTTP 413 — exactly what the first TPU run of
    # steps 4-6 hit, masking the real question)
    big = tuple(a for a in args if a is not None)

    if mode == "direct":
        v, i = fused_ivf_search_math(q, *args, **kw)
        jax.block_until_ready((v, i))
    elif mode == "jit":
        def f_(qq, cent, cent_sq, codes, sq, ids):
            return fused_ivf_search_math(
                qq, cent, cent_sq, codes, None, sq, ids, None, None, **kw)

        f = jax.jit(f_)
        for e in range(execs):
            v, i = f(q + float(e), *big)
            jax.block_until_ready((v, i))
    else:  # scan
        from jax import lax

        def many(qs, cent, cent_sq, codes, sq, ids):
            def body(acc, one):
                v, i = fused_ivf_search_math(
                    one, cent, cent_sq, codes, None, sq, ids, None, None,
                    **kw)
                return acc + v.sum() + i.sum().astype(jnp.float32), None
            acc, _ = lax.scan(body, jnp.float32(0.0), qs)
            return acc
        qs = jnp.stack([q + float(r) for r in range(execs)])
        out = jax.jit(many)(qs, *big)
        jax.block_until_ready(out)
    print(json.dumps({"step": step, "name": name, "ok": True}))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--through", type=int, default=6,
                   help="stop after this step (crash hygiene: each TPU "
                        "INVALID_ARGUMENT risks wedging the tunnel)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (interpret-mode smoke; "
                        "NEVER touches the shared TPU tunnel)")
    args = p.parse_args()
    if args.step is not None:
        run_step(args.step, cpu=args.cpu)
        return
    for step in sorted(STEPS):
        if step > args.through:
            break
        proc = subprocess.run(
            [sys.executable, "-m", "benchmarks.pallas_v2_repro",
             "--step", str(step)] + (["--cpu"] if args.cpu else []),
            capture_output=True, text=True, timeout=1800,
        )
        ok = proc.returncode == 0
        tail = (proc.stdout + proc.stderr).strip().splitlines()[-3:]
        print(json.dumps({"step": step, "name": STEPS[step][0], "ok": ok,
                          "tail": tail if not ok else []}), flush=True)
        if not ok:
            # stop at the first failing shape: later steps are supersets,
            # and each crash risks wedging the shared tunnel
            break


if __name__ == "__main__":
    main()
