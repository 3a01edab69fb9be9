"""Kernel-stage microbench for the Pallas IVF union scan (TPU).

Isolates where the time goes by swapping the selection strategy on
IDENTICAL synthetic block data (no index build — u_all is a random
permutation, data shapes match the 1M production config):

  none     matmul + packed transform, no selection (writes last packed tile)
  chain    committed kernel: per-block scratch read/modify/write cap-chain
  temps    cap-chain carried in SSA temps, scratch touched once per cell
  temps_f32  temps variant with the chain on f32 max/min (bitcast packing)

Run: PYTHONPATH=. python benchmarks/pallas_kernel_probe.py
"""
import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from rag_faiss_embedding_tpu.ops.distance import NEG_INF
from rag_faiss_embedding_tpu.ops.pallas_scan import _monotone_i32
from rag_faiss_embedding_tpu.ops.pallas_ivf import _mono_i32_host

NLIST, WINDOW, DIM = 8192, 256, 384
QC, U, BB, CAP = 256, 260, 10, 2
CHUNKS, REPS = 4, 8
NBITS = 9
MASK = (1 << NBITS) - 1
INIT = _mono_i32_host(NEG_INF) & ~MASK

key = jax.random.PRNGKey(0)
codes3 = jax.random.normal(key, (NLIST + 1, WINDOW, DIM), jnp.bfloat16)
aux3 = jnp.concatenate([
    lax.bitcast_convert_type(
        jnp.abs(jax.random.normal(key, (NLIST + 1, 1, WINDOW))) * 300 + 100,
        jnp.int32),
    jnp.ones((NLIST + 1, 1, WINDOW), jnp.int32),
], axis=1)
qs = jax.random.normal(jax.random.fold_in(key, 1), (CHUNKS, QC, DIM),
                       jnp.bfloat16)
u_all = jnp.stack([
    jax.random.permutation(jax.random.fold_in(key, 10 + c),
                           NLIST)[:U].astype(jnp.int32)
    for c in range(CHUNKS)
])
u_all = jnp.sort(u_all, axis=1)
jax.block_until_ready((codes3, aux3, qs, u_all))
trivial = jax.jit(lambda x: x.sum())
float(trivial(qs))


def make_kernel(variant):
    def kern(u_ref, q_ref, *refs):
        blks = refs[:BB]
        auxs = refs[BB:2 * BB]
        out_ref = refs[2 * BB]
        runs = refs[2 * BB + 1]
        b = pl.program_id(1)

        if variant == "chain":
            @pl.when(b == 0)
            def _():
                runs[:] = jnp.full_like(runs[:], jnp.int32(INIT))

        q = q_ref[0]
        if variant.startswith("temps"):
            f32chain = variant == "temps_f32"
            if f32chain:
                init = lax.bitcast_convert_type(jnp.int32(INIT), jnp.float32)
                t_runs = [
                    jnp.where(b == 0, init,
                              pltpu.bitcast(runs[lvl], jnp.float32))
                    for lvl in range(CAP)
                ]
            else:
                t_runs = [
                    jnp.where(b == 0, jnp.int32(INIT), runs[lvl])
                    for lvl in range(CAP)
                ]
        last = None
        for j in range(BB):
            dots = lax.dot_general(
                q, blks[j][0], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            aux = auxs[j][0]
            rsq = pltpu.bitcast(aux[0:1, :], jnp.float32)
            rid = aux[1:2, :]
            s = jnp.where(rid >= 0, 2.0 * dots - rsq, NEG_INF)
            jglob = b * BB + j
            packed = (_monotone_i32(s) & jnp.int32(~MASK)) | jglob
            if variant == "none":
                last = packed
            elif variant == "chain":
                t = packed
                for lvl in range(CAP):
                    cur = runs[lvl]
                    runs[lvl] = jnp.maximum(cur, t)
                    t = jnp.minimum(cur, t)
            else:
                t = (pltpu.bitcast(packed, jnp.float32)
                     if variant == "temps_f32" else packed)
                for lvl in range(CAP):
                    cur = t_runs[lvl]
                    t_runs[lvl] = jnp.maximum(cur, t)
                    t = jnp.minimum(cur, t)
        if variant.startswith("temps"):
            for lvl in range(CAP):
                runs[lvl] = (pltpu.bitcast(t_runs[lvl], jnp.int32)
                             if variant == "temps_f32" else t_runs[lvl])

        @pl.when(b == pl.num_programs(1) - 1)
        def _():
            if variant == "none":
                out_ref[0, :, :WINDOW] = last
                for lvl in range(1, CAP):
                    out_ref[0, :, lvl * WINDOW:(lvl + 1) * WINDOW] = last
            else:
                for lvl in range(CAP):
                    out_ref[0, :, lvl * WINDOW:(lvl + 1) * WINDOW] = runs[lvl]
    return kern


def build(variant):
    in_specs = [pl.BlockSpec((1, QC, DIM), lambda c, b, u_pre: (c, 0, 0))]
    for j in range(BB):
        in_specs.append(pl.BlockSpec(
            (1, WINDOW, DIM),
            lambda c, b, u_pre, j=j: (u_pre[c, b * BB + j], 0, 0)))
    for j in range(BB):
        in_specs.append(pl.BlockSpec(
            (1, 2, WINDOW),
            lambda c, b, u_pre, j=j: (u_pre[c, b * BB + j], 0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(CHUNKS, U // BB),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, QC, CAP * WINDOW),
                               lambda c, b, u_pre: (c, 0, 0)),
        scratch_shapes=[pltpu.VMEM((CAP, QC, WINDOW), jnp.int32)],
    )
    call = pl.pallas_call(
        make_kernel(variant), grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((CHUNKS, QC, CAP * WINDOW), jnp.int32),
    )

    @jax.jit
    def many(u_all, qs, codes3, aux3):
        def body(acc, _):
            out = call(u_all, qs, *([codes3] * BB), *([aux3] * BB))
            return acc + out.sum(dtype=jnp.int32), None
        acc, _ = lax.scan(body, jnp.int32(0), None, length=REPS)
        return acc
    return many


for variant in ("none", "chain", "temps", "temps_f32"):
    try:
        many = build(variant)
        int(many(u_all, qs, codes3, aux3))
        rtts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(trivial(qs))
            rtts.append(time.perf_counter() - t0)
        rtt = sorted(rtts)[1]
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            int(many(u_all, qs, codes3, aux3))
            el = time.perf_counter() - t0
            best = el if best is None else min(best, el)
        per = max((best - rtt) / REPS, 1e-9)
        print(json.dumps({"variant": variant, "ms_per_batch":
                          round(per * 1e3, 3)}), flush=True)
    except Exception as e:
        print(json.dumps({"variant": variant,
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)
