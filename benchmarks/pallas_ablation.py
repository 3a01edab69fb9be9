"""On-chip ablation: Pallas exact kernel vs the XLA scan paths.

Uses the same amortized honest protocol as bench.py (REPS batches inside one
jit returning a checksum; on-device data; RTT subtracted). Run ONLY on a
quiet TPU:

    python -m benchmarks.pallas_ablation [pallas_exact|lax_exact|lax_approx ...]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

N, D, Q, K, REPS = 1_048_576, 384, 1024, 10, 8
TILE_Q, TILE_N = 256, 2048


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rag_faiss_embedding_tpu.ops import distance as dist_ops
    from rag_faiss_embedding_tpu.ops import pallas_scan

    variants = sys.argv[1:] or ["lax_approx", "pallas_exact"]
    key = jax.random.PRNGKey(0)
    db = jax.jit(lambda k: jax.random.normal(k, (N, D), jnp.bfloat16))(key)
    qstack = jax.jit(
        lambda k: jax.random.normal(k, (REPS, Q, D), jnp.bfloat16)
    )(jax.random.fold_in(key, 1))
    sq = jax.jit(lambda d: jnp.sum(d.astype(jnp.float32) ** 2, -1))(db)
    nv = jnp.int32(N)
    jax.block_until_ready((db, qstack, sq))
    trivial = jax.jit(lambda x: x.sum())
    float(trivial(sq))

    def make(variant):
        # NB: the database MUST be a function argument, not a closure — a
        # closed-over concrete array becomes an HLO constant and the tunnel's
        # remote-compile endpoint rejects the ~GB payload (HTTP 413).
        if variant.startswith("pallas"):
            # the packed-group approx mode was dropped (lost to XLA
            # approx_max_k at the flat tier); only the exact kernel remains
            def one(q, db_a, sq_a):
                return pallas_scan._flat_search_impl(
                    q, db_a, sq_a, nv, k=K, metric="L2",
                    tile_q=TILE_Q, tile_n=TILE_N, interpret=False,
                )
        else:
            selector = "approx" if variant.endswith("approx") else "exact"

            def one(q, db_a, sq_a):
                return dist_ops._exact_search_impl(
                    q, db_a, K, metric="L2", db_sq=sq_a, n_valid=nv,
                    chunk_size=131072, selector=selector,
                )

        @jax.jit
        def many(qs, db_a, sq_a):
            def body(acc, q):
                v, i = one(q, db_a, sq_a)
                return acc + v.sum() + i.sum().astype(jnp.float32), None
            acc, _ = lax.scan(body, jnp.float32(0), qs)
            return acc

        return many

    for variant in variants:
        try:
            many = make(variant)
            t0 = time.perf_counter()
            float(many(qstack, db, sq))
            compile_s = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(trivial(sq))
            rtt = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(many(qstack, db, sq))
            total = time.perf_counter() - t0
            per = max((total - rtt) / REPS, 1e-9)
            print(json.dumps({
                "variant": variant,
                "per_batch_ms": round(per * 1e3, 3),
                "qps": round(Q / per, 1),
                "compile_s": round(compile_s, 1),
                "rtt_ms": round(rtt * 1e3, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({"variant": variant,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)


if __name__ == "__main__":
    main()
