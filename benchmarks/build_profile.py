"""Profile the IVF build pipeline stage by stage on real hardware.

The north-star metric (BASELINE.json) is two-sided: query QPS AND
index-build vectors/sec. This script builds the bench-headline index
(1M x 384, nlist=8192, balance="reassign") with the stage timers that
``IVFFlatIndex.build`` / ``ops.kmeans.train_kmeans`` record and prints one
JSON line, so build-time optimization has the same measured footing as the
query path. Data is generated ON DEVICE (host->device through the axon
tunnel moves at ~MB/s; see docs/PERF.md).

    python -m benchmarks.build_profile            # full 1M (TPU)
    python -m benchmarks.build_profile --small    # 100k CPU smoke
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser(description="IVF build stage profile")
    p.add_argument("--small", action="store_true")
    p.add_argument("--n", type=int, default=None)
    p.add_argument("--nlist", type=int, default=None)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--train-iters", type=int, default=10)
    p.add_argument("--warm", action="store_true",
                   help="rebuild once more in-process (no compiles)")
    p.add_argument("--recall", action="store_true",
                   help="recall@10 @ nprobe=16 through the shipped search")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    n = args.n or (100_000 if (args.small or platform != "tpu") else 1_048_576)
    nlist = args.nlist or (512 if n < 500_000 else 8192)
    dim = 384
    n_modes = 8192

    @jax.jit
    def gen_db(k):
        kc, km, kn = jax.random.split(k, 3)
        centers = jax.random.normal(kc, (n_modes, dim), jnp.float32)
        mode = jax.random.randint(km, (n,), 0, n_modes)
        noise = jax.random.normal(kn, (n, dim), jnp.float32)
        return centers[mode] + 0.7 * noise

    db = gen_db(jax.random.PRNGKey(0))
    jax.block_until_ready(db)

    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex

    idx = IVFFlatIndex(dim, nlist=nlist, dtype=args.dtype,
                       train_iters=args.train_iters, balance="reassign")
    t0 = time.perf_counter()
    idx.build(db)
    total = time.perf_counter() - t0

    stats = dict(idx.build_stats)
    train = stats.pop("train", {})

    recall = None
    if args.recall:
        # recall@10 through the SHIPPED search at the bench parameters —
        # build-path changes (seeding, relabeling, balance) can silently
        # cost recall, so the profile carries its own gate check
        from rag_faiss_embedding_tpu.ops import distance as dist_ops

        nq, k, nprobe = 1024, 10, 16

        @jax.jit
        def gen_q(k_, db_):
            ks, kn = jax.random.split(k_)
            src = jax.random.randint(ks, (nq,), 0, db_.shape[0])
            noise = jax.random.normal(kn, (nq, dim), jnp.float32)
            return db_[src] + 0.3 * noise

        q = gen_q(jax.random.PRNGKey(1), db)
        _, truth = dist_ops.exact_search(q, db, k, metric="L2",
                                         chunk_size=524288)
        _, pred = idx.search(q, k, nprobe=nprobe)
        import numpy as np

        truth, pred = np.asarray(truth), np.asarray(pred)
        hits = sum(len(set(p.tolist()) & set(t.tolist()))
                   for p, t in zip(pred, truth))
        recall = round(hits / truth.size, 4)

    warm = None
    if args.warm:
        # second build in the same process re-uses every compiled program:
        # separates remote-compile cost (10-60 s/shape through the axon
        # tunnel, paid once) from the steady-state build pipeline
        idx2 = IVFFlatIndex(dim, nlist=nlist, dtype=args.dtype,
                            train_iters=args.train_iters,
                            balance="reassign")
        t0 = time.perf_counter()
        idx2.build(db)
        warm_total = time.perf_counter() - t0
        wstats = dict(idx2.build_stats)
        wtrain = wstats.pop("train", {})
        warm = {
            "vectors_per_s": round(n / warm_total, 1),
            "total_s": round(warm_total, 2),
            "stages_s": {k: round(v, 3) for k, v in wstats.items()
                         if isinstance(v, float)},
            "train_stages_s": {k: round(v, 3) if isinstance(v, float) else v
                               for k, v in wtrain.items()},
        }
    out = {
        "metric": "ivf_build_vectors_per_s",
        "value": round(n / total, 1),
        "unit": "vectors/s",
        "vs_baseline": 1.0,  # reference publishes no build numbers
        "n": n, "nlist": nlist, "dtype": args.dtype,
        "train_iters": args.train_iters,
        "window": idx._window, "spill_rows": int(idx._pending.ntotal),
        "total_s": round(total, 2),
        "stages_s": {k: round(v, 3) for k, v in stats.items()
                     if isinstance(v, float)},
        "train_stages_s": {k: round(v, 3) if isinstance(v, float) else v
                           for k, v in train.items()},
        "platform": platform,
        **({"recall_at_10_np16": recall} if recall is not None else {}),
        **({"warm": warm} if warm else {}),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
