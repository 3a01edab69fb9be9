"""LOADTEST_r05 driver: serving percentiles WITH generation (VERDICT r04 #6).

Runs benchmarks/load_test.py twice in-process against the same protocol as
LOADTEST_r03 (in-process aiohttp server + micro-batcher, full-size MiniLM
encoder, 128 untimed full-concurrency warmup requests):

  1. search-only  (generate=False — the r03 configuration, for continuity)
  2. full RAG     (generate=True, extractive backend offline; every 8th
                   request carries a metadata filter, exercising the
                   non-coalesced per-request-mask path)

and writes both result blocks to LOADTEST_r05.json. The reference's served
contract includes ``generated_response`` (4-api-rag-search.py:96-107) —
this is the first artifact measuring that path's p50/p99.

Usage: python -m benchmarks.loadtest_r05 [--small]
"""

from __future__ import annotations

import argparse
import asyncio
import json


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--small", action="store_true", help="CPU smoke")
    p.add_argument("--out", default="LOADTEST_r05.json")
    p.add_argument("--concurrency", type=int, default=32)
    p.add_argument("--requests", type=int, default=512)
    p.add_argument("--warmup", type=int, default=128)
    args = p.parse_args()

    if args.small:
        # true CPU smoke: the axon env ignores JAX_PLATFORMS=cpu from the
        # environment — force it before first backend use
        import jax

        jax.config.update("jax_platforms", "cpu")

    from benchmarks.load_test import run_inprocess

    conc, total, warm = args.concurrency, args.requests, args.warmup
    if args.small:
        total, warm = 64, 8

    search_only = asyncio.run(run_inprocess(
        args.small, conc, total, warmup=warm, generate=False))
    rag_full = asyncio.run(run_inprocess(
        args.small, conc, total, warmup=warm, generate=True,
        filter_every=8))

    import jax

    platform = jax.devices()[0].platform
    out = {
        "metric": "serve_search_qps",
        "value": search_only["qps"],
        "unit": "qps",
        "vs_baseline": 1.0,  # reference publishes no serving numbers
        "platform": ("tpu_v5e_axon_tunnel" if platform == "tpu"
                     else platform),
        "search_only": search_only,
        "rag_generate": {**rag_full, "generate": True, "filter_every": 8},
        "protocol": (
            f"benchmarks/load_test.py in-process aiohttp server + "
            f"micro-batcher (serve/api.py), full-size MiniLM encoder "
            f"forward per coalesced batch; {warm} untimed full-concurrency "
            f"warmup requests compile every (batch, seq) bucket first. "
            f"search_only: generate=False (r03 protocol). rag_generate: "
            f"generate=True (extractive backend — no HF cache in image; "
            f"the served contract incl. generated_response matches the "
            f"reference 4-api-rag-search.py:96-107), every 8th request "
            f"carries a url_prefix metadata filter (bypasses the "
            f"coalescer: per-request masks). p50 is dominated by the axon "
            f"tunnel's 30-90 ms device->host RTT per dispatch, not kernel "
            f"time."
        ),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("metric", "value", "unit", "platform")}))
    print(f"# search_only: {json.dumps(search_only)}")
    print(f"# rag_generate: {json.dumps(out['rag_generate'])}")
    print(f"# wrote {args.out}")


if __name__ == "__main__":
    main()
