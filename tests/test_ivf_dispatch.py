"""Ship-what-you-bench guard (VERDICT r04 #8).

The headline bench records a ``library_default_*`` stanza timed at the
dispatch ``IVFFlatIndex.resolved_dispatch`` reports. These tests pin that
resolution to what ``search`` ACTUALLY dispatches (spying on the jitted
fused entry point), so a config divergence like round 4's — where the
shipped default was a kernel variant the bench never timed — is caught on
CPU before any TPU run.

Reference parity note: the reference's default path is always the path it
runs (`/root/reference/faiss_store.py:49-81` — one IndexFlatL2, no variant
knobs); this framework's richer dispatch needs the guard instead.
"""

import numpy as np
import pytest

from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex
from rag_faiss_embedding_tpu.ops import ivf_scan


def _build(n=4096, dim=64, **kw):
    rng = np.random.default_rng(7)
    idx = IVFFlatIndex(dim, nlist=kw.pop("nlist", 16), train_iters=2, **kw)
    idx.build(rng.standard_normal((n, dim), dtype=np.float32))
    return idx, rng.standard_normal((64, dim), dtype=np.float32)


def _spy_search(monkeypatch, idx, q, k=10):
    captured = {}
    orig = ivf_scan._fused_jit

    def spy(*args, **kwargs):
        captured.update(kwargs)
        return orig(*args, **kwargs)

    monkeypatch.setattr(ivf_scan, "_fused_jit", spy)
    idx.search(q, k)
    assert captured, "search did not reach the fused dispatch"
    return captured


@pytest.mark.parametrize("kw", [
    {},  # pure defaults
    {"dtype": "bfloat16", "nlist": 64},
    {"dtype": "int8", "nlist": 8},
    {"nlist": 8, "union_cap": 32},
])
def test_search_dispatch_matches_resolved_dispatch(monkeypatch, kw):
    idx, q = _build(**dict(kw))
    want = idx.resolved_dispatch(nq=q.shape[0], k=10)
    got = _spy_search(monkeypatch, idx, q)
    for key in ("nprobe", "union_cap", "qc", "backend", "interpret",
                "union_mode", "pallas_variant", "rerank_depth",
                "recall_target"):
        assert got[key] == want[key], (key, got[key], want[key])
    assert got["window"] == want["window"]
    assert got["k"] == want["k"]


def test_default_variant_is_the_benchmarked_kernel():
    """The shipped default must be the kernel the headline bench times
    (BENCH_r04: pallas_variant=1 is the only variant ever resolved on real
    TPU; variant=2 crashes the axon backend — see index/ivf.py)."""
    assert IVFFlatIndex(64, nlist=4).pallas_variant == 1


def test_union_mode_auto_rule():
    """'auto' = minrank at small nlist, chunkmax past 2048 (the documented
    rule, now shared with ShardedIVFIndex)."""
    idx, _ = _build(nlist=16)
    assert idx._resolved_union_mode() == "minrank"
    big = IVFFlatIndex(64, nlist=4096)
    assert big._resolved_union_mode() == "chunkmax"
    forced = IVFFlatIndex(64, nlist=16, union_mode="chunkmax")
    assert forced._resolved_union_mode() == "chunkmax"


def test_query_chunk_recall_safe():
    assert ivf_scan.query_chunk_recall_safe(256, 256)
    assert not ivf_scan.query_chunk_recall_safe(512, 256)


def test_unsafe_query_chunk_warns():
    import logging

    records = []

    class Catch(logging.Handler):
        def emit(self, record):
            records.append(record.getMessage())

    idx, q = _build(nlist=8, union_cap=16)
    idx.query_chunk = 64  # > union_cap: structurally recall-broken
    lg = logging.getLogger("rag_faiss_embedding_tpu.ops.ivf_scan")
    h = Catch(level=logging.WARNING)
    lg.addHandler(h)
    try:
        idx.search(q, 4)
    finally:
        lg.removeHandler(h)
    assert any("union_cap" in m for m in records)


def test_rescue_stats_recorded():
    """ADVICE r04: a rescued-row build must expose how many rows were
    relocated and how far (build_stats), instead of silently reporting
    spill_rows=0."""
    rng = np.random.default_rng(3)
    # one dense blob forces greedy-choice exhaustion at tight caps
    vecs = np.concatenate([
        rng.standard_normal((3000, 32)).astype(np.float32) * 0.01,
        rng.standard_normal((1096, 32)).astype(np.float32) + 8.0,
    ])
    idx = IVFFlatIndex(32, nlist=32, balance="reassign",
                       reassign_choices=2, train_iters=2)
    idx.cap_factor = 1.0  # zero headroom: exhaustion guaranteed
    idx.build(vecs)
    if "rescued_rows" in idx.build_stats:
        assert idx.build_stats["rescued_rows"] > 0
        assert idx.build_stats["rescue_max_centroid_rank"] >= 0
    # either way, every row is findable: rescued rows live in SOME list
    # within rescue_rank_limit, the rest in the exact pending tier
    assert idx.nlive == len(vecs)
