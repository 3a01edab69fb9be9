"""Pallas fused IVF union-scan backend (ops/pallas_ivf.py).

Runs in interpret mode on CPU (the shipped dispatch only auto-selects the
kernel on TPU). Oracle strategy per CLAUDE.md: the XLA chunk backend is the
semantics reference (same coarse/union head, same spill/finalize tail), and
numpy/float64 exact scan pins absolute recall. The packed-int32 selection
truncates low mantissa bits, so values are compared at 1e-3 relative — far
looser than the truncation (~2^-15) to stay robust across platforms.
"""

import numpy as np
import pytest

from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex
from rag_faiss_embedding_tpu.ops import pallas_ivf

from .test_distance import numpy_exact
from .test_ivf import clustered_data
from .test_ivf_fused import _recall


def _build(rng, metric="L2", dtype="float32", n_clusters=32, dim=128,
           **kw):
    centers = rng.standard_normal((n_clusters, dim)).astype(np.float32)
    mode = rng.integers(0, n_clusters, n_clusters * 64)
    pts = (centers[mode]
           + 0.4 * rng.standard_normal((len(mode), dim))).astype(np.float32)
    if metric == "IP":
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    idx = IVFFlatIndex(dim, nlist=n_clusters, metric=metric, dtype=dtype,
                       train_iters=5, balance="reassign", **kw)
    idx.build(pts)
    q = (pts[::31] + 0.2 * rng.standard_normal(
        (len(pts[::31]), dim))).astype(np.float32)
    if metric == "IP":
        q /= np.linalg.norm(q, axis=1, keepdims=True)
    return idx, pts, q


@pytest.mark.parametrize("variant", [1, 2])
@pytest.mark.parametrize("metric,dtype", [
    ("L2", "float32"), ("L2", "bfloat16"), ("IP", "float32"),
])
@pytest.mark.slow
def test_pallas_matches_xla_backend(rng, metric, dtype, variant):
    """Same built index, same parameters: the Pallas chunk stage returns the
    same neighbor ids as the XLA chunk stage (selection is effectively
    exact at cap=2 on this scale) and values agree to packing tolerance.
    Covers both kernel variants (v2 premasks dead rows into the sqnorm
    operand and pre-doubles L2 queries)."""
    idx, pts, q = _build(rng, metric=metric, dtype=dtype)
    idx.backend = "xla"
    vx, ix = idx.search(q, 10, nprobe=8)
    idx.backend = "pallas"
    idx.pallas_variant = variant
    vp, ip_ = idx.search(q, 10, nprobe=8)
    vx, ix, vp, ip_ = map(np.asarray, (vx, ix, vp, ip_))
    _, truth = numpy_exact(q, pts, 10, metric)
    assert _recall(ip_, truth) >= _recall(ix, truth) - 0.005
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10 for a, b in zip(ix, ip_)
    ])
    assert overlap >= 0.99
    live = (ix == ip_) & (ip_ >= 0)
    np.testing.assert_allclose(vp[live], vx[live], rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_pallas_full_probe_exact_f32(rng):
    """Full probe through the Pallas backend on fp32 storage: rank-exact
    against the float64 oracle (cap covers every within-bin candidate at
    full-union coverage on clustered data)."""
    idx, pts, q = _build(rng, n_clusters=8, dim=128, pallas_cap=2)
    idx.backend = "pallas"
    ref_vals, ref_ids = numpy_exact(q, pts, 4, "L2")
    vals, ids = idx.search(q, 4, nprobe=8)
    assert _recall(ids, ref_ids) >= 0.995
    hit = np.asarray(ids) == ref_ids
    np.testing.assert_allclose(
        np.asarray(vals)[hit], ref_vals[hit], rtol=1e-3, atol=1e-3
    )


def test_pallas_spill_and_streaming_merge(rng):
    """The shared spill/finalize tail works behind the Pallas chunk stage:
    streamed adds (exact pending tier) surface in results."""
    idx, pts, q = _build(rng, n_clusters=8, dim=128)
    idx.backend = "pallas"
    extra = rng.standard_normal((5, 128)).astype(np.float32)
    idx.add(extra)
    assert idx._pending.ntotal >= 5
    _, hit = idx.search(extra[3], 1)
    assert int(np.asarray(hit)[0, 0]) == len(pts) + 3


def test_pallas_rejects_int8_auto_falls_back(rng):
    pts = rng.standard_normal((512, 128)).astype(np.float32)
    idx = IVFFlatIndex(128, nlist=8, dtype="int8", backend="pallas")
    idx.build(pts)
    with pytest.raises(ValueError, match="full-precision"):
        idx.search(pts[:16], 5, nprobe=8)
    idx.backend = "auto"  # auto falls back to the XLA path off-eligibility
    _, ids = idx.search(pts[:16], 5, nprobe=8)
    assert (np.asarray(ids)[:, 0] == np.arange(16)).all()


def test_pallas_k_exceeds_candidates(rng):
    """k past the candidate width: -1 padding, no crash."""
    idx, pts, q = _build(rng, n_clusters=8, dim=128)
    idx.backend = "pallas"
    vals, ids = idx.search(q[:4], 40, nprobe=1)
    ids = np.asarray(ids)
    assert ids.shape == (4, 40)
    assert (ids[:, 0] >= 0).all()


def test_pallas_v2_dead_rows_stay_dead(rng):
    """variant=2 has no in-kernel id mask — deleted rows are suppressed only
    by the _DEAD_SQ premask. Delete the true nearest neighbors and check
    they never surface; under-filled unions pad with id -1, never a dead
    row's stale id."""
    idx, pts, q = _build(rng, n_clusters=8, dim=128)
    idx.backend = "pallas"
    idx.pallas_variant = 2
    _, before = idx.search(q[:8], 3, nprobe=8)
    kill = np.unique(np.asarray(before)[:, 0])
    idx.remove_ids(kill)
    vals, after = idx.search(q[:8], 40, nprobe=1)
    after = np.asarray(after)
    assert not np.isin(after[after >= 0], kill).any()
    # padded tail slots (k > candidates) decode to -1, not garbage
    assert (after[:, 0] >= 0).all()
    """The order-preserving f32<->i32 map + low-bit packing used by the
    kernel: order preserved, values recovered to truncation tolerance,
    block ids recovered exactly."""
    import jax.numpy as jnp

    vals = np.array([-3.4e38, -1e6, -1.5, -1e-30, 0.0, 1e-30, 2.5, 1e36],
                    np.float32)
    mono = np.array([pallas_ivf._mono_i32_host(float(v)) for v in vals])
    assert (np.diff(mono) > 0).all()
    # XLA-side inverse on truncated values
    nbits = 8
    jglob = np.arange(len(vals), dtype=np.int32)
    packed = (mono & ~((1 << nbits) - 1)) | jglob
    rec = np.asarray(pallas_ivf._unmonotone_f32(
        jnp.asarray(packed & ~((1 << nbits) - 1), jnp.int32)))
    np.testing.assert_allclose(rec, vals, rtol=2.0 ** -(23 - nbits - 1))
    assert ((packed & 0xFF) == jglob).all()


def test_pick_bb_respects_vmem_budget():
    assert pallas_ivf.pick_bb(128, 384, 2, 256) == 16
    # fp32 x wide windows shrink the per-cell block count
    assert pallas_ivf.pick_bb(1024, 384, 4, 256) <= 2
    assert pallas_ivf.pick_bb(128, 384, 2, 8) == 8  # capped by union size


def test_math_level_pallas_rejects_quantized(rng):
    """Direct fused_ivf_search_math callers (bench sweeps, sharded tier)
    bypass the index-level dispatch guard; the math-level pallas branch must
    fail loud on int8 storage rather than cast queries into the code dtype
    and skip the shadow rerank silently."""
    import jax.numpy as jnp

    from rag_faiss_embedding_tpu.ops.ivf_scan import fused_ivf_search_math

    idx = IVFFlatIndex(128, nlist=8, dtype="int8")
    pts = rng.standard_normal((512, 128)).astype(np.float32)
    idx.build(pts)
    q = jnp.asarray(pts[:16])
    with pytest.raises(ValueError, match="full-precision"):
        fused_ivf_search_math(
            q, idx._cent_store, idx._cent_sq, idx._sorted_vecs,
            idx._sorted_scales, idx._sorted_sq, idx._sorted_ids, None,
            idx._sorted_shadow,
            k=5, nprobe=8, window=idx._window, metric="L2",
            recall_target=0.99, union_cap=64, qc=16,
            backend="pallas", interpret=True,
        )
