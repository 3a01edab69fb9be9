"""ops/distance.py vs numpy oracle.

The oracle is an explicit O(QN) numpy exact scan — the same contract as
``faiss.IndexFlatL2`` / ``IndexFlatIP`` (BASELINE.md config #1 requires exact
rank-order parity; faiss itself is not installed in this image, and exact
top-k is fully specified, so numpy is the oracle).
"""

import numpy as np
import pytest

from rag_faiss_embedding_tpu.ops import distance as D


def numpy_exact(q, db, k, metric):
    """Float64 oracle: true distances, stable rank order."""
    q64, db64 = q.astype(np.float64), db.astype(np.float64)
    if metric == "L2":
        d = ((q64[:, None, :] - db64[None, :, :]) ** 2).sum(-1)
        order = np.argsort(d, axis=1, kind="stable")[:, :k]
    else:
        d = q64 @ db64.T
        order = np.argsort(-d, axis=1, kind="stable")[:, :k]
    vals = np.take_along_axis(d, order, axis=1)
    return vals, order


def assert_rank_match(vals, idx, ref_vals, ref_idx, tol=1e-4):
    """Exact rank-order match, tolerating swaps among fp32 near-ties.

    FAISS's fp32 exact scan has the same property: rank order among
    distances that differ by less than fp32 rounding is implementation-
    defined, so we require indices to match wherever the float64 oracle
    distances are separated by more than ``tol``, and distance values to
    match everywhere.
    """
    vals, idx = np.asarray(vals, np.float64), np.asarray(idx)
    np.testing.assert_allclose(vals, ref_vals, rtol=1e-4, atol=1e-4)
    mismatch = idx != ref_idx
    if mismatch.any():
        # every mismatch must be a near-tie in true distance
        gap = np.abs(vals - ref_vals)
        scale = np.maximum(np.abs(ref_vals), 1.0)
        assert (gap[mismatch] <= tol * scale[mismatch]).all(), (
            f"rank mismatch beyond tie tolerance: {gap[mismatch].max()}"
        )


@pytest.mark.parametrize("metric", ["L2", "IP"])
@pytest.mark.parametrize("n,chunk", [(100, 32), (257, 64), (64, 64), (50, 128)])
def test_exact_search_matches_numpy(rng, metric, n, chunk):
    q = rng.standard_normal((7, 16)).astype(np.float32)
    db = rng.standard_normal((n, 16)).astype(np.float32)
    k = 10
    vals, idx = D.exact_search(q, db, k, metric=metric, chunk_size=chunk)
    ref_vals, ref_idx = numpy_exact(q, db, k, metric)
    assert_rank_match(vals, idx, ref_vals, ref_idx)


def test_exact_search_masks_padding(rng):
    db = rng.standard_normal((32, 8)).astype(np.float32)
    db_padded = np.concatenate([db, np.zeros((16, 8), np.float32)])
    q = rng.standard_normal((3, 8)).astype(np.float32)
    vals, idx = D.exact_search(q, db_padded, 5, metric="L2", n_valid=32)
    ref_vals, ref_idx = numpy_exact(q, db, 5, "L2")
    assert_rank_match(vals, idx, ref_vals, ref_idx)


def test_k_larger_than_n(rng):
    db = rng.standard_normal((4, 8)).astype(np.float32)
    q = rng.standard_normal((2, 8)).astype(np.float32)
    vals, idx = D.exact_search(q, db, 10, metric="L2")
    idx = np.asarray(idx)
    assert idx.shape == (2, 10)
    assert (idx[:, 4:] == -1).all()
    assert set(idx[0, :4]) == {0, 1, 2, 3}
    assert np.isinf(np.asarray(vals)[:, 4:]).all()


def test_l2_distances_are_exact_values(rng):
    q = rng.standard_normal((2, 8)).astype(np.float32)
    db = rng.standard_normal((20, 8)).astype(np.float32)
    vals, idx = D.exact_search(q, db, 3, metric="L2")
    for qi in range(2):
        for j, i in enumerate(np.asarray(idx)[qi]):
            expected = ((q[qi] - db[i]) ** 2).sum()
            np.testing.assert_allclose(np.asarray(vals)[qi, j], expected, rtol=1e-4)


def test_merge_topk(rng):
    va = np.array([[5.0, 3.0, 1.0]], np.float32)
    ia = np.array([[10, 11, 12]], np.int32)
    vb = np.array([[4.0, 2.0, 0.0]], np.float32)
    ib = np.array([[20, 21, 22]], np.int32)
    v, i = D.merge_topk(va, ia, vb, ib, 4)
    np.testing.assert_array_equal(np.asarray(v), [[5.0, 4.0, 3.0, 2.0]])
    np.testing.assert_array_equal(np.asarray(i), [[10, 20, 11, 21]])


def test_k_larger_than_chunk(rng):
    """k between chunk_size and n: per-chunk top-k clamps to chunk width."""
    db = rng.standard_normal((100, 8)).astype(np.float32)
    q = rng.standard_normal((2, 8)).astype(np.float32)
    vals, idx = D.exact_search(q, db, 50, metric="L2", chunk_size=32)
    ref_vals, ref_idx = numpy_exact(q, db, 50, "L2")
    assert_rank_match(vals, idx, ref_vals, ref_idx)


@pytest.mark.parametrize("metric", ["L2", "IP"])
def test_approx_selector_high_recall(rng, metric):
    db = rng.standard_normal((4096, 32)).astype(np.float32)
    q = rng.standard_normal((16, 32)).astype(np.float32)
    vals, idx = D.exact_search(q, db, 10, metric=metric, chunk_size=1024,
                               selector="approx")
    _, truth = numpy_exact(q, db, 10, metric)
    hits = sum(len(set(a.tolist()) & set(b.tolist()))
               for a, b in zip(np.asarray(idx), truth))
    assert hits / truth.size >= 0.95


def test_small_topk_matches_lax_topk(rng):
    """small_topk is exact with lax.top_k tie-break parity (lowest index
    first), across float ties, NEG_INF padding, int32 extremes, and the
    k >= m passthrough. It replaces the sort-based top_k in the fused-IVF
    decode and spill stages (0.24 + 0.73 ms of the 1.49 ms r04 headline
    batch; benchmarks/pallas_profile.py)."""
    from jax import lax
    import jax.numpy as jnp

    x = rng.standard_normal((64, 257)).astype(np.float32)
    x[:, 100] = x[:, 50]          # ties resolve to the lower index
    x[:, 200:] = D.NEG_INF        # masked-slot sentinel values
    for k in (1, 10, 16):
        v1, i1 = lax.top_k(jnp.asarray(x), k)
        v2, i2 = D.small_topk(jnp.asarray(x), k)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    xi = rng.integers(-2**31 + 5, 2**31 - 1, (32, 130), dtype=np.int32)
    v1, i1 = lax.top_k(jnp.asarray(xi), 7)
    v2, i2 = D.small_topk(jnp.asarray(xi), 7)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    v, i = D.small_topk(jnp.asarray(x[:, :8]), 8)   # k >= m: top_k path
    assert v.shape == (64, 8)
