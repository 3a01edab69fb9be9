"""Fused batched IVF path (ops/ivf_scan.py) + int8 storage + IP metric.

Oracle strategy per CLAUDE.md: numpy/float64 exact scan for rank parity,
edge cases (k>n, empty unions, duplicate probes), persistence round trip.
The fused kernel's recall must be >= the per-query windowed path on the
same index (it scans the UNION of the chunk's probed lists — a superset of
each query's own lists).
"""

import numpy as np
import pytest

from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex
from rag_faiss_embedding_tpu.ops.kmeans import train_kmeans

from .test_distance import numpy_exact
from .test_ivf import clustered_data


def _recall(ids, truth):
    ids = np.asarray(ids)
    return np.mean([
        len(set(a.tolist()) & set(b.tolist())) / truth.shape[1]
        for a, b in zip(ids, truth)
    ])


def test_fused_full_probe_int8_near_exact(rng):
    """Full probe with int8 storage: recall vs the float64 oracle matches
    the flat SQ8 tier's bar (>= 0.95 on standard-normal data, same scheme
    as tests/test_flat_index.py::test_int8_index_recall_and_values)."""
    pts = rng.standard_normal((512, 64)).astype(np.float32)
    idx = IVFFlatIndex(64, nlist=8, nprobe=8, dtype="int8")
    idx.build(pts)
    q = rng.standard_normal((16, 64)).astype(np.float32)
    ref_vals, ref_ids = numpy_exact(q, pts, 10, "L2")
    vals, ids = idx.search(q, 10, nprobe=8)
    assert _recall(ids, ref_ids) >= 0.95
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=0.05, atol=0.5)


def test_fused_matches_windowed_or_better(rng):
    """Fused union scan recall >= per-query windowed scan at equal nprobe."""
    pts, _ = clustered_data(rng, n_clusters=32, per_cluster=32, spread=0.5)
    idx = IVFFlatIndex(16, nlist=32)
    idx.build(pts)
    q = rng.standard_normal((64, 16)).astype(np.float32)
    _, truth = numpy_exact(q, pts, 10, "L2")
    for nprobe in (1, 4):
        _, fused_ids = idx.search(q, 10, nprobe=nprobe)
        idx.use_fused = False
        _, win_ids = idx.search(q, 10, nprobe=nprobe)
        idx.use_fused = True
        assert _recall(fused_ids, truth) >= _recall(win_ids, truth) - 1e-9


def test_fused_values_match_oracle_distances(rng):
    pts, _ = clustered_data(rng, n_clusters=8, per_cluster=32)
    idx = IVFFlatIndex(16, nlist=8, nprobe=8)
    idx.build(pts)
    q = rng.standard_normal((7, 16)).astype(np.float32)
    ref_vals, ref_ids = numpy_exact(q, pts, 4, "L2")
    vals, ids = idx.search(q, 4, nprobe=8)
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-3, atol=1e-3)


def test_ivf_ip_metric_spherical(rng):
    """IP-IVF on normalized (cosine-style) embeddings: full probe matches
    the numpy IP oracle; small nprobe keeps high recall on clustered data."""
    pts, _ = clustered_data(rng, n_clusters=16, per_cluster=32, spread=0.1)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    idx = IVFFlatIndex(16, nlist=16, metric="IP", train_iters=15)
    idx.build(pts)
    q = pts[::7] + 0.01 * rng.standard_normal((len(pts[::7]), 16)).astype(
        np.float32
    )
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    ref_vals, ref_ids = numpy_exact(q, pts, 5, "IP")
    vals, ids = idx.search(q, 5, nprobe=16)
    assert _recall(ids, ref_ids) == 1.0
    # IP values descend and match the oracle
    vals = np.asarray(vals)
    assert (np.diff(vals, axis=1) <= 1e-6).all()
    np.testing.assert_allclose(
        np.sort(vals, axis=1), np.sort(ref_vals, axis=1), rtol=1e-3, atol=1e-3
    )
    _, ids1 = idx.search(q, 5, nprobe=2)
    assert _recall(ids1, ref_ids) > 0.9


def test_ivf_ip_int8_composes(rng):
    """IP metric + int8 storage compose (the round-1 scaling-lever gap):
    full probe hits the flat SQ8 recall bar on standard-normal data."""
    pts = rng.standard_normal((256, 32)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    idx = IVFFlatIndex(32, nlist=8, metric="IP", dtype="int8")
    idx.build(pts)
    q = rng.standard_normal((8, 32)).astype(np.float32)
    _, ref_ids = numpy_exact(q, pts, 5, "IP")
    _, ids = idx.search(q, 5, nprobe=8)
    assert _recall(ids, ref_ids) >= 0.95


@pytest.mark.slow
def test_fused_int8_spill_and_streaming(rng):
    """Window cap spill + streamed adds both reachable through the fused
    kernel's in-jit spill scan (int8 pending tier)."""
    big = rng.standard_normal((400, 16)).astype(np.float32) * 0.05
    rest = (rng.standard_normal((8, 16)).astype(np.float32) * 5
            + 0.05 * rng.standard_normal((8, 40, 16)).astype(np.float32)
            .transpose(1, 0, 2)).reshape(-1, 16)
    pts = np.concatenate([big, rest.astype(np.float32)])
    idx = IVFFlatIndex(16, nlist=8, nprobe=8, dtype="int8", train_iters=10)
    idx.window_quantile = 0.5
    idx.build(pts)
    assert idx._pending.ntotal > 0, "expected spill"
    q = rng.standard_normal((6, 16)).astype(np.float32)
    _, ref_ids = numpy_exact(q, pts, 7, "L2")
    _, ids = idx.search(q, 7, nprobe=8)
    assert _recall(ids, ref_ids) >= 6.0 / 7.0  # int8 near-ties may swap tail
    extra = rng.standard_normal((5, 16)).astype(np.float32)
    idx.add(extra)
    _, hit = idx.search(extra[2], 1)
    assert int(np.asarray(hit)[0, 0]) == len(pts) + 2


def test_fused_k_exceeds_union(rng):
    """k larger than union rows AND corpus: -1 padding, no crash."""
    pts = rng.standard_normal((20, 8)).astype(np.float32)
    idx = IVFFlatIndex(8, nlist=4)
    idx.build(pts)
    vals, ids = idx.search(pts[:3], 50, nprobe=1)
    ids = np.asarray(ids)
    assert ids.shape == (3, 50)
    assert (ids[:, -1] == -1).all()  # padded tail
    assert (ids[:, 0] >= 0).all()


def test_fused_duplicate_probes_no_duplicate_results(rng):
    """Queries probing the same lists (dedup'd union) never return the same
    row twice for one query."""
    pts, _ = clustered_data(rng, n_clusters=4, per_cluster=32)
    idx = IVFFlatIndex(16, nlist=4)
    idx.build(pts)
    q = np.tile(pts[3], (16, 1))  # identical queries -> identical probes
    _, ids = idx.search(q, 8, nprobe=4)
    ids = np.asarray(ids)
    for row in ids:
        live = row[row >= 0].tolist()
        assert len(live) == len(set(live))
    assert (ids[:, 0] == 3).all()


def test_union_mode_chunkmax_near_minrank(rng, monkeypatch):
    """Chunk-aggregate union (the large-nlist fast path, forced on here by
    lowering the activation threshold) keeps recall within a point of the
    per-query min-rank mode on clustered data."""
    from rag_faiss_embedding_tpu.ops import ivf_scan

    monkeypatch.setattr(ivf_scan, "_COARSE_APPROX_MIN_NLIST", 8)
    pts, _ = clustered_data(rng, n_clusters=32, per_cluster=64, spread=0.4)
    q = (pts[::11] + 0.1 * rng.standard_normal(
        (len(pts[::11]), pts.shape[1])
    )).astype(np.float32)
    _, truth = numpy_exact(q, pts, 10, "L2")
    recalls = {}
    for mode in ("minrank", "chunkmax"):
        idx = IVFFlatIndex(16, nlist=32, train_iters=10, union_mode=mode)
        idx.build(pts)
        _, ids = idx.search(q, 10, nprobe=8)
        recalls[mode] = _recall(ids, truth)
    assert recalls["chunkmax"] >= recalls["minrank"] - 0.01
    assert recalls["chunkmax"] >= 0.9


def test_union_cap_and_query_chunk_overrides(rng):
    """The tuning overrides flow through search: a deliberately starved
    union (1 slot shared by many queries) must degrade recall vs the
    default, proving the knob reaches the kernel."""
    pts, _ = clustered_data(rng, n_clusters=32, per_cluster=32, spread=0.4)
    q = rng.standard_normal((64, 16)).astype(np.float32)
    _, truth = numpy_exact(q, pts, 10, "L2")
    idx = IVFFlatIndex(16, nlist=32, train_iters=8)
    idx.build(pts)
    _, ids_full = idx.search(q, 10, nprobe=8)
    idx.union_cap, idx.query_chunk = 1, 64
    _, ids_starved = idx.search(q, 10, nprobe=8)
    assert _recall(ids_starved, truth) < _recall(ids_full, truth)
    idx.union_cap = idx.query_chunk = None
    _, ids_again = idx.search(q, 10, nprobe=8)
    np.testing.assert_array_equal(np.asarray(ids_again),
                                  np.asarray(ids_full))


def test_union_mode_chunkmax_ip_metric(rng, monkeypatch):
    """chunkmax + IP metric: the per-query normalization (score minus own
    best) must keep dot-product rankings intact."""
    from rag_faiss_embedding_tpu.ops import ivf_scan

    monkeypatch.setattr(ivf_scan, "_COARSE_APPROX_MIN_NLIST", 8)
    pts, _ = clustered_data(rng, n_clusters=16, per_cluster=32, spread=0.2)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    q = pts[::5] + 0.05 * rng.standard_normal(
        (len(pts[::5]), 16)
    ).astype(np.float32)
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    _, truth = numpy_exact(q, pts, 5, "IP")
    idx = IVFFlatIndex(16, nlist=16, metric="IP", train_iters=12,
                       union_mode="chunkmax")
    idx.build(pts)
    _, ids = idx.search(q, 5, nprobe=8)
    assert _recall(ids, truth) >= 0.95


def test_ivf_int8_state_roundtrip(rng, tmp_path):
    from rag_faiss_embedding_tpu.index import VectorStore

    pts, _ = clustered_data(rng, n_clusters=4, per_cluster=16)
    idx = IVFFlatIndex(16, nlist=4, nprobe=4, dtype="int8")
    store = VectorStore(dimension=16, index_path=tmp_path / "ivf8.idx",
                        index=idx)
    doc_ids = list(range(100, 100 + len(pts)))
    store.add_vectors(pts, doc_ids)
    d1, i1 = store.search(pts[5], k=3)
    store.save_index()

    loaded = VectorStore(dimension=16, index_path=tmp_path / "ivf8.idx")
    assert isinstance(loaded.index, IVFFlatIndex)
    assert loaded.index.quantized
    d2, i2 = loaded.search(pts[5], k=3)
    # sorted_v2 persistence is LOSSLESS: identical codes/scales/norms reload,
    # so results match exactly (not just approximately)
    assert i1 == i2
    np.testing.assert_array_equal(d1, d2)


def test_ivf_ip_rejects_nothing_l2_still_default():
    idx = IVFFlatIndex(8, nlist=4)
    assert idx.metric == "L2"
    with pytest.raises(ValueError):
        IVFFlatIndex(8, metric="cosine")


def test_spherical_kmeans_normalized_centroids(rng):
    pts, _ = clustered_data(rng, n_clusters=8, per_cluster=32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    cents, assigns = train_kmeans(pts, 8, n_iters=10, spherical=True)
    cents = np.asarray(cents)
    np.testing.assert_allclose(np.linalg.norm(cents, axis=1), 1.0, rtol=1e-5)
    # assignment maximizes dot product
    dots = pts @ cents.T
    np.testing.assert_array_equal(np.asarray(assigns), dots.argmax(1))


def test_balanced_assignment_respects_capacity(rng):
    from rag_faiss_embedding_tpu.index.ivf import balanced_assignment

    n, nlist, cap = 1000, 8, 100
    choices = np.stack([
        rng.permuted(np.tile(np.arange(nlist), -(-n // nlist))[:n]),
        rng.integers(0, nlist, n),
        rng.integers(0, nlist, n),
    ], axis=1).astype(np.int32)
    scores = np.sort(rng.random((n, 3)), axis=1).astype(np.float32)
    assign, spill = balanced_assignment(choices, scores, nlist, cap)
    counts = np.bincount(assign[assign >= 0], minlength=nlist)
    assert (counts <= cap).all()
    assert (assign >= 0).sum() + len(spill) == n
    # every assigned list is one of that row's choices
    ok = assign[:, None] == choices
    assert (ok.any(1) | (assign == -1)).all()


def test_balanced_assignment_prefers_closest(rng):
    from rag_faiss_embedding_tpu.index.ivf import balanced_assignment

    # 5 rows all want list 0 (cap 3): the 3 closest stay, 2 fall back
    choices = np.array([[0, 1]] * 5, np.int32)
    scores = np.array([[0.5, 9], [0.1, 9], [0.9, 9], [0.2, 9], [0.7, 9]],
                      np.float32)
    assign, spill = balanced_assignment(choices, scores, 2, 3)
    assert len(spill) == 0
    np.testing.assert_array_equal(assign, [0, 0, 1, 0, 1])


def test_ivf_reassign_build_full_probe_exact(rng):
    """balance='reassign': skewed data, small windows, full probe still
    matches brute force (rows live in *a* probed list, none are lost)."""
    big = rng.standard_normal((600, 16)).astype(np.float32) * 0.05
    rest = (rng.standard_normal((8, 16)).astype(np.float32) * 5
            + 0.05 * rng.standard_normal((8, 40, 16)).astype(np.float32)
            .transpose(1, 0, 2)).reshape(-1, 16).astype(np.float32)
    pts = np.concatenate([big, rest])
    idx = IVFFlatIndex(16, nlist=8, nprobe=8, train_iters=10,
                       balance="reassign")
    idx.window_quantile = 0.5
    idx.build(pts)
    spill_idx = IVFFlatIndex(16, nlist=8, nprobe=8, train_iters=10)
    spill_idx.window_quantile = 0.5
    spill_idx.build(pts)
    # the point of reassign: smaller window than spill mode's quantile cap
    # and (near) nothing in the exact tier
    assert idx._pending.ntotal <= spill_idx._pending.ntotal
    q = rng.standard_normal((6, 16)).astype(np.float32)
    ref_vals, ref_ids = numpy_exact(q, pts, 7, "L2")
    vals, ids = idx.search(q, 7, nprobe=8)
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-3,
                               atol=1e-3)
    # insertion-order reconstruction unaffected by reassignment
    np.testing.assert_allclose(idx.vectors(), pts, rtol=1e-6)


def test_ivf_reassign_persistence_roundtrip(rng, tmp_path):
    from rag_faiss_embedding_tpu.index import VectorStore

    pts, _ = clustered_data(rng, n_clusters=4, per_cluster=32)
    idx = IVFFlatIndex(16, nlist=4, nprobe=4, balance="reassign")
    store = VectorStore(dimension=16, index_path=tmp_path / "bal.idx",
                        index=idx)
    store.add_vectors(pts, list(range(len(pts))))
    d1, i1 = store.search(pts[11], k=3)
    store.save_index()
    loaded = VectorStore(dimension=16, index_path=tmp_path / "bal.idx")
    assert loaded.index.balance == "reassign"
    d2, i2 = loaded.search(pts[11], k=3)
    assert i1 == i2
    np.testing.assert_array_equal(d1, d2)
