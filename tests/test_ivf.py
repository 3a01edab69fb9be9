import numpy as np
import pytest

from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex
from rag_faiss_embedding_tpu.ops.kmeans import train_kmeans

from .test_distance import numpy_exact


def clustered_data(rng, n_clusters=16, per_cluster=64, d=16, spread=0.05):
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 3
    pts = (
        centers[:, None, :]
        + spread * rng.standard_normal((n_clusters, per_cluster, d))
    ).reshape(-1, d).astype(np.float32)
    return pts, centers


def test_kmeans_recovers_clusters(rng):
    pts, centers = clustered_data(rng)
    learned, assign = train_kmeans(pts, 16, n_iters=15, seed=0)
    learned = np.asarray(learned)
    # every true center must have a learned centroid nearby
    d = ((centers[:, None, :] - learned[None, :, :]) ** 2).sum(-1)
    assert (d.min(axis=1) < 0.1).all()
    # assignment is consistent: points in the same true cluster share labels
    labels = np.asarray(assign).reshape(16, 64)
    same = (labels == labels[:, :1]).mean()
    assert same > 0.95


def test_kmeans_handles_empty_clusters(rng):
    # duplicate points force empty clusters; must not produce NaN centroids
    pts = np.tile(rng.standard_normal((4, 8)).astype(np.float32), (8, 1))
    cents, _ = train_kmeans(pts, 8, n_iters=5)
    assert np.isfinite(np.asarray(cents)).all()


def test_ivf_full_probe_is_exact(rng):
    """nprobe == nlist must equal brute force."""
    pts, _ = clustered_data(rng, n_clusters=8, per_cluster=32)
    idx = IVFFlatIndex(16, nlist=8, nprobe=8)
    idx.build(pts)
    q = rng.standard_normal((5, 16)).astype(np.float32)
    vals, ids = idx.search(q, 7, nprobe=8)
    ref_vals, ref_ids = numpy_exact(q, pts, 7, "L2")
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-3, atol=1e-3)


def test_ivf_recall_increases_with_nprobe(rng):
    pts, _ = clustered_data(rng, n_clusters=32, per_cluster=32, spread=0.5)
    idx = IVFFlatIndex(16, nlist=32)
    idx.build(pts)
    q = rng.standard_normal((32, 16)).astype(np.float32)
    _, truth = numpy_exact(q, pts, 10, "L2")

    def recall(nprobe):
        _, ids = idx.search(q, 10, nprobe=nprobe)
        ids = np.asarray(ids)
        return np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 10.0
            for a, b in zip(ids, truth)
        ])

    r1, r8, r32 = recall(1), recall(8), recall(32)
    assert r1 <= r8 + 1e-9 <= r32 + 2e-9
    assert r32 > 0.999  # full probe exact
    assert r8 > 0.8


def test_ivf_self_retrieval(rng):
    pts, _ = clustered_data(rng, n_clusters=8, per_cluster=16)
    idx = IVFFlatIndex(16, nlist=8, nprobe=2)
    idx.build(pts)
    vals, ids = idx.search(pts[37], 1)
    assert int(np.asarray(ids)[0, 0]) == 37
    assert float(np.asarray(vals)[0, 0]) < 1e-5


def test_ivf_streaming_add_and_rebuild(rng):
    pts, _ = clustered_data(rng, n_clusters=8, per_cluster=32)
    idx = IVFFlatIndex(16, nlist=8, nprobe=8)
    idx.build(pts[:200])
    assert idx.ntotal == 200
    idx.add(pts[200:220])  # below threshold: pending tier
    assert idx.ntotal == 220
    # new vectors findable immediately (exact pending scan)
    vals, ids = idx.search(pts[210], 1)
    assert int(np.asarray(ids)[0, 0]) == 210
    idx.add(pts[220:])  # pushes past threshold: auto-rebuild
    assert idx._pending.ntotal == 0
    vals, ids = idx.search(pts[240], 1)
    assert int(np.asarray(ids)[0, 0]) == 240


def test_ivf_state_roundtrip(rng, tmp_path):
    from rag_faiss_embedding_tpu.index import VectorStore

    pts, _ = clustered_data(rng, n_clusters=4, per_cluster=16)
    idx = IVFFlatIndex(16, nlist=4, nprobe=4)
    store = VectorStore(dimension=16, index_path=tmp_path / "ivf.idx", index=idx)
    doc_ids = list(range(100, 100 + len(pts)))
    store.add_vectors(pts, doc_ids)
    d1, i1 = store.search(pts[5], k=3)
    store.save_index()

    loaded = VectorStore(dimension=16, index_path=tmp_path / "ivf.idx")
    assert isinstance(loaded.index, IVFFlatIndex)
    d2, i2 = loaded.search(pts[5], k=3)
    assert i1 == i2 == [105, *i1[1:]]


def test_ivf_empty_and_k_padding(rng):
    idx = IVFFlatIndex(8, nlist=4)
    vals, ids = idx.search(rng.standard_normal((2, 8)).astype(np.float32), 3)
    assert (np.asarray(ids) == -1).all()
    pts = rng.standard_normal((16, 8)).astype(np.float32)
    idx.build(pts)
    vals, ids = idx.search(pts[0], 50, nprobe=4)
    assert np.asarray(ids).shape == (1, 50)


@pytest.mark.slow
def test_ivf_window_cap_spills_and_stays_exact(rng):
    """Skewed lists: the window cap spills overflow to the exact tier without
    losing any row (full probe still matches brute force)."""
    # one giant cluster + several small ones -> heavy list-length skew
    big = rng.standard_normal((600, 16)).astype(np.float32) * 0.05
    rest = (rng.standard_normal((8, 16)).astype(np.float32) * 5
            + 0.05 * rng.standard_normal((8, 40, 16)).astype(np.float32)
            .transpose(1, 0, 2)).reshape(-1, 16)
    pts = np.concatenate([big, rest.astype(np.float32)])
    idx = IVFFlatIndex(16, nlist=8, nprobe=8, train_iters=10)
    idx.window_quantile = 0.5  # force a cap well below the biggest list
    idx.build(pts)
    assert idx._pending.ntotal > 0, "expected spill"
    assert idx.ntotal == len(pts)  # spilled rows not double counted
    q = rng.standard_normal((6, 16)).astype(np.float32)
    vals, ids = idx.search(q, 7, nprobe=8)
    ref_vals, ref_ids = numpy_exact(q, pts, 7, "L2")
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)
    # streaming adds on top of spill keep working and stay findable
    extra = rng.standard_normal((5, 16)).astype(np.float32)
    idx.add(extra)
    _, hit = idx.search(extra[2], 1)
    assert int(np.asarray(hit)[0, 0]) == len(pts) + 2
    # vectors() reconstructs insertion order exactly
    np.testing.assert_allclose(
        idx.vectors(), np.concatenate([pts, extra]), rtol=1e-6
    )
