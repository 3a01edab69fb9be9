"""Sharded index single-chip parity (round-2): device-side IVF build with
capped window + per-device spill, streaming adds, persistence round trips,
and the sharded flat index's on-device grow + load path.

All on the 8-virtual-CPU-device mesh (conftest forces jax_platforms=cpu).
"""

import numpy as np
import pytest

from rag_faiss_embedding_tpu.core.mesh import make_mesh
from rag_faiss_embedding_tpu.parallel.sharded import ShardedFlatIndex
from rag_faiss_embedding_tpu.parallel.sharded_ivf import ShardedIVFIndex

from .test_distance import numpy_exact
from .test_ivf import clustered_data


def _recall(ids, truth):
    ids = np.asarray(ids)
    return np.mean([
        len(set(a.tolist()) & set(b.tolist())) / truth.shape[1]
        for a, b in zip(ids, truth)
    ])


def test_sharded_ivf_window_cap_spills_and_stays_exact(rng):
    """Skewed lists + forced low cap: full probe still matches brute force
    (spilled rows are scanned exactly on their home device). Centroids are
    PINNED (training is skipped when they are preset) because the
    donor-split balancing in train_kmeans now flattens this kind of skew —
    the spill path needs a build whose lists genuinely overflow the cap."""
    mesh = make_mesh({"db": 4})
    import jax.numpy as jnp

    centers = rng.standard_normal((8, 16)).astype(np.float32) * 5
    big = rng.standard_normal((600, 16)).astype(np.float32) * 0.05 + centers[0]
    rest = (centers[None] + 0.05 * rng.standard_normal((40, 8, 16))
            ).reshape(-1, 16).astype(np.float32)
    pts = np.concatenate([big, rest])
    idx = ShardedIVFIndex(16, mesh, nlist=8, nprobe=8, train_iters=10)
    idx.window_quantile = 0.5
    idx.centroids = jnp.asarray(centers)  # list 0 holds 640 rows -> spill
    idx.build(pts)
    assert idx._spill is not None, "expected spill"
    q = rng.standard_normal((6, 16)).astype(np.float32)
    ref_vals, ref_ids = numpy_exact(q, pts, 7, "L2")
    vals, ids = idx.search(q, 7, nprobe=8)
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-3,
                               atol=1e-3)


@pytest.mark.slow
def test_sharded_ivf_streaming_add_and_rebuild(rng):
    mesh = make_mesh({"db": 4})
    pts, _ = clustered_data(rng, n_clusters=8, per_cluster=32)
    idx = ShardedIVFIndex(16, mesh, nlist=8, nprobe=8, train_iters=8)
    idx.build(pts[:200])
    assert idx.ntotal == 200
    idx.add(pts[200:220])  # below threshold: pending tier
    assert idx.ntotal == 220
    # new vectors findable immediately (exact pending scan)
    _, ids = idx.search(pts[210], 1)
    assert int(np.asarray(ids)[0, 0]) == 210
    idx.add(pts[220:])  # pushes past threshold: auto-rebuild
    assert len(idx._stream_ids) == 0
    _, ids = idx.search(pts[240], 1)
    assert int(np.asarray(ids)[0, 0]) == 240
    # full probe after rebuild is still exact
    q = rng.standard_normal((4, 16)).astype(np.float32)
    _, ref_ids = numpy_exact(q, pts, 5, "L2")
    _, ids = idx.search(q, 5, nprobe=8)
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)


@pytest.mark.slow
def test_sharded_ivf_state_roundtrip(rng, tmp_path):
    from rag_faiss_embedding_tpu.index import VectorStore

    mesh = make_mesh({"db": 4})
    pts, _ = clustered_data(rng, n_clusters=4, per_cluster=32)
    idx = ShardedIVFIndex(16, mesh, nlist=4, nprobe=4, train_iters=8)
    store = VectorStore(dimension=16, index_path=tmp_path / "sivf.idx",
                        index=idx)
    doc_ids = list(range(500, 500 + len(pts)))
    store.add_vectors(pts, doc_ids)
    d1, i1 = store.search(pts[7], k=3)
    store.save_index()

    loaded = VectorStore(dimension=16, index_path=tmp_path / "sivf.idx",
                         mesh=mesh)
    assert isinstance(loaded.index, ShardedIVFIndex)
    d2, i2 = loaded.search(pts[7], k=3)
    assert i1 == i2 == [507, *i1[1:]]
    np.testing.assert_allclose(d1, d2, rtol=1e-4, atol=1e-5)


def test_sharded_ivf_vectors_insertion_order(rng):
    mesh = make_mesh({"db": 4})
    pts, _ = clustered_data(rng, n_clusters=8, per_cluster=32)
    idx = ShardedIVFIndex(16, mesh, nlist=8, train_iters=8)
    idx.window_quantile = 0.5  # force spill; must not double count
    idx.build(pts[:220])
    extra = rng.standard_normal((7, 16)).astype(np.float32)
    idx.add(extra)
    np.testing.assert_allclose(
        idx.vectors(), np.concatenate([pts[:220], extra]), rtol=1e-6
    )


@pytest.mark.slow
def test_sharded_ivf_int8_storage(rng):
    """int8 sharded IVF (pruning + quantization compose across the mesh):
    full probe hits the flat SQ8 recall bar; spill/pending tiers stay
    full-precision so streamed rows are found exactly."""
    mesh = make_mesh({"db": 4})
    pts, _ = clustered_data(rng, n_clusters=8, per_cluster=48, spread=0.5)
    idx = ShardedIVFIndex(16, mesh, nlist=8, nprobe=8, train_iters=8,
                          dtype="int8")
    idx.build(pts)
    q = rng.standard_normal((16, 16)).astype(np.float32)
    _, ref_ids = numpy_exact(q, pts, 10, "L2")
    _, ids = idx.search(q, 10, nprobe=8)
    assert _recall(ids, ref_ids) >= 0.95
    extra = rng.standard_normal((5, 16)).astype(np.float32)
    idx.add(extra)
    _, hit = idx.search(extra[2], 1)
    assert int(np.asarray(hit)[0, 0]) == len(pts) + 2
    # insertion-order reconstruction (dequantized) stays close
    np.testing.assert_allclose(
        idx.vectors(), np.concatenate([pts, extra]), atol=0.05, rtol=0.1
    )


def test_sharded_ivf_reset_releases_buffers(rng):
    mesh = make_mesh({"db": 4})
    pts, _ = clustered_data(rng, n_clusters=4, per_cluster=32)
    idx = ShardedIVFIndex(16, mesh, nlist=4, train_iters=5)
    idx.build(pts)
    idx.reset()
    assert idx.ntotal == 0 and idx._vecs is None and idx._spill is None
    # rebuildable after reset
    idx.build(pts)
    _, ids = idx.search(pts[3], 1, nprobe=4)
    assert int(np.asarray(ids)[0, 0]) == 3


def test_sharded_flat_grow_on_device_keeps_positions(rng):
    """Growth past capacity preserves global row positions (the doc-id
    mapping is positional) and stays searchable."""
    mesh = make_mesh({"db": 8})
    idx = ShardedFlatIndex(16, mesh, capacity=8192)
    cap0 = idx._capacity
    db = rng.standard_normal((cap0 + 3000, 16)).astype(np.float32)
    idx.add(db[:5000])
    idx.add(db[5000:])  # forces growth
    assert idx._capacity > cap0
    q = db[::1717]
    ref_vals, ref_ids = numpy_exact(q, db, 5, "L2")
    vals, ids = idx.search(q, 5)
    np.testing.assert_array_equal(np.asarray(ids), ref_ids)
    # buffers remain sharded over the db axis after growth
    assert len(idx._buf.sharding.device_set) == 8


def test_sharded_flat_state_roundtrip(rng, tmp_path):
    from rag_faiss_embedding_tpu.index import VectorStore

    mesh = make_mesh({"db": 4})
    db = rng.standard_normal((256, 16)).astype(np.float32)
    idx = ShardedFlatIndex(16, mesh)
    store = VectorStore(dimension=16, index_path=tmp_path / "sflat.idx",
                        index=idx)
    store.add_vectors(db, list(range(1000, 1256)))
    d1, i1 = store.search(db[9], k=4)
    store.save_index()

    loaded = VectorStore(dimension=16, index_path=tmp_path / "sflat.idx",
                         mesh=mesh)
    assert isinstance(loaded.index, ShardedFlatIndex)
    d2, i2 = loaded.search(db[9], k=4)
    assert i1 == i2 == [1009, *i1[1:]]
    np.testing.assert_allclose(d1, d2, rtol=1e-5, atol=1e-6)


def test_sharded_flat_loads_without_explicit_mesh(rng, tmp_path):
    """No mesh passed -> defaults to all local devices on a 'db' axis."""
    from rag_faiss_embedding_tpu.index import VectorStore

    mesh = make_mesh({"db": 2})
    db = rng.standard_normal((64, 8)).astype(np.float32)
    idx = ShardedFlatIndex(8, mesh)
    store = VectorStore(dimension=8, index_path=tmp_path / "s2.idx",
                        index=idx)
    store.add_vectors(db, list(range(64)))
    store.save_index()
    loaded = VectorStore(dimension=8, index_path=tmp_path / "s2.idx")
    assert isinstance(loaded.index, ShardedFlatIndex)
    assert loaded.index.n_dev == 8  # all virtual devices
    _, ids = loaded.search(db[3], k=1)
    assert ids == [3]


def test_sharded_ivf_ip_metric(rng):
    """IP metric across the mesh (VERDICT r2 #4): spherical k-means + dot
    probes + descending all-gather merge; full probe matches the numpy IP
    oracle, streamed adds surface through the pending tier."""
    mesh = make_mesh({"db": 4})
    pts, _ = clustered_data(rng, n_clusters=8, per_cluster=32, spread=0.2)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    idx = ShardedIVFIndex(16, mesh, nlist=8, nprobe=8, metric="IP",
                          train_iters=12)
    idx.build(pts)
    q = pts[::7] + 0.03 * rng.standard_normal(
        (len(pts[::7]), 16)).astype(np.float32)
    q = (q / np.linalg.norm(q, axis=1, keepdims=True)).astype(np.float32)
    ref_vals, ref_ids = numpy_exact(q, pts, 5, "IP")
    vals, ids = idx.search(q, 5, nprobe=8)
    assert _recall(ids, ref_ids) == 1.0
    vals = np.asarray(vals)
    assert (np.diff(vals, axis=1) <= 1e-6).all()  # IP descends
    np.testing.assert_allclose(
        np.sort(vals, 1), np.sort(ref_vals, 1), rtol=1e-3, atol=1e-3
    )
    # small nprobe stays sharp on clustered data
    _, ids1 = idx.search(q, 5, nprobe=2)
    assert _recall(ids1, ref_ids) > 0.9
    # streamed adds reachable (IP-scored pending tier)
    extra = rng.standard_normal((3, 16)).astype(np.float32)
    extra /= np.linalg.norm(extra, axis=1, keepdims=True)
    idx.add(extra)
    _, hit = idx.search(extra[1], 1)
    assert int(np.asarray(hit)[0, 0]) == len(pts) + 1


def test_sharded_ivf_lossless_reload_is_not_a_rebuild(rng, monkeypatch):
    """VERDICT r2 #3: reload re-SCATTERS saved rows (no re-assignment, no
    host-side rebuild) and results match bit-exactly."""
    import jax.numpy as jnp

    from rag_faiss_embedding_tpu.parallel import sharded_ivf as siv

    mesh = make_mesh({"db": 4})
    centers = rng.standard_normal((8, 16)).astype(np.float32) * 5
    big = rng.standard_normal((600, 16)).astype(np.float32) * 0.05 + centers[0]
    rest = (centers[None] + 0.05 * rng.standard_normal((40, 8, 16))
            ).reshape(-1, 16).astype(np.float32)
    pts = np.concatenate([big, rest])
    idx = ShardedIVFIndex(16, mesh, nlist=8, nprobe=8, train_iters=10)
    idx.window_quantile = 0.5
    idx.centroids = jnp.asarray(centers)
    idx.build(pts)
    assert idx._spill is not None  # spill tier must round-trip too
    extra = rng.standard_normal((5, 16)).astype(np.float32)
    idx.add(extra)  # stream tier must round-trip too
    q = rng.standard_normal((6, 16)).astype(np.float32)
    v1, i1 = map(np.asarray, idx.search(q, 7, nprobe=8))
    state = idx.state_dict()

    def boom(*a, **k):
        raise AssertionError("reload must not re-assign or re-build")

    monkeypatch.setattr(siv, "kmeans_assign", boom)
    monkeypatch.setattr(siv, "train_kmeans", boom)
    monkeypatch.setattr(ShardedIVFIndex, "build", boom)
    loaded = ShardedIVFIndex.from_state_dict(state, mesh=mesh)
    assert loaded._window == idx._window
    v2, i2 = map(np.asarray, loaded.search(q, 7, nprobe=8))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(v1, v2)  # f32 reload is bit-exact


def test_sharded_ivf_int8_reload_bit_exact(rng):
    """int8 codes and scales persist AS STORED: no dequantize->requantize
    cycle on reload (the round-2 lossy path)."""
    mesh = make_mesh({"db": 4})
    pts, _ = clustered_data(rng, n_clusters=8, per_cluster=48, spread=0.5)
    idx = ShardedIVFIndex(16, mesh, nlist=8, nprobe=8, train_iters=8,
                          dtype="int8")
    idx.build(pts)
    state = idx.state_dict()
    loaded = ShardedIVFIndex.from_state_dict(state, mesh=mesh)
    # identical code bytes and scales, per global row id
    def by_id(i):
        ids = np.asarray(i._ids).reshape(-1)
        live = ids >= 0
        order = np.argsort(ids[live])
        codes = np.asarray(i._vecs.reshape(-1, 16))[live][order]
        scales = np.asarray(i._scales.reshape(-1))[live][order]
        return codes, scales
    c1, s1 = by_id(idx)
    c2, s2 = by_id(loaded)
    np.testing.assert_array_equal(c1, c2)
    np.testing.assert_array_equal(s1, s2)
    q = rng.standard_normal((8, 16)).astype(np.float32)
    v1, i1 = map(np.asarray, idx.search(q, 5, nprobe=8))
    v2, i2 = map(np.asarray, loaded.search(q, 5, nprobe=8))
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(v1, v2)


def test_sharded_ivf_reload_across_mesh_sizes(rng):
    """A 4-device save loads onto a 2-device mesh by re-striping saved rows
    (list membership preserved, no re-assignment) with matching results."""
    pts, _ = clustered_data(rng, n_clusters=8, per_cluster=32)
    idx = ShardedIVFIndex(16, make_mesh({"db": 4}), nlist=8, nprobe=8,
                          train_iters=8)
    idx.build(pts)
    q = rng.standard_normal((6, 16)).astype(np.float32)
    _, i1 = map(np.asarray, idx.search(q, 5, nprobe=8))
    state = idx.state_dict()
    loaded = ShardedIVFIndex.from_state_dict(state, mesh=make_mesh({"db": 2}))
    assert loaded.n_dev == 2
    _, i2 = map(np.asarray, loaded.search(q, 5, nprobe=8))
    np.testing.assert_array_equal(i1, i2)


def test_sharded_flat_bf16_state_roundtrip(rng, tmp_path):
    """bf16 sharded-flat persistence: uint16 bit-pattern save, exact
    reload (the void-dtype serialization bug also hit the sharded tier)."""
    from rag_faiss_embedding_tpu.index import VectorStore

    mesh = make_mesh({"db": 4})
    pts = rng.standard_normal((96, 16)).astype(np.float32)
    idx = ShardedFlatIndex(16, mesh, dtype="bfloat16")
    store = VectorStore(dimension=16, index_path=tmp_path / "sbf.idx",
                        index=idx)
    store.add_vectors(pts, list(range(96)))
    d1, i1 = store.search(pts[33], k=3)
    store.save_index()
    loaded = VectorStore(dimension=16, index_path=tmp_path / "sbf.idx",
                         mesh=mesh)
    assert isinstance(loaded.index, ShardedFlatIndex)
    d2, i2 = loaded.search(pts[33], k=3)
    assert i1 == i2
    np.testing.assert_array_equal(d1, d2)


@pytest.mark.slow
def test_sharded_ivf_pallas_backend_parity(rng):
    """The Pallas union-scan kernel runs per device under shard_map
    (forced interpret off-TPU): results match the XLA backend on the same
    built index."""
    pts, _ = clustered_data(rng, n_clusters=8, per_cluster=64)
    dim = 16
    # pallas eligibility needs dim % 128 == 0: widen by tiling columns
    pts = np.tile(pts, (1, 8)).astype(np.float32)
    idx = ShardedIVFIndex(128, make_mesh({"db": 4}), nlist=8, nprobe=8,
                          train_iters=8)
    idx.build(pts)
    q = rng.standard_normal((16, 128)).astype(np.float32)
    idx.backend = "xla"
    vx, ix = map(np.asarray, idx.search(q, 5, nprobe=8))
    idx.backend = "pallas"
    vp, ip_ = map(np.asarray, idx.search(q, 5, nprobe=8))
    np.testing.assert_array_equal(ix, ip_)
    live = ip_ >= 0
    np.testing.assert_allclose(vp[live], vx[live], rtol=1e-3, atol=1e-3)
