"""FAISS ``remove_ids`` parity across all four index kinds.

The reference only ever drops the whole database (``drop-database.py``,
``faiss_store.py:124-128`` reset); real FAISS supports per-row removal via
``Index.remove_ids``. Our analog tombstones rows (stable positions) and
compacts on save/rebuild. Conventions per CLAUDE.md: float64 numpy oracle,
edge cases (remove-all, k > nlive, bogus ids), persistence round trips.
"""

import numpy as np
import pytest

from rag_faiss_embedding_tpu.core.mesh import make_mesh
from rag_faiss_embedding_tpu.index import FlatIndex
from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex
from rag_faiss_embedding_tpu.parallel.sharded import ShardedFlatIndex
from rag_faiss_embedding_tpu.parallel.sharded_ivf import ShardedIVFIndex

from .test_distance import assert_rank_match, numpy_exact
from .test_ivf import clustered_data


def oracle_without(q, db, removed, k, metric):
    """Float64 exact top-k over the live rows, ids in ORIGINAL positions."""
    live = np.setdiff1d(np.arange(len(db)), np.asarray(removed))
    vals, ids = numpy_exact(q, db[live], k, metric)
    return vals, live[ids]


# ------------------------------------------------------------------- flat
@pytest.mark.parametrize("metric", ["L2", "IP"])
def test_flat_remove_ids_oracle(rng, metric):
    db = rng.standard_normal((200, 32)).astype(np.float32)
    q = rng.standard_normal((5, 32)).astype(np.float32)
    removed = rng.choice(200, size=50, replace=False)
    idx = FlatIndex(32, metric=metric, use_pallas=False)
    idx.add(db)
    assert idx.remove_ids(removed) == 50
    assert idx.nlive == 150 and idx.ntotal == 200
    vals, ids = idx.search(q, 7)
    ref_vals, ref_ids = oracle_without(q, db, removed, 7, metric)
    assert_rank_match(vals, ids, ref_vals, ref_ids)
    # no tombstoned row ever surfaces
    assert not np.isin(np.asarray(ids), removed).any()


def test_flat_remove_edge_cases(rng):
    idx = FlatIndex(8, use_pallas=False)
    idx.add(rng.standard_normal((6, 8)).astype(np.float32))
    # out-of-range / duplicate ids are ignored (FAISS IDSelector semantics)
    assert idx.remove_ids(np.array([2, 2, 99, -5])) == 1
    # double removal is idempotent
    assert idx.remove_ids(np.array([2])) == 0
    assert idx.nlive == 5
    # k > nlive pads with -1
    vals, ids = idx.search(rng.standard_normal((2, 8)).astype(np.float32), 8)
    ids = np.asarray(ids)
    assert ids.shape == (2, 8)
    assert (np.sort(ids[0])[: 8 - 5] == -1).all()
    assert 2 not in ids
    # remove everything -> all -1
    idx.remove_ids(np.arange(6))
    assert idx.nlive == 0
    _, ids = idx.search(rng.standard_normal((1, 8)).astype(np.float32), 3)
    assert (np.asarray(ids) == -1).all()
    # reset clears tombstones
    idx.reset()
    assert idx.ndeleted == 0 and idx._dead is None


def test_flat_remove_persistence(rng):
    db = rng.standard_normal((64, 16)).astype(np.float32)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    idx = FlatIndex(16, use_pallas=False)
    idx.add(db)
    idx.remove_ids(np.array([0, 10, 63]))
    d1, i1 = idx.search(q, 5)
    state = idx.state_dict()
    assert "dead" in state
    loaded = FlatIndex.from_state_dict(state)
    loaded._use_pallas = False
    assert loaded.nlive == 61 and loaded.ndeleted == 3
    d2, i2 = loaded.search(q, 5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)


def test_int8_rerank_remove_does_not_resurrect(rng):
    """The exact stage-2 rescore must keep tombstoned candidates masked:
    remove each query's true top hit and assert it never comes back."""
    db = rng.standard_normal((600, 32)).astype(np.float32)
    q = db[:4] + 0.001  # top hit of query i is row i by construction
    idx = FlatIndex(32, dtype="int8", selector="rerank")
    idx.add(db)
    _, before = idx.search(q, 3, chunk_size=256)
    assert [int(r[0]) for r in np.asarray(before)] == [0, 1, 2, 3]
    idx.remove_ids(np.arange(4))
    vals, after = idx.search(q, 3, chunk_size=256)
    after = np.asarray(after)
    assert not np.isin(after, np.arange(4)).any()
    ref_vals, ref_ids = oracle_without(q, db, np.arange(4), 3, "L2")
    recall = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 3
        for a, b in zip(after, ref_ids)
    ])
    assert recall >= 0.9, recall


def test_int8_plain_remove(rng):
    db = rng.standard_normal((300, 16)).astype(np.float32)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    removed = np.arange(0, 300, 3)
    idx = FlatIndex(16, dtype="int8")
    idx.add(db)
    idx.remove_ids(removed)
    _, ids = idx.search(q, 10, chunk_size=128)
    assert not np.isin(np.asarray(ids), removed).any()


# -------------------------------------------------------------------- IVF
def test_ivf_remove_ids_oracle(rng):
    """Full probe stays exact over the live rows, across built AND pending
    tiers (ids are original insertion ids)."""
    pts, _ = clustered_data(rng, n_clusters=8, per_cluster=32)
    idx = IVFFlatIndex(16, nlist=8, nprobe=8)
    idx.build(pts[:200])
    idx.add(pts[200:220])  # pending tier, ids 200..219
    removed = np.concatenate([
        rng.choice(200, size=40, replace=False),        # built tier
        rng.choice(np.arange(200, 220), 5, replace=False),  # pending tier
    ])
    assert idx.remove_ids(removed) == 45
    assert idx.nlive == 175
    q = rng.standard_normal((6, 16)).astype(np.float32)
    vals, ids = idx.search(q, 7, nprobe=8)
    ref_vals, ref_ids = oracle_without(q, pts[:220], removed, 7, "L2")
    assert_rank_match(vals, ids, ref_vals, ref_ids, tol=1e-3)
    assert not np.isin(np.asarray(ids), removed).any()


def test_ivf_remove_persistence_compacts(rng):
    """Save/load doubles as compaction: only live rows survive, results are
    identical, and positions stay stable (next_id preserved)."""
    pts, _ = clustered_data(rng, n_clusters=8, per_cluster=32)
    idx = IVFFlatIndex(16, nlist=8, nprobe=8)
    idx.build(pts[:200])
    idx.add(pts[200:210])
    removed = np.array([0, 50, 100, 150, 205])
    idx.remove_ids(removed)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    d1, i1 = idx.search(q, 5, nprobe=8)
    state = idx.state_dict()
    loaded = IVFFlatIndex.from_state_dict(state)
    assert loaded.ndeleted == 0          # compacted on save
    assert loaded.nlive == idx.nlive
    assert loaded.ntotal == idx.ntotal   # id space preserved
    d2, i2 = loaded.search(q, 5, nprobe=8)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-5, atol=1e-5)


def test_ivf_rebuild_keeps_original_ids(rng):
    pts, _ = clustered_data(rng, n_clusters=8, per_cluster=32)
    idx = IVFFlatIndex(16, nlist=8, nprobe=8)
    idx.build(pts)
    idx.remove_ids(np.arange(0, 256, 2))  # half the rows
    idx.rebuild()
    assert idx.ndeleted == 0 and idx.nlive == 128
    # surviving rows answer under their ORIGINAL ids
    q = pts[33:34]  # odd row, survives
    _, ids = idx.search(q, 1, nprobe=8)
    assert int(np.asarray(ids)[0, 0]) == 33
    # removed rows are gone for good
    _, ids = idx.search(pts[32:33], 3, nprobe=8)
    assert 32 not in np.asarray(ids)


def test_ivf_vectors_excludes_removed(rng):
    pts, _ = clustered_data(rng, n_clusters=4, per_cluster=16)
    idx = IVFFlatIndex(16, nlist=4, nprobe=4)
    idx.build(pts)
    idx.remove_ids(np.array([3, 7]))
    vecs, ids = idx.vectors(return_ids=True)
    assert len(vecs) == 62
    assert 3 not in ids and 7 not in ids
    np.testing.assert_allclose(vecs[list(ids).index(5)], pts[5], atol=1e-3)


# ----------------------------------------------------------------- sharded
def test_sharded_flat_remove_ids(rng):
    mesh = make_mesh({"db": 4})
    db = rng.standard_normal((256, 16)).astype(np.float32)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    removed = rng.choice(256, size=60, replace=False)
    idx = ShardedFlatIndex(16, mesh)
    idx.add(db)
    assert idx.remove_ids(removed) == 60
    vals, ids = idx.search(q, 7)
    ref_vals, ref_ids = oracle_without(q, db, removed, 7, "L2")
    assert_rank_match(vals, ids, ref_vals, ref_ids, tol=1e-3)
    # persistence: dead mask survives the round trip
    state = idx.state_dict()
    loaded = ShardedFlatIndex.from_state_dict(state, mesh=mesh)
    assert loaded.nlive == 196
    _, i2 = loaded.search(q, 7)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(i2))


@pytest.mark.slow
def test_sharded_ivf_remove_ids_all_tiers(rng):
    """Tombstones must work in every tier: block lists, per-device spill,
    and the host-staged stream tier."""
    import jax.numpy as jnp

    mesh = make_mesh({"db": 4})
    centers = rng.standard_normal((8, 16)).astype(np.float32) * 5
    big = (rng.standard_normal((600, 16)).astype(np.float32) * 0.05
           + centers[0])
    rest = (centers[None] + 0.05 * rng.standard_normal((40, 8, 16))
            ).reshape(-1, 16).astype(np.float32)
    pts = np.concatenate([big, rest])
    idx = ShardedIVFIndex(16, mesh, nlist=8, nprobe=8, train_iters=10)
    idx.window_quantile = 0.5
    idx.centroids = jnp.asarray(centers)  # skew list 0 -> forces spill
    idx.build(pts)
    assert idx._spill is not None
    extra = (centers[1] + 0.05
             * rng.standard_normal((10, 16))).astype(np.float32)
    idx.add(extra)  # stream tier, ids 920..929
    n = len(pts) + 10
    removed = np.concatenate([
        rng.choice(len(pts), size=100, replace=False),
        np.array([920, 925]),
    ])
    removed = np.unique(removed)
    got = idx.remove_ids(removed)
    assert got == len(removed)
    assert idx.nlive == n - len(removed)
    all_pts = np.concatenate([pts, extra])
    q = rng.standard_normal((5, 16)).astype(np.float32)
    vals, ids = idx.search(q, 7, nprobe=8)
    ref_vals, ref_ids = oracle_without(q, all_pts, removed, 7, "L2")
    assert_rank_match(vals, ids, ref_vals, ref_ids, tol=1e-3)
    assert not np.isin(np.asarray(ids), removed).any()

    # persistence compacts; results identical after reload
    state = idx.state_dict()
    loaded = ShardedIVFIndex.from_state_dict(state, mesh=mesh)
    assert loaded.ndeleted == 0
    assert loaded.nlive == idx.nlive
    d2, i2 = loaded.search(q, 7, nprobe=8)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(i2))

    # rebuild keeps original ids
    idx.rebuild()
    assert idx.ndeleted == 0
    _, ids3 = idx.search(q, 7, nprobe=8)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(ids3))


# -------------------------------------------------------- vector store layer
def test_vector_store_remove_doc_ids(rng, tmp_path):
    from rag_faiss_embedding_tpu.index import VectorStore

    store = VectorStore(dimension=16, index_path=tmp_path / "rm.idx")
    store.index._use_pallas = False
    vecs = rng.standard_normal((6, 16)).astype(np.float32)
    doc_ids = [9, 4, 1, 16, 12, 7]
    store.add_vectors(vecs, doc_ids)
    assert store.remove_doc_ids([4, 12, 999]) == 2
    _, ids = store.search(vecs[1], k=3)
    assert 4 not in ids and 12 not in ids
    # mapping slots are cleared, persisted, and survive reload
    store.save_index()
    loaded = VectorStore(dimension=16, index_path=tmp_path / "rm.idx")
    loaded.index._use_pallas = False
    assert loaded.doc_ids == [9, -1, 1, 16, -1, 7]
    _, ids2 = loaded.search(vecs[3], k=6)
    assert set(ids2) == {9, 1, 16, 7}
