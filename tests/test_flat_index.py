import numpy as np
import pytest

from rag_faiss_embedding_tpu.index import FlatIndex, VectorStore
from .test_distance import assert_rank_match, numpy_exact


@pytest.mark.parametrize("metric", ["L2", "IP"])
def test_flat_index_search(rng, metric):
    db = rng.standard_normal((200, 32)).astype(np.float32)
    q = rng.standard_normal((5, 32)).astype(np.float32)
    idx = FlatIndex(32, metric=metric, use_pallas=False)
    idx.add(db)
    vals, ids = idx.search(q, 7)
    ref_vals, ref_ids = numpy_exact(q, db, 7, metric)
    assert_rank_match(vals, ids, ref_vals, ref_ids)


def test_streaming_adds_grow_capacity(rng):
    idx = FlatIndex(16, capacity=1024, use_pallas=False)
    total = 0
    for _ in range(5):
        batch = rng.standard_normal((700, 16)).astype(np.float32)
        idx.add(batch)
        total += 700
    assert idx.ntotal == total
    # last added vector is its own nearest neighbor
    vals, ids = idx.search(batch[-1], 1)
    assert int(np.asarray(ids)[0, 0]) == total - 1
    assert float(np.asarray(vals)[0, 0]) < 1e-5


def test_reset(rng):
    idx = FlatIndex(8, use_pallas=False)
    idx.add(rng.standard_normal((10, 8)).astype(np.float32))
    idx.reset()
    assert idx.ntotal == 0
    vals, ids = idx.search(rng.standard_normal((1, 8)).astype(np.float32), 3)
    assert (np.asarray(ids) == -1).all()


def test_vector_store_id_mapping_and_persistence(rng, tmp_path):
    path = tmp_path / "index.tpu"
    store = VectorStore(dimension=16, index_path=path)
    store.index._use_pallas = False
    vecs = rng.standard_normal((6, 16)).astype(np.float32)
    doc_ids = [9, 4, 1, 16, 12, 7]  # shuffled ids like the bundled .mapping
    store.add_vectors(vecs, doc_ids)
    dists, ids = store.search(vecs[2], k=3)
    assert ids[0] == 1  # row 2 maps to doc id 1
    assert dists[0] < 1e-5

    store.save_index()
    assert path.exists()

    loaded = VectorStore(dimension=16, index_path=path)
    loaded.index._use_pallas = False
    assert loaded.doc_ids == doc_ids
    _, ids2 = loaded.search(vecs[4], k=1)
    assert ids2[0] == 12


def test_vector_store_sequential_fallback(rng, tmp_path):
    path = tmp_path / "index.tpu"
    store = VectorStore(dimension=8, index_path=path)
    store.index._use_pallas = False
    store.add_vectors(rng.standard_normal((3, 8)).astype(np.float32), [5, 6, 7])
    store.save_index()
    (tmp_path / "index.tpu.mapping").unlink()
    loaded = VectorStore(dimension=8, index_path=path)
    assert loaded.doc_ids == [0, 1, 2]


def test_vector_store_batch_search(rng):
    store = VectorStore(dimension=8, index_path="/nonexistent/never.tpu")
    store.index._use_pallas = False
    vecs = rng.standard_normal((10, 8)).astype(np.float32)
    store.add_vectors(vecs, list(range(100, 110)))
    dists, ids = store.search(vecs[:4], k=2)
    assert len(ids) == 4
    assert [row[0] for row in ids] == [100, 101, 102, 103]
