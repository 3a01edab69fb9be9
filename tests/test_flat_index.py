import numpy as np
import pytest
import jax.numpy as jnp

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


def test_int8_index_recall_and_values(rng):
    """SQ8 tier: near-exact recall, distances close to true values."""
    from .test_distance import numpy_exact

    db = rng.standard_normal((512, 64)).astype(np.float32)
    q = rng.standard_normal((16, 64)).astype(np.float32)
    idx = FlatIndex(64, dtype="int8")
    idx.add(db)
    vals, ids = idx.search(q, 10)
    ref_vals, ref_ids = numpy_exact(q, db, 10, "L2")
    ids = np.asarray(ids)
    recall = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(ids, ref_ids)
    ])
    assert recall >= 0.95, recall
    # distances approximate the true ones within quantization error
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=0.05, atol=0.5)


def test_int8_ip_metric(rng):
    from .test_distance import numpy_exact

    db = rng.standard_normal((256, 32)).astype(np.float32)
    q = rng.standard_normal((8, 32)).astype(np.float32)
    idx = FlatIndex(32, metric="IP", dtype="int8")
    idx.add(db)
    _, ids = idx.search(q, 5)
    _, ref_ids = numpy_exact(q, db, 5, "IP")
    recall = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 5
        for a, b in zip(np.asarray(ids), ref_ids)
    ])
    assert recall >= 0.95


def test_int8_persistence_lossless(rng, tmp_path):
    from rag_faiss_embedding_tpu.index import VectorStore

    db = rng.standard_normal((64, 16)).astype(np.float32)
    store = VectorStore(dimension=16, dtype="int8",
                        index_path=tmp_path / "q.idx")
    store.add_vectors(db, list(range(64)))
    d1, i1 = store.search(db[:4], k=3)
    store.save_index()
    loaded = VectorStore(dimension=16, index_path=tmp_path / "q.idx")
    assert loaded.index.quantized
    d2, i2 = loaded.search(db[:4], k=3)
    assert i1 == i2
    for a, b in zip(d1, d2):
        np.testing.assert_allclose(a, b, rtol=1e-6)


def test_int8_streaming_add(rng):
    idx = FlatIndex(16, dtype="int8")
    db = rng.standard_normal((100, 16)).astype(np.float32)
    idx.add(db[:60])
    idx.add(db[60:])
    vals, ids = idx.search(db[80], 1)
    assert int(np.asarray(ids)[0, 0]) == 80


def test_int8_edge_cases(rng):
    """k > ntotal and empty index for the SQ8 tier (CLAUDE.md edge rule)."""
    idx = FlatIndex(8, dtype="int8")
    vals, ids = idx.search(rng.standard_normal((2, 8)).astype(np.float32), 3)
    assert (np.asarray(ids) == -1).all()
    idx.add(rng.standard_normal((4, 8)).astype(np.float32))
    vals, ids = idx.search(rng.standard_normal((2, 8)).astype(np.float32), 10)
    ids = np.asarray(ids)
    assert ids.shape == (2, 10)
    assert (ids[:, 4:] == -1).all()
    assert np.isinf(np.asarray(vals)[:, 4:]).all()
    assert set(ids[0, :4]) == {0, 1, 2, 3}


def test_int8_rerank_selector(rng):
    """Two-stage retrieve-then-rerank: recall at least as good as plain int8,
    and reranked distances are bf16-exact (not quantized)."""
    from .test_distance import numpy_exact

    db = rng.standard_normal((2048, 64)).astype(np.float32)
    q = rng.standard_normal((16, 64)).astype(np.float32)
    idx = FlatIndex(64, dtype="int8", selector="rerank")
    idx.add(db)
    vals, ids = idx.search(q, 10, chunk_size=512)  # multi-chunk candidates
    ref_vals, ref_ids = numpy_exact(q, db, 10, "L2")
    ids = np.asarray(ids)
    recall = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(ids, ref_ids)
    ])
    assert recall >= 0.97, recall
    # the exact rerank stage returns full-precision distances (bf16 gather,
    # f32 accumulation): much tighter than int8's rtol=0.05
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=0.02, atol=0.1)


def test_int8_rerank_ip_and_edge_cases(rng):
    from .test_distance import numpy_exact

    db = rng.standard_normal((300, 32)).astype(np.float32)
    q = rng.standard_normal((8, 32)).astype(np.float32)
    idx = FlatIndex(32, metric="IP", dtype="int8", selector="rerank")
    # empty-index search first (edge rule)
    vals, ids = idx.search(q, 5)
    assert (np.asarray(ids) == -1).all()
    idx.add(db)
    _, ids = idx.search(q, 5)
    _, ref_ids = numpy_exact(q, db, 5, "IP")
    recall = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 5
        for a, b in zip(np.asarray(ids), ref_ids)
    ])
    assert recall >= 0.95
    # k > ntotal
    small = FlatIndex(8, dtype="int8", selector="rerank")
    small.add(rng.standard_normal((4, 8)).astype(np.float32))
    vals, ids = small.search(rng.standard_normal((2, 8)).astype(np.float32), 10)
    ids = np.asarray(ids)
    assert ids.shape == (2, 10)
    assert (ids[:, 4:] == -1).all()
    assert set(ids[0, :4]) == {0, 1, 2, 3}


def test_int8_rerank_persistence_round_trip(rng, tmp_path):
    """state_dict/from_state_dict keeps the bf16 shadow bit-exact."""
    db = rng.standard_normal((128, 16)).astype(np.float32)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    idx = FlatIndex(16, dtype="int8", selector="rerank")
    idx.add(db)
    d1, i1 = idx.search(q, 5)
    state = idx.state_dict()
    assert "shadow" in state
    loaded = FlatIndex.from_state_dict(state, selector="rerank")
    assert loaded._shadow is not None
    d2, i2 = loaded.search(q, 5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-6)


def test_rerank_requires_int8():
    with np.testing.assert_raises(ValueError):
        FlatIndex(16, dtype="float32", selector="rerank")


def test_recall_target_defaults():
    from rag_faiss_embedding_tpu.ops.quantize import DEFAULT_INT8_RECALL_TARGET

    assert FlatIndex(16, dtype="int8", selector="approx").recall_target == \
        DEFAULT_INT8_RECALL_TARGET
    assert FlatIndex(16, selector="approx").recall_target == 0.99
    assert FlatIndex(16, dtype="int8", selector="rerank").recall_target == 0.99
    assert FlatIndex(16, dtype="int8", recall_target=0.9).recall_target == 0.9


def test_bf16_flat_state_roundtrip(rng, tmp_path):
    """bf16 storage must survive save/reload: a plain np.asarray of a bf16
    buffer silently serializes as numpy void ("|V2") and used to crash the
    loader; the state now persists the uint16 bit pattern losslessly."""
    from rag_faiss_embedding_tpu.index import VectorStore

    pts = rng.standard_normal((48, 16)).astype(np.float32)
    idx = FlatIndex(16, dtype="bfloat16")
    store = VectorStore(dimension=16, index_path=tmp_path / "bf.idx",
                        index=idx)
    store.add_vectors(pts, list(range(48)))
    d1, i1 = store.search(pts[9], k=4)
    store.save_index()
    loaded = VectorStore(dimension=16, index_path=tmp_path / "bf.idx")
    assert loaded.index.dtype == jnp.bfloat16
    d2, i2 = loaded.search(pts[9], k=4)
    assert i1 == i2
    np.testing.assert_array_equal(d1, d2)  # bf16 bits reload exactly
