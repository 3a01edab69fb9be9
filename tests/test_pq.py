"""Product quantization: codec, ADC scan, PQIndex surface.

Correctness is split in two (CLAUDE.md conventions):
- the SCAN must rank-match a float64 ADC oracle (exact distances to the
  reconstructions) — bit-level kernel correctness, tested in "f32" compute;
- the CODEC's quality (true recall) is a separate axis, asserted loosely
  (PQ recall is codec-bound by design, like FAISS IndexPQ).
"""

import numpy as np
import pytest

from rag_faiss_embedding_tpu.index.pq import PQIndex
from rag_faiss_embedding_tpu.ops.pq import (
    pq_decode,
    pq_encode,
    pq_search,
    train_pq,
)

from .test_distance import assert_rank_match


def adc_oracle(q, rec, k, metric):
    """Float64 exact top-k against the reconstructions."""
    q64, r64 = q.astype(np.float64), rec.astype(np.float64)
    if metric == "L2":
        d = ((q64[:, None] - r64[None]) ** 2).sum(-1)
        order = np.argsort(d, axis=1, kind="stable")[:, :k]
    else:
        d = q64 @ r64.T
        order = np.argsort(-d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, order, axis=1), order


def clustered(rng, n_clusters=32, per=128, d=64, spread=0.3):
    centers = rng.standard_normal((n_clusters, d)).astype(np.float32) * 3
    pts = (centers[:, None] + spread
           * rng.standard_normal((n_clusters, per, d))
           ).reshape(-1, d).astype(np.float32)
    return pts


# -------------------------------------------------------------------- codec
@pytest.mark.slow
def test_codec_round_trip_and_quality(rng):
    pts = clustered(rng)
    cb = train_pq(pts, m=16, n_iters=20, seed=0)
    assert cb.shape == (16, 256, 4)
    codes, rsq = pq_encode(cb, pts)
    assert codes.shape == (len(pts), 16) and codes.dtype == np.uint8
    rec = np.asarray(pq_decode(cb, codes))
    rel_mse = (np.sum((rec - pts) ** 2, -1).mean()
               / np.sum(pts ** 2, -1).mean())
    assert rel_mse < 0.02, rel_mse  # tight clusters compress well
    # stored norms are the exact reconstruction norms (the ADC identity)
    np.testing.assert_allclose(
        np.asarray(rsq), np.sum(rec.astype(np.float64) ** 2, -1),
        rtol=1e-5,
    )
    # codes are stable under re-encode of the reconstruction
    codes2, _ = pq_encode(cb, rec)
    assert (np.asarray(codes) == np.asarray(codes2)).mean() > 0.999


def test_train_pq_validations(rng):
    with pytest.raises(ValueError):
        train_pq(rng.standard_normal((10, 15)).astype(np.float32), m=4)
    with pytest.raises(ValueError):
        train_pq(np.zeros((0, 16), np.float32), m=4)
    # fewer points than ksub: codebook shrinks, still functional
    pts = rng.standard_normal((40, 16)).astype(np.float32)
    cb = train_pq(pts, m=4, seed=0)
    assert cb.shape == (4, 40, 4)
    codes, _ = pq_encode(cb, pts)
    assert int(np.asarray(codes).max()) < 40


@pytest.mark.parametrize("metric", ["L2", "IP"])
def test_pq_search_matches_adc_oracle(rng, metric):
    """The scan in f32 compute rank-matches exact search over the
    reconstructions — kernel correctness, independent of codec quality."""
    pts = clustered(rng)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    cb = train_pq(pts, m=16, n_iters=15, seed=0)
    codes, rsq = pq_encode(cb, pts)
    vals, ids = pq_search(
        q, codes, cb, rsq, 10, metric=metric, n_valid=len(pts),
        chunk_size=1024, compute_dtype="f32",
    )
    rec = np.asarray(pq_decode(cb, codes))
    ref_vals, ref_ids = adc_oracle(q, rec, 10, metric)
    assert_rank_match(vals, ids, ref_vals, ref_ids)


@pytest.mark.slow
def test_pq_true_recall_improves_with_m(rng):
    pts = clustered(rng, spread=0.5)
    q = rng.standard_normal((16, 64)).astype(np.float32)
    d = ((q[:, None] - pts[None]) ** 2).sum(-1)
    truth = np.argsort(d, 1)[:, :10]

    def recall(m):
        cb = train_pq(pts, m=m, n_iters=15, seed=0)
        codes, rsq = pq_encode(cb, pts)
        _, ids = pq_search(q, codes, cb, rsq, 10, n_valid=len(pts),
                           chunk_size=4096, compute_dtype="f32")
        ids = np.asarray(ids)
        return np.mean([len(set(a) & set(b)) / 10
                        for a, b in zip(ids.tolist(), truth.tolist())])

    r8, r32 = recall(8), recall(32)
    assert r32 > r8  # code expressiveness is the recall lever
    assert r32 > 0.6, (r8, r32)


# ------------------------------------------------------------------- index
@pytest.mark.slow
def test_pq_index_surface(rng):
    pts = clustered(rng)
    idx = PQIndex(64, m=16, compute_dtype="f32")
    idx.build(pts)
    assert idx.ntotal == len(pts) and idx.is_trained
    # memory check: 16 B/row codes vs 256 B/row fp32
    assert idx._codes.dtype == np.uint8 and idx._codes.shape[1] == 16
    # self-retrieval through the reconstruction
    _, ids = idx.search(pts[:8], 1)
    assert (np.asarray(ids)[:, 0] == np.arange(8)).mean() >= 0.9
    # streaming add after build reuses the codebooks
    more = clustered(rng, n_clusters=4, per=16)
    idx.add(more)
    assert idx.ntotal == len(pts) + 64
    # edge: k > ntotal, empty index
    empty = PQIndex(64, m=16)
    _, ids = empty.search(pts[:2], 3)
    assert (np.asarray(ids) == -1).all()
    small = PQIndex(16, m=4, compute_dtype="f32")
    small.add(rng.standard_normal((4, 16)).astype(np.float32))
    vals, ids = small.search(rng.standard_normal((2, 16)).astype(np.float32), 9)
    ids = np.asarray(ids)
    assert ids.shape == (2, 9) and (ids[:, 4:] == -1).all()


def test_pq_index_remove_and_filter(rng):
    pts = clustered(rng)
    idx = PQIndex(64, m=16, compute_dtype="f32")
    idx.build(pts)
    q = pts[:4]
    assert idx.remove_ids(np.arange(4)) == 4
    _, ids = idx.search(q, 3)
    assert not np.isin(np.asarray(ids), np.arange(4)).any()
    assert idx.nlive == len(pts) - 4
    mask = np.zeros(len(pts), bool)
    mask[100:200] = True
    _, ids = idx.search(q, 5, filter_mask=mask)
    ids = np.asarray(ids)
    assert ((ids >= 100) & (ids < 200) | (ids == -1)).all()
    with pytest.raises(ValueError):
        idx.search(q, 3, filter_mask=np.ones(3, bool))


def test_pq_persistence_round_trip(rng, tmp_path):
    from rag_faiss_embedding_tpu.index import VectorStore

    pts = clustered(rng, n_clusters=8, per=32)
    idx = PQIndex(64, m=16, compute_dtype="f32")
    idx.build(pts)
    idx.remove_ids(np.array([7]))
    store = VectorStore(dimension=64, index_path=tmp_path / "pq.idx",
                        index=idx)
    store.doc_ids = list(range(idx.ntotal))
    q = pts[:4]
    d1, i1 = store.search(q, k=5)
    store.save_index()
    loaded = VectorStore(dimension=64, index_path=tmp_path / "pq.idx")
    assert isinstance(loaded.index, PQIndex)
    assert loaded.index.compute_dtype == "f32"
    assert loaded.index.nlive == idx.nlive
    d2, i2 = loaded.search(q, k=5)
    assert i1 == i2  # codes reload bit-exact -> identical ADC ranking
    for a, b in zip(d1, d2):
        np.testing.assert_allclose(a, b, rtol=1e-6)


@pytest.mark.slow
def test_pq_through_config_and_manager(tmp_path):
    from .test_rag import DOCS, SMALL
    from rag_faiss_embedding_tpu.core import Config
    from rag_faiss_embedding_tpu.models import EmbeddingPipeline
    from rag_faiss_embedding_tpu.rag import RAGManager

    with pytest.raises(ValueError):
        Config(base_dir=tmp_path, index_kind="bogus")
    embedder = EmbeddingPipeline(model_name="offline-test", cfg=SMALL,
                                 max_seq_length=64)
    embedder.fit_tokenizer([d["content"] for d in DOCS], vocab_size=300)
    cfg = Config(base_dir=tmp_path, vector_dimension=32, index_kind="pq")
    m = RAGManager(config=cfg, embedder=embedder)
    assert isinstance(m.vector_store.index, PQIndex)
    m.initialize_database(DOCS)
    hits = m.search_similar_documents(DOCS[0]["content"], k=2)
    assert hits and hits[0]["id"] == 9  # self-retrieval survives PQ


# ------------------------------------------------------------------ IVF-PQ
@pytest.mark.slow
def test_ivfpq_full_probe_oracle_and_residual_gain(rng):
    """IVF-PQ at full probe: recall bounded by the codec, residual codes
    beat raw-vector PQ at equal M; the scan never returns wrong tiers."""
    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex

    pts = clustered(rng, n_clusters=32, per=128, spread=0.3)
    q = rng.standard_normal((16, 64)).astype(np.float32)
    d = ((q[:, None] - pts[None]) ** 2).sum(-1)
    truth = np.argsort(d, 1)[:, :10]

    ivfpq = IVFFlatIndex(64, nlist=16, nprobe=16, pq_m=16, pq_compute="f32")
    ivfpq.build(pts)
    assert ivfpq._sorted_vecs.dtype == np.uint8
    assert ivfpq._sorted_vecs.shape[1] == 16  # M bytes/slot
    _, ids = ivfpq.search(q, 10, nprobe=16)
    ids = np.asarray(ids)
    r_ivfpq = np.mean([len(set(a) & set(b)) / 10
                       for a, b in zip(ids.tolist(), truth.tolist())])

    flat = PQIndex(64, m=16, compute_dtype="f32")
    flat.build(pts)
    _, fids = flat.search(q, 10)
    r_flat = np.mean([len(set(a) & set(b)) / 10
                      for a, b in zip(np.asarray(fids).tolist(),
                                      truth.tolist())])
    # residual codes quantize a ~cell-diameter range instead of the full
    # data range -> strictly tighter at equal M
    assert r_ivfpq > r_flat, (r_ivfpq, r_flat)
    assert r_ivfpq > 0.5, r_ivfpq


@pytest.mark.slow
def test_ivfpq_streaming_remove_filter(rng):
    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex

    pts = clustered(rng, n_clusters=16, per=64, spread=0.3)
    idx = IVFFlatIndex(64, nlist=8, nprobe=8, pq_m=16, pq_compute="f32")
    idx.build(pts)
    # streaming adds land in the DENSE pending tier (exact within tier)
    extra = pts[:8] + 0.001
    idx.add(extra)
    _, ids = idx.search(extra, 1, nprobe=8)
    got = np.asarray(ids)[:, 0]
    assert ((got == np.arange(len(pts), len(pts) + 8)) | (got == np.arange(8))).all()
    # remove + filter compose through PQ storage
    idx.remove_ids(np.arange(4))
    _, ids = idx.search(pts[:4], 3, nprobe=8)
    assert not np.isin(np.asarray(ids), np.arange(4)).any()
    mask = np.zeros(idx.ntotal, bool)
    mask[512:] = True
    _, ids = idx.search(pts[600:604], 5, nprobe=8, filter_mask=mask)
    ids = np.asarray(ids)
    assert ((ids >= 512) | (ids == -1)).all()


def test_ivfpq_ip_metric(rng):
    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex

    pts = clustered(rng, n_clusters=16, per=64, spread=0.3)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    idx = IVFFlatIndex(64, nlist=8, nprobe=8, pq_m=16, pq_compute="f32",
                       metric="IP")
    idx.build(pts)
    _, ids = idx.search(q, 10, nprobe=8)
    truth = np.argsort(-(q @ pts.T), 1)[:, :10]
    r = np.mean([len(set(a) & set(b)) / 10
                 for a, b in zip(np.asarray(ids).tolist(), truth.tolist())])
    assert r > 0.35, r  # codec-bound; the scan itself is tier-exact


def test_ivfpq_persistence_round_trip(rng, tmp_path):
    from rag_faiss_embedding_tpu.index import VectorStore
    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex

    pts = clustered(rng, n_clusters=16, per=64, spread=0.3)
    q = rng.standard_normal((6, 64)).astype(np.float32)
    idx = IVFFlatIndex(64, nlist=8, nprobe=8, pq_m=16, pq_compute="f32")
    idx.build(pts)
    idx.add(pts[:8] + 0.001)
    idx.remove_ids(np.array([100]))
    store = VectorStore(dimension=64, index_path=tmp_path / "ivfpq.idx",
                        index=idx)
    store.doc_ids = list(range(idx.ntotal))
    d1, i1 = store.search(q, k=5)
    store.save_index()
    loaded = VectorStore(dimension=64, index_path=tmp_path / "ivfpq.idx")
    assert loaded.index.pq_m == 16
    assert loaded.index.dtype == np.uint8
    d2, i2 = loaded.search(q, k=5)
    assert i1 == i2  # codes + codebooks reload bit-exact
    for a, b in zip(d1, d2):
        np.testing.assert_allclose(a, b, rtol=1e-5)


def test_ivfpq_validations():
    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex
    from rag_faiss_embedding_tpu.core import Config

    with pytest.raises(ValueError):
        IVFFlatIndex(64, pq_m=16, dtype="int8")
    with pytest.raises(ValueError):
        IVFFlatIndex(65, pq_m=16)
    with pytest.raises(ValueError):
        IVFFlatIndex(64, pq_m=16, refine_dtype="fp4")
    with pytest.raises(ValueError):
        Config(base_dir="/tmp", vector_dimension=30, ivf_pq_m=16)
    # pq_m + rerank is the PQ refine tier (FAISS IndexRefine analog), a
    # feature since round 3 — it must construct with a deeper default pool
    idx = IVFFlatIndex(64, pq_m=16, rerank=True)
    assert idx.rerank and idx.rerank_depth == 64
    assert idx.refine_dtype == "int8"


def _refine_recall(idx, q, pts, k=10, nprobe=None):
    """recall@k of idx.search vs the float64 exact oracle on pts."""
    d = ((q.astype(np.float64)[:, None] - pts.astype(np.float64)[None])
         ** 2).sum(-1)
    truth = np.argsort(d, axis=1, kind="stable")[:, :k]
    _, pred = idx.search(q, k, nprobe=nprobe)
    pred = np.asarray(pred)
    hits = sum(len(set(p.tolist()) & set(t.tolist()))
               for p, t in zip(pred, truth))
    return hits / truth.size


@pytest.mark.parametrize("refine_dtype,floor", [
    # floors from the numeric analysis of the self-consistent-norm rerank
    # (|x̂|² scoring): the ranking error is 2·(q−x)·(x−x̂), so it scales
    # with the shadow dtype's quantization step. This data is ADVERSARIAL —
    # near-tied same-cluster neighbors with gaps below int8 resolution.
    ("int8", 0.90), ("bfloat16", 0.95), ("float32", 0.99),
])
@pytest.mark.slow
def test_ivfpq_refine_beats_pure_adc(rng, refine_dtype, floor):
    """The refine shadow re-scores the ADC candidates at shadow precision,
    so recall@10 vs the TRUE (unquantized) oracle must beat the codec-bound
    pure-ADC ranking on near-tied clustered neighbors. Guards the
    self-consistent-norm scoring: with mixed exact-norm scoring this
    measured 0.60 flat across all dtypes and depths."""
    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex

    pts = clustered(rng, n_clusters=16, per=96, spread=0.25)
    q = (pts[rng.choice(len(pts), 32, replace=False)]
         + 0.05 * rng.standard_normal((32, 64)).astype(np.float32))

    pure = IVFFlatIndex(64, nlist=8, nprobe=8, pq_m=16, pq_compute="f32")
    pure.build(pts)
    refined = IVFFlatIndex(64, nlist=8, nprobe=8, pq_m=16, pq_compute="f32",
                           rerank=True, rerank_depth=256,
                           refine_dtype=refine_dtype)
    refined.build(pts)

    r_pure = _refine_recall(pure, q, pts, nprobe=8)
    r_ref = _refine_recall(refined, q, pts, nprobe=8)
    assert r_ref >= r_pure, (r_ref, r_pure)
    assert r_ref >= floor, (refine_dtype, r_ref)


@pytest.mark.slow
def test_ivfpq_opq_search(rng):
    """pq_opq=True in IVFFlatIndex: rotation is orthogonal, applied to the
    residual codec only (coarse stage unrotated), and search stays sane."""
    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex

    pts = clustered(rng, n_clusters=16, per=96, spread=0.25)
    q = pts[rng.choice(len(pts), 32, replace=False)]
    idx = IVFFlatIndex(64, nlist=8, nprobe=8, pq_m=16, pq_compute="f32",
                       pq_opq=True)
    idx.build(pts)
    rot = np.asarray(idx.pq_rot)
    np.testing.assert_allclose(rot @ rot.T, np.eye(64), atol=1e-4)
    # exact self-queries: recall@1 must be high even through the codec
    _, pred = idx.search(q, 1, nprobe=8)
    d = ((q.astype(np.float64)[:, None] - pts.astype(np.float64)[None])
         ** 2).sum(-1)
    truth = np.argsort(d, axis=1, kind="stable")[:, 0]
    assert (np.asarray(pred)[:, 0] == truth).mean() >= 0.9


@pytest.mark.slow
def test_ivfpq_refine_opq_persistence_round_trip(rng, tmp_path):
    """shadow / shadow_scales / shadow_sq / pq_rot / rerank_depth /
    refine_dtype all survive save->load bit-exactly (padded_v3 codec)."""
    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex
    from rag_faiss_embedding_tpu.index.vector_store import VectorStore

    pts = clustered(rng, n_clusters=16, per=96, spread=0.25)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    idx = IVFFlatIndex(64, nlist=8, nprobe=8, pq_m=16, pq_compute="f32",
                       pq_opq=True, rerank=True, rerank_depth=48)
    idx.build(pts)
    v1, i1 = idx.search(q, k=5)
    store = VectorStore(dimension=64, index_path=tmp_path / "refine.idx",
                        index=idx)
    store.doc_ids = list(range(idx.ntotal))
    store.save_index()

    loaded = VectorStore(dimension=64,
                         index_path=tmp_path / "refine.idx").index
    assert loaded.rerank and loaded.rerank_depth == 48
    assert loaded.refine_dtype == "int8"
    assert loaded.pq_opq and loaded.pq_rot is not None
    np.testing.assert_array_equal(np.asarray(idx.pq_rot),
                                  np.asarray(loaded.pq_rot))
    np.testing.assert_array_equal(np.asarray(idx._sorted_shadow),
                                  np.asarray(loaded._sorted_shadow))
    np.testing.assert_array_equal(np.asarray(idx._sorted_shadow_scales),
                                  np.asarray(loaded._sorted_shadow_scales))
    np.testing.assert_array_equal(np.asarray(idx._sorted_shadow_sq),
                                  np.asarray(loaded._sorted_shadow_sq))
    v2, i2 = loaded.search(q, k=5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5)


def test_ivfpq_refine_edge_cases(rng):
    """Refine composed with filter_mask, remove_ids, and k > rerank_depth."""
    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex

    pts = clustered(rng, n_clusters=16, per=96, spread=0.25)
    q = pts[rng.choice(len(pts), 16, replace=False)]
    idx = IVFFlatIndex(64, nlist=8, nprobe=8, pq_m=16, pq_compute="f32",
                       rerank=True, rerank_depth=16)
    idx.build(pts)

    # k > rerank_depth: still returns k valid rows (pool widens to k)
    vals, ids = idx.search(q[:4], 32, nprobe=8)
    ids = np.asarray(ids)
    assert ids.shape == (4, 32) and (ids >= 0).all()
    assert np.isfinite(np.asarray(vals)).all()

    # remove_ids: tombstoned rows never reappear through the refine stage
    d = ((q.astype(np.float64)[:, None] - pts.astype(np.float64)[None])
         ** 2).sum(-1)
    nearest = np.argsort(d, axis=1, kind="stable")[:, 0]
    idx.remove_ids(np.unique(nearest))
    _, pred = idx.search(q, 5, nprobe=8)
    assert not (np.isin(np.asarray(pred), nearest)).any()

    # filter_mask: only allowed ids survive, distances exact over the set
    mask = np.zeros(idx.ntotal, bool)
    allowed = np.arange(0, idx.ntotal, 3)
    mask[allowed] = True
    mask[np.unique(nearest)] = False  # deleted rows are gone anyway
    _, pred = idx.search(q, 5, nprobe=8, filter_mask=mask)
    pred = np.asarray(pred)
    assert np.isin(pred[pred >= 0], np.flatnonzero(mask)).all()


@pytest.mark.slow
def test_ivfpq_build_chunked_matches_dense_build(rng):
    """With training pinned (centroids + codebooks from a dense build), the
    out-of-HBM chunked build must produce the IDENTICAL index: same window,
    same codes, same search results."""
    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex

    pts = clustered(rng, n_clusters=16, per=64, spread=0.3)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    dense = IVFFlatIndex(64, nlist=8, nprobe=8, pq_m=16, pq_compute="f32")
    dense.build(pts)
    v1, i1 = dense.search(q, 10, nprobe=8)

    chunked = IVFFlatIndex(64, nlist=8, nprobe=8, pq_m=16, pq_compute="f32")
    chunked.centroids = dense.centroids          # pin training
    chunked.is_trained = True
    chunked.pq_codebooks = dense.pq_codebooks
    chunked.build_chunked(
        lambda start, size: pts[start : start + size],
        n=len(pts), chunk_size=300,              # uneven chunking on purpose
    )
    assert chunked._window == dense._window
    assert chunked._n_spill == dense._n_spill
    np.testing.assert_array_equal(
        np.asarray(chunked._sorted_ids), np.asarray(dense._sorted_ids)
    )
    v2, i2 = chunked.search(q, 10, nprobe=8)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-5, atol=1e-5)
    # self-training path also works end to end
    auto = IVFFlatIndex(64, nlist=8, nprobe=8, pq_m=16, pq_compute="f32")
    auto.build_chunked(lambda s, z: pts[s : s + z], n=len(pts),
                       chunk_size=512)
    _, ids = auto.search(pts[:8], 1, nprobe=8)
    assert (np.asarray(ids)[:, 0] == np.arange(8)).mean() >= 0.75


@pytest.mark.slow
def test_int8_build_chunked_matches_dense_build(rng):
    """Chunked build with SQ8 storage (the 10M-scale int8 config): pinned
    training -> identical index to the dense build."""
    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex

    pts = clustered(rng, n_clusters=16, per=64, spread=0.3)
    q = rng.standard_normal((8, 64)).astype(np.float32)
    dense = IVFFlatIndex(64, nlist=8, nprobe=8, dtype="int8", rerank=False)
    dense.build(pts)
    v1, i1 = dense.search(q, 10, nprobe=8)
    chunked = IVFFlatIndex(64, nlist=8, nprobe=8, dtype="int8", rerank=False)
    chunked.centroids = dense.centroids
    chunked.is_trained = True
    chunked.build_chunked(lambda s, z: pts[s : s + z], n=len(pts),
                          chunk_size=300)
    assert chunked._window == dense._window
    np.testing.assert_array_equal(
        np.asarray(chunked._sorted_ids), np.asarray(dense._sorted_ids)
    )
    np.testing.assert_array_equal(
        np.asarray(chunked._sorted_scales), np.asarray(dense._sorted_scales)
    )
    v2, i2 = chunked.search(q, 10, nprobe=8)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-5, atol=1e-5)
    # int8 + rerank shadow is refused (footprint) — dense bf16 is allowed
    with pytest.raises(ValueError):
        IVFFlatIndex(64, nlist=8, dtype="int8").build_chunked(
            lambda s, z: pts[s : s + z], n=len(pts))
    bf = IVFFlatIndex(64, nlist=8, nprobe=8, dtype="bfloat16")
    bf.centroids = dense.centroids
    bf.is_trained = True
    bf.build_chunked(lambda s, z: pts[s : s + z], n=len(pts), chunk_size=300)
    _, ids = bf.search(pts[:4], 1, nprobe=8)
    assert (np.asarray(ids)[:, 0] == np.arange(4)).all()


@pytest.mark.slow
def test_pallas_decode_matches_xla(rng):
    """The one-hot MXU decode kernel (interpret mode off-TPU) is bit-exact
    with the XLA gather decode, standalone and through both index kinds."""
    import jax.numpy as jnp

    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex
    from rag_faiss_embedding_tpu.ops import pallas_pq

    pts = clustered(rng, n_clusters=16, per=64, d=128, spread=0.3)
    cb = train_pq(pts, m=16, n_iters=10, seed=0)   # dsub=8 -> g=16 eligible
    codes, _ = pq_encode(cb, pts)
    assert pallas_pq.decode_eligible("cpu", 16, 256, 8, len(pts),
                                     interpret=True)
    dec_p = pallas_pq.decode(cb, codes, interpret=True)
    dec_x = np.asarray(pq_decode(cb, codes)).astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(dec_p.view(jnp.uint16)), np.asarray(dec_x.view(jnp.uint16))
    )

    q = rng.standard_normal((8, 128)).astype(np.float32)
    # flat PQ: backend="pallas" (interpret) == backend="xla"
    a = PQIndex(128, m=16, backend="pallas")
    a.build(pts)
    b = PQIndex(128, m=16, backend="xla")
    b.codebooks, b.is_trained = a.codebooks, True
    b.add(pts)
    va, ia = a.search(q, 10, chunk_size=512)
    vb, ib = b.search(q, 10, chunk_size=512)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-6)

    # IVF-PQ: backend="pallas" routes the chunk stage to XLA but keeps the
    # Pallas decode; results match the pure-XLA path
    ivf_a = IVFFlatIndex(128, nlist=8, nprobe=8, pq_m=16, backend="pallas")
    ivf_a.build(pts)
    ivf_b = IVFFlatIndex(128, nlist=8, nprobe=8, pq_m=16, backend="xla")
    ivf_b.centroids, ivf_b.is_trained = ivf_a.centroids, True
    ivf_b.pq_codebooks = ivf_a.pq_codebooks
    ivf_b.build(pts)
    va, ia = ivf_a.search(q, 10, nprobe=8)
    vb, ib = ivf_b.search(q, 10, nprobe=8)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))
    np.testing.assert_allclose(np.asarray(va), np.asarray(vb),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_opq_improves_recall_on_correlated_data(rng):
    """OPQ's learned rotation (FAISS OPQMatrix analog) must beat plain PQ
    when subspaces are correlated, and persist through save/load."""
    latent = rng.standard_normal((4096, 16)).astype(np.float32)
    mix = rng.standard_normal((16, 64)).astype(np.float32)
    pts = (latent @ mix
           + 0.1 * rng.standard_normal((4096, 64))).astype(np.float32)
    q = pts[:16] + 0.05 * rng.standard_normal((16, 64)).astype(np.float32)
    d = ((q[:, None] - pts[None]) ** 2).sum(-1)
    truth = np.argsort(d, 1)[:, :10]

    def recall(idx):
        _, ids = idx.search(q, 10, chunk_size=4096)
        ids = np.asarray(ids)
        return np.mean([len(set(a) & set(b)) / 10
                        for a, b in zip(ids.tolist(), truth.tolist())])

    pq = PQIndex(64, m=16, compute_dtype="f32")
    pq.build(pts)
    opq = PQIndex(64, m=16, compute_dtype="f32", opq=True)
    opq.build(pts)
    assert opq.rotation is not None
    # rotation is orthogonal
    r = np.asarray(opq.rotation)
    np.testing.assert_allclose(r @ r.T, np.eye(64), atol=1e-4)
    r_pq, r_opq = recall(pq), recall(opq)
    assert r_opq > r_pq + 0.03, (r_pq, r_opq)
    # vectors() un-rotates back to the original basis
    rec = opq.vectors()
    rel = (np.sum((rec - pts) ** 2, -1).mean()
           / np.sum(pts ** 2, -1).mean())
    assert rel < 0.05, rel
    # persistence round trip keeps the rotation
    state = {k: np.asarray(v) for k, v in opq.state_dict().items()}
    loaded = PQIndex.from_state_dict(state)
    assert loaded.rotation is not None
    _, i1 = opq.search(q, 5, chunk_size=4096)
    _, i2 = loaded.search(q, 5, chunk_size=4096)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


@pytest.mark.slow
def test_sharded_ivfpq_parity(rng):
    """Sharded IVF-PQ (multi-chip memory tier): full probe matches the
    single-chip IVF-PQ bit-for-bit under pinned training; persistence
    round-trips; remove_ids and filters work through PQ storage."""
    import jax.numpy as jnp

    from rag_faiss_embedding_tpu.core.mesh import make_mesh
    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex
    from rag_faiss_embedding_tpu.parallel.sharded_ivf import ShardedIVFIndex

    mesh = make_mesh({"db": 4})
    pts = clustered(rng, n_clusters=16, per=64, spread=0.3)
    q = rng.standard_normal((8, 64)).astype(np.float32)

    single = IVFFlatIndex(64, nlist=8, nprobe=8, pq_m=16, pq_compute="f32")
    single.build(pts)
    sharded = ShardedIVFIndex(64, mesh, nlist=8, nprobe=8, pq_m=16,
                              pq_compute="f32")
    sharded.centroids = single.centroids            # pin training
    sharded.pq_codebooks = single.pq_codebooks
    sharded.build(pts)
    assert sharded._vecs.dtype == np.uint8
    v1, i1 = single.search(q, 10, nprobe=8)
    v2, i2 = sharded.search(q, 10, nprobe=8)
    # same codebooks + same centroids -> identical candidate scores; rank
    # ties may swap between merge orders, so compare sets + values
    np.testing.assert_allclose(np.sort(np.asarray(v1), 1),
                               np.sort(np.asarray(v2), 1),
                               rtol=1e-4, atol=1e-4)
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(np.asarray(i1), np.asarray(i2))
    ])
    assert overlap >= 0.9, overlap

    # remove + filter
    sharded.remove_ids(np.arange(4))
    _, ids = sharded.search(pts[:4], 3, nprobe=8)
    assert not np.isin(np.asarray(ids), np.arange(4)).any()
    mask = np.zeros(sharded.ntotal, bool)
    mask[512:] = True
    _, ids = sharded.search(q, 5, nprobe=8, filter_mask=mask)
    ids = np.asarray(ids)
    assert ((ids >= 512) | (ids == -1)).all()

    # persistence: codes + codebooks reload bit-exact
    state = {k: np.asarray(v) for k, v in sharded.state_dict().items()}
    loaded = ShardedIVFIndex.from_state_dict(state, mesh=mesh)
    assert loaded.pq_m == 16
    d1, j1 = sharded.search(q, 5, nprobe=8, filter_mask=mask)
    d2, j2 = loaded.search(q, 5, nprobe=8, filter_mask=mask)
    np.testing.assert_array_equal(np.asarray(j1), np.asarray(j2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=1e-5, atol=1e-5)

    # vectors() reconstructs in the original basis (rebuild path)
    vecs, ids = loaded.vectors(return_ids=True)
    assert len(vecs) == loaded.nlive
    rel = (np.sum((vecs[np.argsort(ids)][10] - pts[np.sort(ids)[10]]) ** 2)
           / np.sum(pts[np.sort(ids)[10]] ** 2))
    assert rel < 0.2, rel


def test_ivfpq_union_segmentation_matches_unsegmented(rng, monkeypatch):
    """Forcing useg > 1 (tiny step budget) must reproduce the single-pass
    union scan: same ids, same distances — segmentation is a memory
    strategy, never a result change. Guards the nprobe>=32 cliff fix
    (SCALE_r03 collapsed qc to 8 instead of segmenting the union)."""
    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex
    from rag_faiss_embedding_tpu.ops import ivf_scan

    pts = clustered(rng, n_clusters=16, per=96, spread=0.25)
    q = pts[rng.choice(len(pts), 32, replace=False)] \
        + 0.05 * rng.standard_normal((32, 64)).astype(np.float32)

    idx = IVFFlatIndex(64, nlist=8, nprobe=8, pq_m=16, pq_compute="f32")
    idx.build(pts)
    v1, i1 = idx.search(q, 10, nprobe=8)
    # force the segmented path: budget below one list's worth of bytes
    # (useg is computed OUTSIDE the jit, so the patched budget
    # re-specializes the trace — useg is a static argname)
    monkeypatch.setattr(ivf_scan, "_STEP_BYTES_BUDGET", 1 << 20)
    v2, i2 = idx.search(q, 10, nprobe=8)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-5, atol=1e-5)

    # and with the refine shadow + a filter riding on top
    idx2 = IVFFlatIndex(64, nlist=8, nprobe=8, pq_m=16, pq_compute="f32",
                        rerank=True, rerank_depth=32)
    idx2.build(pts)
    mask = np.zeros(idx2.ntotal, bool)
    mask[::2] = True
    v3, i3 = idx2.search(q, 5, nprobe=8, filter_mask=mask)
    i3 = np.asarray(i3)
    assert np.isin(i3[i3 >= 0], np.flatnonzero(mask)).all()


def test_ivfpq_refine_shadow_is_compact(rng):
    """The D-wide refine shadow must NOT pay the block-padding overhead:
    (nlist+1)*window slots x D is slots/rows x its dense size — 17.7 GB
    instead of 7.7 GB at 10M x 384 / window 1408, the exact OOM the first
    r05 10M run died on. Rows stay (n, D) with an int32 slot->row map
    through build(), build_chunked(), and reload (ivf.py _shadow_pos)."""
    import jax.numpy as jnp

    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex

    pts = clustered(rng, n_clusters=16, per=96, spread=0.25)
    n, d = pts.shape
    idx = IVFFlatIndex(d, nlist=8, nprobe=8, pq_m=16, pq_compute="f32",
                       rerank=True, rerank_depth=32,
                       refine_dtype="bfloat16")
    idx.build(pts)
    n_slots = (idx.nlist + 1) * idx._window
    assert idx._sorted_shadow.shape == (n, d)          # compact, not slots
    assert idx._shadow_pos.shape == (n_slots,)
    # map semantics: every live slot's shadow row IS that slot's vector
    ids = np.asarray(idx._sorted_ids)
    pos = np.asarray(idx._shadow_pos)
    live = np.flatnonzero(ids >= 0)[:64]
    sh = np.asarray(idx._sorted_shadow.astype(jnp.float32))
    np.testing.assert_allclose(sh[pos[live]], pts[ids[live]],
                               rtol=0.01, atol=0.01)   # bf16 cast
    # dead slots carry the -1 sentinel
    assert (pos[ids < 0] == -1).all()

    # chunked (out-of-HBM) build: corpus-ordered compact shadow; the map
    # aliases the ids array (ids are corpus positions) at zero extra HBM
    idx2 = IVFFlatIndex(d, nlist=8, nprobe=8, pq_m=16, pq_compute="f32",
                        rerank=True, rerank_depth=32,
                        refine_dtype="bfloat16", balance="spill")
    idx2.build_chunked(lambda s, z: pts[s:s + z], n=n, chunk_size=512)
    assert idx2._sorted_shadow.shape == (n, d)
    assert idx2._shadow_pos is idx2._sorted_ids

    # reload installs compact + map (disk format unchanged: block order)
    loaded = IVFFlatIndex.from_state_dict(idx.state_dict())
    assert loaded._sorted_shadow.shape == (loaded._n_built, d)
    assert loaded._shadow_pos is not None


def test_build_chunked_balanced_window_compression(rng):
    """balance='reassign' in the chunked build bounds every list at
    cap_factor x mean (the 100M enabler: quantile padding needed ~2.7x
    slots/rows and OOM'd the padded arrays), with overflow rows placed in
    their next-nearest open list instead of spilling."""
    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex

    # zipf-skewed mixture: quantile windows blow up, balanced ones don't
    w = 1.0 / np.arange(1, 33) ** 0.8
    w /= w.sum()
    centers = rng.standard_normal((32, 64)).astype(np.float32)
    n = 8192
    rows = (centers[rng.choice(32, n, p=w)]
            + 0.2 * rng.standard_normal((n, 64)).astype(np.float32))

    built = {}
    for bal in ("spill", "reassign"):
        idx = IVFFlatIndex(64, nlist=32, nprobe=32, train_iters=4,
                           pq_m=8, pq_compute="f32", balance=bal,
                           rerank=True, rerank_depth=64,
                           refine_dtype="bfloat16")
        if bal == "reassign":
            idx.cap_factor = 1.5
        idx.build_chunked(lambda s, z: rows[s:s + z], n=n, chunk_size=2048)
        built[bal] = idx
        assert idx.ntotal == n  # placed + pending covers every row

    # the balanced window is strictly tighter on skewed data
    assert built["reassign"]._window < built["spill"]._window
    # full-probe search still finds everything it should: compare to the
    # exact oracle at nprobe=nlist (every list probed -> relocation
    # cannot hide a row)
    q = rows[:16] + 0.05 * rng.standard_normal((16, 64)).astype(np.float32)
    d = ((q[:, None, :].astype(np.float64)
          - rows[None, :, :].astype(np.float64)) ** 2).sum(-1)
    truth = np.argsort(d, axis=1, kind="stable")[:, :10]
    _, pred = built["reassign"].search(q, 10, nprobe=32)
    pred = np.asarray(pred)
    hits = sum(len(set(p.tolist()) & set(t.tolist()))
               for p, t in zip(pred, truth))
    assert hits / truth.size > 0.7  # codec-bound floor, full coverage
