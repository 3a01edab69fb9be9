"""Filtered search (FAISS ``IDSelector`` analog) across the whole stack.

No reference analog — the reference has no filtering at all; this is
vector-DB table stakes (docs/STATUS.md round-4 breadth item). Semantics:
``filter_mask`` (True = searchable) masks rows BEFORE selection, distances
stay exact over the allowed set, filtered rows are never returned. At the
product layer a metadata predicate (``Database.select_ids``) resolves to a
doc-id allowlist applied inside the scan (pre-filtering).
"""

import numpy as np
import pytest

from rag_faiss_embedding_tpu.core.mesh import make_mesh
from rag_faiss_embedding_tpu.index import FlatIndex
from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex
from rag_faiss_embedding_tpu.parallel.sharded import ShardedFlatIndex
from rag_faiss_embedding_tpu.parallel.sharded_ivf import ShardedIVFIndex
from rag_faiss_embedding_tpu.store import Database

from .test_distance import assert_rank_match, numpy_exact
from .test_ivf import clustered_data


def oracle_masked(q, db, mask, k, metric):
    """Float64 exact top-k over mask-allowed rows, ORIGINAL positions."""
    live = np.nonzero(mask)[0]
    vals, ids = numpy_exact(q, db[live], k, metric)
    return vals, live[ids]


# ------------------------------------------------------------------- flat
@pytest.mark.parametrize("metric", ["L2", "IP"])
def test_flat_filtered_oracle(rng, metric):
    db = rng.standard_normal((300, 32)).astype(np.float32)
    q = rng.standard_normal((5, 32)).astype(np.float32)
    mask = rng.random(300) > 0.5
    idx = FlatIndex(32, metric=metric, use_pallas=False)
    idx.add(db)
    vals, ids = idx.search(q, 7, filter_mask=mask)
    ref_vals, ref_ids = oracle_masked(q, db, mask, 7, metric)
    assert_rank_match(vals, ids, ref_vals, ref_ids)
    assert mask[np.asarray(ids)].all()  # only allowed rows returned
    # a second unfiltered search is unaffected (the mask is per-call)
    v2, i2 = idx.search(q, 7)
    rv2, ri2 = numpy_exact(q, db, 7, metric)
    assert_rank_match(v2, i2, rv2, ri2)


def test_flat_filter_composes_with_tombstones(rng):
    db = rng.standard_normal((100, 16)).astype(np.float32)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    idx = FlatIndex(16, use_pallas=False)
    idx.add(db)
    idx.remove_ids(np.arange(0, 100, 4))        # every 4th row tombstoned
    mask = np.zeros(100, bool)
    mask[::2] = True                            # filter allows even rows
    vals, ids = idx.search(q, 5, filter_mask=mask)
    both = mask.copy()
    both[::4] = False                           # allowed AND not removed
    ref_vals, ref_ids = oracle_masked(q, db, both, 5, "L2")
    assert_rank_match(vals, ids, ref_vals, ref_ids)


def test_flat_filter_edge_cases(rng):
    idx = FlatIndex(8, use_pallas=False)
    idx.add(rng.standard_normal((10, 8)).astype(np.float32))
    q = rng.standard_normal((2, 8)).astype(np.float32)
    # nothing allowed -> all -1
    _, ids = idx.search(q, 3, filter_mask=np.zeros(10, bool))
    assert (np.asarray(ids) == -1).all()
    # k > allowed count pads with -1
    mask = np.zeros(10, bool)
    mask[[2, 7]] = True
    _, ids = idx.search(q, 5, filter_mask=mask)
    ids = np.asarray(ids)
    assert set(ids[0]) <= {2, 7, -1}
    assert (ids != -1).sum(axis=1).tolist() == [2, 2]
    # wrong length raises
    with pytest.raises(ValueError):
        idx.search(q, 3, filter_mask=np.ones(5, bool))


def test_int8_rerank_filtered(rng):
    """Stage-2 exact re-score must not resurrect filtered candidates."""
    db = rng.standard_normal((600, 32)).astype(np.float32)
    q = db[:4] + 0.001
    idx = FlatIndex(32, dtype="int8", selector="rerank")
    idx.add(db)
    mask = np.ones(600, bool)
    mask[:4] = False  # forbid each query's true top hit
    _, ids = idx.search(q, 3, chunk_size=256, filter_mask=mask)
    assert not np.isin(np.asarray(ids), np.arange(4)).any()


# -------------------------------------------------------------------- IVF
def test_ivf_filtered_full_probe_exact(rng):
    """Full probe + filter = exact over the allowed set, across built AND
    pending tiers; forcing backend='pallas' falls back to XLA."""
    pts, _ = clustered_data(rng, n_clusters=8, per_cluster=32)
    idx = IVFFlatIndex(16, nlist=8, nprobe=8)
    idx.build(pts[:200])
    idx.add(pts[200:220])
    mask = rng.random(220) > 0.4
    q = rng.standard_normal((6, 16)).astype(np.float32)
    vals, ids = idx.search(q, 7, nprobe=8, filter_mask=mask)
    ref_vals, ref_ids = oracle_masked(q, pts[:220], mask, 7, "L2")
    assert_rank_match(vals, ids, ref_vals, ref_ids, tol=1e-3)
    # composes with remove_ids
    idx.remove_ids(np.nonzero(mask)[0][:10])
    both = mask.copy()
    both[np.nonzero(mask)[0][:10]] = False
    vals, ids = idx.search(q, 7, nprobe=8, filter_mask=mask)
    ref_vals, ref_ids = oracle_masked(q, pts[:220], both, 7, "L2")
    assert_rank_match(vals, ids, ref_vals, ref_ids, tol=1e-3)
    with pytest.raises(ValueError):
        idx.search(q, 3, filter_mask=np.ones(7, bool))


def test_ivf_windowed_filtered_matches_fused(rng):
    pts, _ = clustered_data(rng, n_clusters=8, per_cluster=32)
    idx = IVFFlatIndex(16, nlist=8, nprobe=8)
    idx.build(pts)
    mask = rng.random(256) > 0.5
    q = rng.standard_normal((4, 16)).astype(np.float32)
    v1, i1 = idx.search(q, 5, nprobe=8, filter_mask=mask)
    idx.use_fused = False
    v2, i2 = idx.search(q, 5, nprobe=8, filter_mask=mask)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                               rtol=1e-4, atol=1e-4)


# ----------------------------------------------------------------- sharded
def test_sharded_flat_filtered(rng):
    mesh = make_mesh({"db": 4})
    db = rng.standard_normal((256, 16)).astype(np.float32)
    q = rng.standard_normal((4, 16)).astype(np.float32)
    mask = rng.random(256) > 0.5
    idx = ShardedFlatIndex(16, mesh)
    idx.add(db)
    vals, ids = idx.search(q, 7, filter_mask=mask)
    ref_vals, ref_ids = oracle_masked(q, db, mask, 7, "L2")
    assert_rank_match(vals, ids, ref_vals, ref_ids, tol=1e-3)
    # composes with remove_ids
    idx.remove_ids(np.nonzero(mask)[0][:20])
    both = mask.copy()
    both[np.nonzero(mask)[0][:20]] = False
    vals, ids = idx.search(q, 7, filter_mask=mask)
    ref_vals, ref_ids = oracle_masked(q, db, both, 7, "L2")
    assert_rank_match(vals, ids, ref_vals, ref_ids, tol=1e-3)


def test_sharded_ivf_filtered_all_tiers(rng):
    """Filter applies in block lists, per-device spill AND stream tier."""
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
    idx.centroids = jnp.asarray(centers)
    idx.build(pts)
    assert idx._spill is not None
    extra = (centers[1] + 0.05
             * rng.standard_normal((10, 16))).astype(np.float32)
    idx.add(extra)
    all_pts = np.concatenate([pts, extra])
    mask = rng.random(len(all_pts)) > 0.5
    q = rng.standard_normal((5, 16)).astype(np.float32)
    vals, ids = idx.search(q, 7, nprobe=8, filter_mask=mask)
    ref_vals, ref_ids = oracle_masked(q, all_pts, mask, 7, "L2")
    assert_rank_match(vals, ids, ref_vals, ref_ids, tol=1e-3)


# ------------------------------------------------------------ store layers
def test_select_ids_predicates(tmp_path):
    db = Database(tmp_path / "d.db")
    ids = db.insert_documents([
        {"url": "https://docs.x/a", "title": "Alpha guide", "content": "aa"},
        {"url": "https://docs.x/b", "title": "Beta", "content": "bb 50%"},
        {"url": "https://blog.x/c", "title": "Gamma guide", "content": "cc"},
    ])
    assert db.select_ids({"url_prefix": "https://docs.x/"}) == ids[:2]
    assert db.select_ids({"title_contains": "guide"}) == [ids[0], ids[2]]
    assert db.select_ids(
        {"url_prefix": "https://docs.x/", "title_contains": "guide"}
    ) == [ids[0]]
    assert db.select_ids({"ids": [ids[2], 999]}) == [ids[2]]
    assert db.select_ids({"ids": []}) == []
    assert db.select_ids({}) == ids
    # LIKE wildcards in user input are escaped, not interpreted
    assert db.select_ids({"content_contains": "50%"}) == [ids[1]]
    assert db.select_ids({"content_contains": "5_%"}) == []
    with pytest.raises(ValueError):
        db.select_ids({"nope": 1})


def test_vector_store_allowed_doc_ids(rng, tmp_path):
    from rag_faiss_embedding_tpu.index import VectorStore

    store = VectorStore(dimension=16, index_path=tmp_path / "f.idx")
    store.index._use_pallas = False
    vecs = rng.standard_normal((6, 16)).astype(np.float32)
    store.add_vectors(vecs, [9, 4, 1, 16, 12, 7])
    dists, ids = store.search(vecs[0], k=3, allowed_doc_ids=[4, 12, 7])
    assert ids[0] != 9 and set(ids) <= {4, 12, 7}
    # unfiltered still self-retrieves
    _, ids = store.search(vecs[0], k=1)
    assert ids[0] == 9


def test_engine_and_manager_where(tmp_path):
    from .test_rag import DOCS, SMALL
    from rag_faiss_embedding_tpu.core import Config
    from rag_faiss_embedding_tpu.models import EmbeddingPipeline
    from rag_faiss_embedding_tpu.rag import RAGManager

    embedder = EmbeddingPipeline(model_name="offline-test", cfg=SMALL,
                                 max_seq_length=64)
    embedder.fit_tokenizer([d["content"] for d in DOCS], vocab_size=300)
    cfg = Config(base_dir=tmp_path, vector_dimension=32)
    m = RAGManager(config=cfg, embedder=embedder)
    m.vector_store.index._use_pallas = False
    m.initialize_database(DOCS)
    # unfiltered: doc 9 self-retrieves; filtered to the db doc: only id 1
    hits = m.search_similar_documents(DOCS[0]["content"], k=2)
    assert hits[0]["id"] == 9
    hits = m.search_similar_documents(
        DOCS[0]["content"], k=2, where={"url_prefix": "https://ex/db"}
    )
    assert [h["id"] for h in hits] == [1]
    # empty predicate result -> no hits
    assert m.search_similar_documents(
        "anything", k=2, where={"url_prefix": "https://nowhere/"}
    ) == []


def test_api_search_filter(tmp_path_factory):
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from .test_rag import DOCS, SMALL
    from rag_faiss_embedding_tpu.core import Config
    from rag_faiss_embedding_tpu.models import EmbeddingPipeline
    from rag_faiss_embedding_tpu.models.generator import AnswerGenerator
    from rag_faiss_embedding_tpu.rag import QueryEngine, RAGManager
    from rag_faiss_embedding_tpu.serve.api import make_app

    tmp = tmp_path_factory.mktemp("serve_filter")
    embedder = EmbeddingPipeline(model_name="offline-test", cfg=SMALL,
                                 max_seq_length=64)
    embedder.fit_tokenizer([d["content"] for d in DOCS], vocab_size=300)
    cfg = Config(base_dir=tmp, vector_dimension=32,
                 serve_watchdog_interval_s=0)
    manager = RAGManager(config=cfg, embedder=embedder)
    manager.vector_store.index._use_pallas = False
    manager.initialize_database(DOCS)
    eng = QueryEngine(manager.db, manager.vector_store, manager.embedder,
                      generator=AnswerGenerator(backend="extractive"))

    async def run():
        app = make_app(eng, cfg, manager=manager)
        client = TestClient(TestServer(app))
        await client.start_server()
        try:
            r1 = await client.post("/search", json={
                "text": DOCS[0]["content"], "top_k": 2, "generate": False,
                "filter": {"url_prefix": "https://ex/db"}})
            hits = [d["id"] for d in (await r1.json())["similar_documents"]]
            r2 = await client.post("/search", json={
                "text": "x", "top_k": 1, "filter": {"bogus_key": 1}})
            r3 = await client.post("/search", json={
                "text": "x", "top_k": 1, "filter": "not-a-dict"})
            return hits, r2.status, r3.status
        finally:
            await client.close()

    hits, bad1, bad2 = asyncio.run(run())
    assert hits == [1]
    assert bad1 == 422 and bad2 == 422
