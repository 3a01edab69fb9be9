"""Multi-device sharding tests on the 8-virtual-CPU mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rag_faiss_embedding_tpu.core.mesh import make_mesh
from rag_faiss_embedding_tpu.models.minilm import MiniLMConfig
from rag_faiss_embedding_tpu.parallel import (
    ShardedFlatIndex,
    make_train_step,
    sharded_exact_search,
)
from rag_faiss_embedding_tpu.parallel.train import shard_params

from .test_distance import assert_rank_match, numpy_exact


def test_mesh_construction():
    mesh = make_mesh({"db": 8})
    assert mesh.shape == {"db": 8}
    mesh2 = make_mesh({"data": 2, "db": -1})
    assert mesh2.shape == {"data": 2, "db": 4}
    with pytest.raises(ValueError):
        make_mesh({"db": 16})


@pytest.mark.parametrize("metric", ["L2", "IP"])
def test_sharded_search_matches_oracle(rng, metric):
    mesh = make_mesh({"db": 8})
    n, d, k = 1024, 32, 10
    db = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((6, d)).astype(np.float32)
    vals, idx = sharded_exact_search(
        mesh, jnp.asarray(q), jnp.asarray(db), k, metric=metric, chunk_size=64
    )
    ref_vals, ref_idx = numpy_exact(q, db, k, metric)
    assert_rank_match(vals, idx, ref_vals, ref_idx)


def test_sharded_search_with_query_sharding(rng):
    mesh = make_mesh({"data": 2, "db": 4})
    n, d, k = 512, 16, 5
    db = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((8, d)).astype(np.float32)
    vals, idx = sharded_exact_search(
        mesh, jnp.asarray(q), jnp.asarray(db), k,
        metric="L2", chunk_size=64, data_axis="data",
    )
    ref_vals, ref_idx = numpy_exact(q, db, k, "L2")
    assert_rank_match(vals, idx, ref_vals, ref_idx)


def test_sharded_index_add_search_reset(rng):
    mesh = make_mesh({"db": 8})
    idx = ShardedFlatIndex(16, mesh, capacity=8192)
    db = rng.standard_normal((500, 16)).astype(np.float32)
    idx.add(db)
    assert idx.ntotal == 500
    vals, ids = idx.search(db[17], 3)
    assert int(np.asarray(ids)[0, 0]) == 17
    # streaming add after initial fill
    more = rng.standard_normal((100, 16)).astype(np.float32)
    idx.add(more)
    vals, ids = idx.search(more[-1], 1)
    assert int(np.asarray(ids)[0, 0]) == 599
    idx.reset()
    assert idx.ntotal == 0


def test_sharded_index_matches_oracle(rng):
    mesh = make_mesh({"db": 8})
    idx = ShardedFlatIndex(24, mesh)
    db = rng.standard_normal((777, 24)).astype(np.float32)
    idx.add(db)
    q = rng.standard_normal((4, 24)).astype(np.float32)
    vals, ids = idx.search(q, 9)
    ref_vals, ref_idx = numpy_exact(q, db, 9, "L2")
    assert_rank_match(vals, ids, ref_vals, ref_idx)


SMALL = MiniLMConfig(
    vocab_size=128, hidden_size=32, num_layers=2, num_heads=4,
    intermediate_size=64, max_position_embeddings=32, dropout_rate=0.0,
)


def _fake_batch(rng, n, seq):
    ids = rng.integers(5, 100, size=(n, seq)).astype(np.int32)
    mask = np.ones_like(ids)
    return {
        "q_ids": jnp.asarray(ids), "q_mask": jnp.asarray(mask),
        "d_ids": jnp.asarray(ids), "d_mask": jnp.asarray(mask),
    }


@pytest.mark.slow
def test_train_step_dp_tp(rng):
    """Full dp+tp train step on a 2x4 mesh: loss decreases on a fixed batch."""
    mesh = make_mesh({"data": 2, "model": 4})
    run_step, state = make_train_step(SMALL, mesh, learning_rate=1e-3)
    batch = _fake_batch(rng, 8, 16)
    losses = []
    for _ in range(3):
        state, metrics = run_step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 3


def test_param_sharding_layout():
    mesh = make_mesh({"data": 2, "model": 4})
    from rag_faiss_embedding_tpu.models.convert import deterministic_params

    params = shard_params(deterministic_params(SMALL), mesh)
    qkv = params["layer_0"]["attention"]["query"]["kernel"]
    spec = qkv.sharding.spec
    assert "model" in spec  # heads sharded
    ln = params["layer_0"]["attention_norm"]["scale"]
    assert all(s is None for s in ln.sharding.spec)  # replicated


# ---------------------------------------------------------------- sharded IVF

@pytest.mark.slow
def test_sharded_ivf_full_probe_is_exact(rng):
    from rag_faiss_embedding_tpu.parallel.sharded_ivf import ShardedIVFIndex

    mesh = make_mesh({"db": 8})
    n, d = 1024, 16
    db = rng.standard_normal((n, d)).astype(np.float32)
    idx = ShardedIVFIndex(d, mesh, nlist=16, nprobe=16, train_iters=8)
    idx.build(db)
    q = rng.standard_normal((5, d)).astype(np.float32)
    vals, ids = idx.search(q, 7, nprobe=16)
    ref_vals, ref_idx = numpy_exact(q, db, 7, "L2")
    assert_rank_match(vals, ids, ref_vals, ref_idx)


@pytest.mark.slow
def test_sharded_ivf_self_retrieval_and_recall(rng):
    from rag_faiss_embedding_tpu.parallel.sharded_ivf import ShardedIVFIndex

    mesh = make_mesh({"db": 8})
    centers = rng.standard_normal((16, 16)).astype(np.float32) * 3
    db = (centers[:, None, :] + 0.1 * rng.standard_normal((16, 48, 16))
          ).reshape(-1, 16).astype(np.float32)
    idx = ShardedIVFIndex(16, mesh, nlist=16, nprobe=4, train_iters=10)
    idx.build(db)
    vals, ids = idx.search(db[123], 1)
    assert int(np.asarray(ids)[0, 0]) == 123
    # recall grows with nprobe
    q = rng.standard_normal((16, 16)).astype(np.float32)
    _, truth = numpy_exact(q, db, 10, "L2")

    def recall(p):
        _, got = idx.search(q, 10, nprobe=p)
        got = np.asarray(got)
        return np.mean([len(set(a.tolist()) & set(b.tolist())) / 10
                        for a, b in zip(got, truth)])

    assert recall(1) <= recall(8) + 1e-9
    assert recall(16) > 0.999
