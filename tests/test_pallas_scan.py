"""Pallas fused scan vs the jnp reference scan (interpret mode on CPU)."""

import numpy as np
import pytest

from rag_faiss_embedding_tpu.ops import distance as D
from rag_faiss_embedding_tpu.ops import pallas_scan as P

from .test_distance import assert_rank_match, numpy_exact


@pytest.mark.parametrize("metric", ["L2", "IP"])
@pytest.mark.parametrize("nq,n,d", [(8, 512, 32), (16, 1000, 16)])
def test_pallas_matches_reference(rng, metric, nq, n, d):
    q = rng.standard_normal((nq, d)).astype(np.float32)
    db = rng.standard_normal((n, d)).astype(np.float32)
    k = 7
    vals, idx = P.flat_search(q, db, k, metric=metric, tile_q=8, tile_n=256,
                              interpret=True)
    ref_vals, ref_idx = numpy_exact(q, db, k, metric)
    assert_rank_match(vals, idx, ref_vals, ref_idx)


def test_pallas_masks_invalid_rows(rng):
    db = rng.standard_normal((300, 16)).astype(np.float32)
    db_padded = np.concatenate([db, 1e6 * np.ones((100, 16), np.float32)])
    q = rng.standard_normal((4, 16)).astype(np.float32)
    vals, idx = P.flat_search(q, db_padded, 5, metric="L2", n_valid=300,
                              tile_q=8, tile_n=128, interpret=True)
    assert (np.asarray(idx) < 300).all()
    ref_vals, ref_idx = numpy_exact(q, db, 5, "L2")
    assert_rank_match(vals, idx, ref_vals, ref_idx)


def test_pallas_tie_break_lowest_index(rng):
    row = rng.standard_normal(16).astype(np.float32)
    db = np.stack([row] * 6)  # all identical: ties everywhere
    q = row[None, :]
    vals, idx = P.flat_search(q, db, 4, metric="L2", tile_q=8, tile_n=128,
                              interpret=True)
    np.testing.assert_array_equal(np.asarray(idx)[0], [0, 1, 2, 3])


def test_pallas_k_larger_than_n(rng):
    db = rng.standard_normal((5, 8)).astype(np.float32)
    q = rng.standard_normal((2, 8)).astype(np.float32)
    vals, idx = P.flat_search(q, db, 9, metric="L2", tile_q=8, tile_n=128,
                              interpret=True)
    idx = np.asarray(idx)
    assert idx.shape == (2, 9)
    assert (idx[:, 5:] == -1).all()


def test_pallas_agrees_with_lax_scan_bf16(rng):
    """bf16 storage: pallas and the lax scan must agree with each other."""
    import jax.numpy as jnp

    q = rng.standard_normal((8, 32)).astype(np.float32)
    db = rng.standard_normal((400, 32)).astype(np.float32)
    q16, db16 = jnp.asarray(q, jnp.bfloat16), jnp.asarray(db, jnp.bfloat16)
    sq = D.sqnorms(db16)
    v1, i1 = P.flat_search(q16, db16, 5, metric="L2", db_sq=sq,
                           tile_q=8, tile_n=128, interpret=True)
    v2, i2 = D.exact_search(q16, db16, 5, metric="L2", db_sq=sq, chunk_size=128)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-2)


def test_pallas_masks_invalid(rng):
    db = rng.standard_normal((700, 16)).astype(np.float32)
    dbp = np.concatenate([db, 1e6 * np.ones((324, 16), np.float32)])
    q = rng.standard_normal((4, 16)).astype(np.float32)
    _, idx = P.flat_search(q, dbp, 5, metric="L2", n_valid=700,
                           tile_q=8, tile_n=256, interpret=True)
    assert (np.asarray(idx) < 700).all()
