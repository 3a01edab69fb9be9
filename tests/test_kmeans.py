"""k-means training machinery: donor-split balancing, biased assignment,
spatial relabeling (ops/kmeans.py). Oracle strategy per CLAUDE.md: numpy
checks of the partition properties the IVF tier depends on."""

import numpy as np

from rag_faiss_embedding_tpu.ops.kmeans import (
    assign,
    assign_topk,
    spatial_order,
    train_kmeans,
)

from .test_ivf import clustered_data


def test_donor_split_flattens_skew(rng):
    """A corpus with one dominant dense blob: classic k-means parks one
    centroid on the blob (one mega-list); donor-split relocation must move
    extra centroids in, bounding the largest list."""
    blob = rng.standard_normal((4000, 24)).astype(np.float32) * 0.3
    rest = (rng.standard_normal((8, 24)).astype(np.float32) * 10
            + 0.2 * rng.standard_normal((8, 100, 24)).astype(np.float32)
            .transpose(1, 0, 2)).reshape(-1, 24).astype(np.float32)
    pts = np.concatenate([blob, rest])
    nlist = 16
    _, assigns = train_kmeans(pts, nlist, n_iters=15, seed=0)
    counts = np.bincount(np.asarray(assigns), minlength=nlist)
    target = len(pts) / nlist
    # the blob (83% of rows) must be split over several lists
    assert counts.max() <= 3.0 * target, counts


def test_biased_assign_moves_boundary_points(rng):
    pts, _ = clustered_data(rng, n_clusters=4, per_cluster=64)
    cents, assigns = train_kmeans(pts, 4, n_iters=10)
    counts0 = np.bincount(np.asarray(assigns), minlength=4)
    big = int(counts0.argmax())
    bias = np.zeros(4, np.float32)
    bias[big] = 1e6  # price the biggest list out of the market
    a2, vals = assign(pts, cents, bias=bias)
    counts1 = np.bincount(np.asarray(a2), minlength=4)
    assert counts1[big] == 0
    # reported values stay UNBIASED squared distances
    d2 = ((pts[:, None, :] - np.asarray(cents)[None]) ** 2).sum(-1)
    np.testing.assert_allclose(
        np.asarray(vals),
        d2[np.arange(len(pts)), np.asarray(a2)],
        rtol=1e-3, atol=1e-3,
    )


def test_biased_assign_topk_matches_unbiased_at_zero_bias(rng):
    pts, _ = clustered_data(rng, n_clusters=8, per_cluster=16)
    cents, _ = train_kmeans(pts, 8, n_iters=5)
    c0, v0 = assign_topk(pts, cents, 3)
    c1, v1 = assign_topk(pts, cents, 3, bias=np.zeros(8, np.float32))
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                               rtol=1e-3, atol=1e-3)


def test_spatial_order_groups_near_centroids(rng):
    """Adjacent relabeled ids must be spatially closer than random ids on
    average — the fused kernel's chunk locality depends on it."""
    pts, _ = clustered_data(rng, n_clusters=16, per_cluster=64, spread=0.3)
    cents, _ = train_kmeans(pts, 128, n_iters=8)
    cents = np.asarray(cents)
    order = spatial_order(cents, seed=0)
    assert sorted(order.tolist()) == list(range(128))
    reordered = cents[order]
    adj = np.linalg.norm(np.diff(reordered, axis=0), axis=1).mean()
    rng2 = np.random.default_rng(0)
    rand = np.linalg.norm(
        reordered[rng2.permutation(128)] - reordered, axis=1
    ).mean()
    assert adj < 0.8 * rand


def test_spatial_order_small_passthrough():
    c = np.eye(8, 4, dtype=np.float32)
    np.testing.assert_array_equal(spatial_order(c, group=16), np.arange(8))
