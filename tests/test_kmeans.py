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


def test_fixed_shape_scatter_drops_pads(rng):
    """Relocation/reseed scatters use fixed 256-slot index vectors so the
    XLA program is compiled once per build, not once per Lloyd iteration;
    pad slots point at row nlist and must be dropped, leaving non-moved
    centroids bit-identical."""
    import jax.numpy as jnp
    from rag_faiss_embedding_tpu.ops.kmeans import (
        _MAX_MOVES, _pad_idx, _scatter_rows,
    )

    nlist = 12
    cents = jnp.asarray(rng.standard_normal((nlist, 8)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((40, 8)), jnp.float32)
    dest, src = [3, 7], [11, 29]
    out = np.asarray(_scatter_rows(
        cents, x, _pad_idx(dest, nlist), _pad_idx(src, 0)))
    np.testing.assert_array_equal(out[3], np.asarray(x)[11])
    np.testing.assert_array_equal(out[7], np.asarray(x)[29])
    keep = [i for i in range(nlist) if i not in dest]
    np.testing.assert_array_equal(out[keep], np.asarray(cents)[keep])
    # overlong move lists are truncated to the fixed budget, not an error
    long = list(range(2 * _MAX_MOVES))
    assert _pad_idx(long, nlist).shape == (_MAX_MOVES,)


def test_reseed_fills_empty_clusters(rng):
    """_reseed_rows must overwrite exactly the padded dest slots with rows
    drawn from the weight distribution (zero-weight rows never picked)."""
    import jax
    import jax.numpy as jnp
    from rag_faiss_embedding_tpu.ops.kmeans import _pad_idx, _reseed_rows

    nlist, n = 10, 64
    cents = jnp.zeros((nlist, 4), jnp.float32)
    x = jnp.asarray(rng.standard_normal((n, 4)) + 5.0, jnp.float32)
    weight = jnp.zeros((n,), jnp.float32).at[17].set(1.0)  # only row 17
    out = np.asarray(_reseed_rows(
        cents, x, weight, _pad_idx([2, 5], nlist), jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(out[2], np.asarray(x)[17])
    np.testing.assert_array_equal(out[5], np.asarray(x)[17])
    keep = [i for i in range(nlist) if i not in (2, 5)]
    assert np.all(out[keep] == 0.0)


def test_numpy_kmeans_recovers_separated_clusters(rng):
    """Host-side Lloyd (spatial_order's super-clustering) must recover a
    well-separated mixture: every true cluster maps to one label and the
    objective is near the generating noise floor."""
    from rag_faiss_embedding_tpu.ops.kmeans import _numpy_kmeans

    k, per = 6, 50
    means = rng.standard_normal((k, 16)).astype(np.float32) * 20
    pts = (means[:, None, :]
           + 0.1 * rng.standard_normal((k, per, 16)).astype(np.float32)
           ).reshape(-1, 16)
    cents, assign_ = _numpy_kmeans(pts, k, n_iters=10, seed=0)
    assert cents.shape == (k, 16) and assign_.shape == (k * per,)
    # each generating cluster is internally label-pure
    for c in range(k):
        labels = assign_[c * per : (c + 1) * per]
        assert len(set(labels.tolist())) == 1
    # and distinct clusters got distinct labels
    assert len({assign_[c * per] for c in range(k)}) == k


def test_seed_subsample_floor_protects_small_builds(rng):
    """The lean 16/centroid ++ seeding (round-3 HBM-traffic fix) has a 4096-
    point floor: at small nlist a merged seed pair is ~2x the target list
    size — under the donate threshold — so seeding noise would be permanent.
    With the floor, the lean default must match full-sample seeding exactly
    at small scale (identical seed set -> identical centroids)."""
    pts, _ = clustered_data(rng, n_clusters=16, per_cluster=128, spread=0.4)

    def run(seed_sample):
        cents, assigns = train_kmeans(
            pts, 16, n_iters=10, seed=0, seed_sample=seed_sample)
        return np.asarray(cents), np.asarray(assigns)

    c_lean, a_lean = run(16)          # floor kicks in: full sample
    c_full, a_full = run(1 << 30)
    np.testing.assert_array_equal(c_lean, c_full)
    np.testing.assert_array_equal(a_lean, a_full)
