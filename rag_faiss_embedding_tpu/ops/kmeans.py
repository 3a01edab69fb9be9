"""Lloyd k-means in JAX (IVF coarse-quantizer training).

TPU-native replacement for ``faiss.Kmeans``/IVF training (the reference only
uses flat indexes, but BASELINE.md config #3 requires an IVF tier with
nlist=4096 k-means). Design:

- assignment step reuses the fused exact-search machinery (one MXU matmul
  per chunk, k=1) — the same kernel that serves queries trains the index;
- update step is a segment-sum via one-hot matmul over assignment chunks
  (MXU-friendly; avoids scatter), accumulated in fp32;
- empty clusters are re-seeded from the largest cluster's points with a
  deterministic perturbation (FAISS does the same re-init trick);
- k-means++-style init: random sample + spreading by re-sampling distant
  points (cheaper than full k-means++ at nlist=4096 scale).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.logging import get_logger
from . import distance as dist_ops

logger = get_logger(__name__)


@functools.partial(jax.jit, static_argnames=("metric", "k"))
def _biased_topk_chunk(xc, cents, adj, metric: str, k: int):
    """Top-k centroids by BIASED score: L2 uses 2x·c - (|c|^2 + bias) (same
    argmax as -(d2 + bias)); IP uses x·c - bias. Returns (ids, biased
    scores, higher better)."""
    xf = xc.astype(jnp.float32)
    dots = jnp.dot(
        xf, cents.T.astype(jnp.float32), preferred_element_type=jnp.float32
    )
    score = 2.0 * dots - adj[None, :] if metric == "L2" else dots - adj[None, :]
    vals, idx = jax.lax.top_k(score, k)
    return idx, vals


def _biased_adj(centroids, bias, metric):
    csq = jnp.sum(centroids.astype(jnp.float32) ** 2, axis=-1)
    return (csq + bias) if metric == "L2" else bias


def assign(
    x: jax.Array, centroids: jax.Array, point_chunk: int = 65536,
    metric: str = "L2", bias: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Best centroid per row: (assignments, values).

    metric="L2" minimizes squared distance; "IP" maximizes the dot product
    (spherical k-means assignment — the coarse rule IP-IVF probes with).
    ``bias`` (nlist,) adds a per-centroid penalty to the effective distance
    (capacity-balanced assignment — see ``train_kmeans(balance_weight=)``).
    Chunks over the POINT axis: at 1M points x 4096 centroids the full score
    matrix is 16 GB — each chunk keeps it at (point_chunk, nlist)."""
    n = x.shape[0]
    if bias is not None:
        adj = _biased_adj(centroids, bias, metric)
        idx_parts, val_parts = [], []
        for start in range(0, n, point_chunk):
            xc = x[start : start + point_chunk]
            idx, vals = _biased_topk_chunk(xc, centroids, adj, metric, 1)
            idx, vals = idx[:, 0], vals[:, 0]
            # report UNBIASED values (L2 squared distance / IP dot), same
            # semantics as the unbiased path — callers use them for
            # objectives and reseed weights
            if metric == "L2":
                xsq = jnp.sum(xc.astype(jnp.float32) ** 2, axis=-1)
                vals = jnp.maximum(xsq - vals - bias[idx], 0.0)
            else:
                vals = vals + bias[idx]
            idx_parts.append(idx)
            val_parts.append(vals)
        return jnp.concatenate(idx_parts), jnp.concatenate(val_parts)
    if n <= point_chunk:
        vals, idx = dist_ops.exact_search(x, centroids, 1, metric=metric)
        return idx[:, 0], vals[:, 0]
    idx_parts, val_parts = [], []
    for start in range(0, n, point_chunk):
        vals, idx = dist_ops.exact_search(
            x[start : start + point_chunk], centroids, 1, metric=metric
        )
        idx_parts.append(idx[:, 0])
        val_parts.append(vals[:, 0])
    return jnp.concatenate(idx_parts), jnp.concatenate(val_parts)


def assign_topk(
    x: jax.Array, centroids: jax.Array, c: int, point_chunk: int = 65536,
    metric: str = "L2", bias: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Top-c candidate centroids per row: (choices (N, c), values (N, c)).

    Used by the balanced IVF build (overflow rows fall back to their next
    choice). Chunked over points like ``assign``; ``bias`` as there."""
    n = x.shape[0]
    c = min(c, centroids.shape[0])
    if bias is not None:
        adj = _biased_adj(centroids, bias, metric)
        idx_parts, val_parts = [], []
        for start in range(0, n, point_chunk):
            xc = x[start : start + point_chunk]
            idx, vals = _biased_topk_chunk(xc, centroids, adj, metric, c)
            if metric == "L2":  # unbiased values, exact_search semantics
                xsq = jnp.sum(xc.astype(jnp.float32) ** 2, axis=-1)
                vals = jnp.maximum(xsq[:, None] - vals - bias[idx], 0.0)
            else:
                vals = vals + bias[idx]
            idx_parts.append(idx)
            val_parts.append(vals)
        return jnp.concatenate(idx_parts), jnp.concatenate(val_parts)
    if n <= point_chunk:
        vals, idx = dist_ops.exact_search(x, centroids, c, metric=metric)
        return idx, vals
    idx_parts, val_parts = [], []
    for start in range(0, n, point_chunk):
        vals, idx = dist_ops.exact_search(
            x[start : start + point_chunk], centroids, c, metric=metric
        )
        idx_parts.append(idx)
        val_parts.append(vals)
    return jnp.concatenate(idx_parts), jnp.concatenate(val_parts)


@functools.partial(jax.jit, static_argnames=("nlist",))
def _update_step(x, assignments, nlist):
    """One Lloyd update via segment-sum (O(N*D), no (N, nlist) one-hot)."""
    xf = x.astype(jnp.float32)
    sums = jax.ops.segment_sum(xf, assignments, num_segments=nlist)
    counts = jax.ops.segment_sum(
        jnp.ones((x.shape[0],), jnp.float32), assignments, num_segments=nlist
    )
    centroids = sums / jnp.maximum(counts[:, None], 1.0)
    return centroids, counts


# Relocation/reseed scatters use FIXED-size padded index vectors: the number
# of donors/empties varies per Lloyd iteration, and a fresh operand shape
# means a fresh XLA program — measured ~98 s of the 1M x 8192 cold build was
# recompiling these scatters every iteration (benchmarks/build_profile.py).
# Pads point out of bounds and are dropped by the scatter.
_MAX_MOVES = 256


def _pad_idx(idx, fill: int) -> jax.Array:
    out = np.full((_MAX_MOVES,), fill, np.int32)
    out[: len(idx)] = np.asarray(idx, np.int32)[:_MAX_MOVES]
    return jnp.asarray(out)


@jax.jit
def _scatter_rows(cents, x, dest, src):
    rows = x[src].astype(jnp.float32)
    return cents.at[dest].set(rows, mode="drop")


@jax.jit
def _reseed_rows(cents, x, weight, dest, key):
    picks = jax.random.categorical(
        key, jnp.log(weight), shape=(_MAX_MOVES,)
    )
    return cents.at[dest].set(x[picks].astype(jnp.float32), mode="drop")


@functools.partial(jax.jit, static_argnames=("nlist",))
def _kmeanspp_init(x: jax.Array, nlist: int, key: jax.Array) -> jax.Array:
    """k-means++ seeding: each next centroid sampled with prob ∝ squared
    distance to the nearest chosen centroid. One fused pass over x per
    centroid — naive random seeding collapses nearby true clusters into one
    (Lloyd can't split a merged pair), which directly costs IVF recall."""
    n, d = x.shape
    xf = x.astype(jnp.float32)
    key, sub = jax.random.split(key)
    first = xf[jax.random.randint(sub, (), 0, n)]
    cents0 = jnp.zeros((nlist, d), jnp.float32).at[0].set(first)
    d2_0 = jnp.sum((xf - first) ** 2, axis=1)

    def body(i, carry):
        cents, d2, key = carry
        key, sub = jax.random.split(key)
        logits = jnp.log(jnp.maximum(d2, 1e-30))
        idx = jax.random.categorical(sub, logits)
        c = xf[idx]
        cents = cents.at[i].set(c)
        d2 = jnp.minimum(d2, jnp.sum((xf - c) ** 2, axis=1))
        return cents, d2, key

    cents, _, _ = jax.lax.fori_loop(1, nlist, body, (cents0, d2_0, key))
    return cents


def _numpy_kmeans(
    x: np.ndarray, k: int, n_iters: int = 8, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """Small host-side Lloyd (for relabeling-scale inputs only): k-means++
    seeding + argmin over a full (n, k) score matrix per iteration. Empty
    clusters re-seed from the farthest points."""
    rs = np.random.RandomState(seed)
    n = len(x)
    # k-means++: next seed sampled with prob ∝ squared distance to the
    # nearest chosen seed (random init merges nearby true clusters, which
    # Lloyd cannot split — same reason the device path seeds with ++)
    cents = np.empty((k, x.shape[1]), x.dtype)
    cents[0] = x[rs.randint(n)]
    d2 = ((x - cents[0]) ** 2).sum(1)
    for j in range(1, k):
        p = np.maximum(d2, 1e-30)
        cents[j] = x[rs.choice(n, p=p / p.sum())]
        d2 = np.minimum(d2, ((x - cents[j]) ** 2).sum(1))
    cents = cents.copy()
    assign = np.zeros(n, np.int64)
    for _ in range(n_iters):
        # argmin_j |x-c_j|^2 == argmin_j (|c_j|^2 - 2 x.c_j)
        score = x @ cents.T
        score = 2.0 * score - (cents * cents).sum(1)[None, :]
        assign = score.argmax(1)
        d2 = (x * x).sum(1) - score[np.arange(n), assign]
        counts = np.bincount(assign, minlength=k)
        sums = np.zeros_like(cents)
        np.add.at(sums, assign, x)
        nonempty = counts > 0
        cents[nonempty] = sums[nonempty] / counts[nonempty, None]
        empty = np.nonzero(~nonempty)[0]
        if len(empty):
            cents[empty] = x[np.argsort(-d2)[: len(empty)]]
    return cents, assign


def spatial_order(
    centroids: np.ndarray | jax.Array, group: int = 16, seed: int = 0
) -> np.ndarray:
    """Permutation that relabels centroids so spatially-near centroids get
    nearby ids.

    The fused IVF kernel (ops/ivf_scan.py) sorts queries by top-1 cell id
    so that a chunk's probe-set union stays small — which only works if
    id-adjacency implies SPATIAL adjacency (raw k-means ids are arbitrary:
    measured recall collapsed to ~0.4 at 1M x 4096 because 1024 queries
    spread over 4096 cells share almost no probe lists with their id
    neighbours). Method: k-means the centroids into ~nlist/group
    super-clusters, order super-clusters by their projection onto the first
    principal axis, and lay member ids out contiguously per super-cluster.
    """
    c = np.asarray(centroids, np.float32)
    nlist = len(c)
    if nlist <= group:
        return np.arange(nlist)
    nsuper = max(2, nlist // group)
    # host numpy Lloyd: the inputs are tiny (nlist x D), and a device
    # k-means here compiled 2-3 one-off XLA programs (~13 s of the cold
    # 1M build through the remote-compile tunnel) to save milliseconds
    super_c, super_a = _numpy_kmeans(c, nsuper, n_iters=8, seed=seed)
    mu = c.mean(0)
    x = c - mu
    v = x[0] + 1e-3  # power iteration for the first principal axis
    for _ in range(8):
        v = x.T @ (x @ v)
        v /= np.linalg.norm(v) + 1e-12
    proj = (super_c - mu) @ v
    super_rank = np.argsort(np.argsort(proj))
    return np.argsort(super_rank[super_a], kind="stable")


def _normalize_rows(c: jax.Array) -> jax.Array:
    norm = jnp.linalg.norm(c, axis=1, keepdims=True)
    return c / jnp.maximum(norm, 1e-12)


def train_kmeans(
    x: np.ndarray | jax.Array,
    nlist: int,
    n_iters: int = 20,
    seed: int = 0,
    tol: float = 1e-4,
    verbose: bool = False,
    init_sample: int = 64,
    seed_sample: int = 16,
    spherical: bool = False,
    balance_weight: float = 0.0,
    return_bias: bool = False,
    stats: Optional[dict] = None,
) -> Tuple[jax.Array, ...]:
    """Lloyd k-means with k-means++ init.

    Returns (centroids (nlist, D) f32, assignments (N,)) — plus the final
    per-centroid bias when ``return_bias`` is set. k-means++ runs on a
    subsample of up to ``init_sample * nlist`` points to bound the seeding
    cost: the sequential ++ pass is O(nlist * sample * D) — at nlist=4096 /
    1M points / 384-d a 256x sample costs ~5 PFLOP (tens of seconds, most of
    the whole build); 64 points per centroid still seeds distinct clusters
    and Lloyd refines from there (recall stays gated in the bench).

    ``balance_weight > 0`` runs CAPACITY-BALANCED Lloyd (auction-style):
    each centroid carries a bias added to its effective squared distance,
    integrated every iteration as
    ``bias += balance_weight * mean_d2 * (count/target - 1)`` — overfull
    lists price themselves up until boundary points move to neighbours.
    This attacks IVF list skew globally (greedy capacity-capped
    reassignment stranded 37% of rows at 1M x 4096 because whole dense
    REGIONS were over capacity, not single lists). The bias only shapes the
    PARTITION; query-time coarse probing stays unbiased.

    ``spherical=True`` is spherical k-means (FAISS ``Clustering`` with
    ``spherical`` set, used by IP-metric IVF): centroids are L2-normalized
    after every update and assignment maximizes the inner product, so the
    partition matches the IP coarse-probe rule at query time.
    """
    import time as _time

    x = jnp.asarray(x)
    n, d = x.shape
    if nlist > n:
        raise ValueError(f"nlist={nlist} > n={n}")
    metric = "IP" if spherical else "L2"
    key = jax.random.PRNGKey(seed)
    key, sub = jax.random.split(key)
    max_init = init_sample * nlist
    t0 = _time.perf_counter()
    if n > max_init:
        sample = x[jax.random.permutation(sub, n)[:max_init]]
    else:
        sample = x
    # The ++ pass is a SEQUENTIAL nlist-step loop that re-reads its whole
    # sample every step (O(nlist * sample * D) HBM traffic — 9 s of the
    # warm 1M x 8192 build at 64 pts/centroid). Seeding only needs enough
    # points to keep distinct clusters represented; 16/centroid quarters
    # the traffic and Lloyd refines on the full training sample. The 4096
    # floor keeps SMALL builds on full-quality seeding: at nlist within a
    # few x of the true cluster count, a merged seed pair is ~2x the target
    # list size — under the donate threshold — so Lloyd cannot split it and
    # the seeding noise of a tiny sample becomes a permanent recall cost
    # (measured: 16 lists / 2048 pts, 16/centroid seeding never reached the
    # full-sample objective across 8 seeds; at nlist=8192 recall is
    # unchanged and seeding is 4x cheaper).
    max_seed = max(seed_sample * nlist, 4096)
    if sample.shape[0] > max_seed:
        if n > max_init:
            seed_set = sample[:max_seed]  # sample is already shuffled
        else:
            sub2 = jax.random.fold_in(key, 7)
            seed_set = sample[jax.random.permutation(sub2, n)[:max_seed]]
    else:
        seed_set = sample
    centroids = _kmeanspp_init(seed_set, nlist, key)
    if spherical:
        centroids = _normalize_rows(centroids)
    centroids.block_until_ready()
    if stats is not None:
        stats["init_s"] = _time.perf_counter() - t0
        stats["assign_s"] = stats["update_s"] = stats["host_s"] = 0.0
        stats["iters"] = 0

    bias = jnp.zeros((nlist,), jnp.float32) if balance_weight else None
    target = n / nlist
    prev_obj = jnp.inf
    for it in range(n_iters):
        t0 = _time.perf_counter()
        assignments, dists = assign(x, centroids, metric=metric, bias=bias)
        obj = float(dists.mean()) * (-1.0 if spherical else 1.0)
        t1 = _time.perf_counter()
        new_centroids, counts = _update_step(x, assignments, nlist)
        counts.block_until_ready()
        t2 = _time.perf_counter()
        # Rebalance by RELOCATION: clusters over 2x the target size donate
        # splits — centroids of the smallest clusters are re-seeded at
        # member points of the overfull ones (FAISS's split-largest policy,
        # many-at-once). Boundary prices (bias) can only shift borders
        # between EXISTING neighbours; wherever a dense region simply has
        # too few centroids, capacity must physically move there, halving
        # the mega-lists each iteration. This is the direct fix for the
        # list skew that otherwise blows up the IVF probe window (measured:
        # largest list 23x the mean at 1M x 4096; 37% of rows stranded in
        # the spill tier). Empty clusters re-seed the same way (they are
        # the first donors). The final two iterations skip relocation so
        # the partition settles.
        n_tiny = 0
        counts_np = np.asarray(counts)
        if it < max(1, n_iters - 2):
            target = n / nlist
            over = np.nonzero(counts_np > 2.0 * target)[0]
            donors_all = np.argsort(counts_np, kind="stable")
            donors = donors_all[
                counts_np[donors_all] < 0.5 * target
            ]
            donors = donors[~np.isin(donors, over)]
            if len(over) and len(donors):
                over = over[np.argsort(-counts_np[over], kind="stable")]
                need = np.minimum(
                    (counts_np[over] / max(target, 1.0)).astype(np.int64), 8
                )
                a_np = np.asarray(assignments)
                order_np = np.argsort(a_np, kind="stable")
                a_sorted_np = a_np[order_np]
                rs = np.random.RandomState((seed * 7919 + it) & 0x7FFFFFFF)
                moves_d, moves_p = [], []
                di = 0
                for b, nd in zip(over, need):
                    take = int(min(nd, len(donors) - di, _MAX_MOVES - di))
                    if take <= 0:
                        break
                    lo, hi = np.searchsorted(a_sorted_np, [b, b + 1])
                    picks = order_np[
                        rs.choice(hi - lo, size=take, replace=False) + lo
                    ]
                    moves_d.extend(donors[di : di + take].tolist())
                    moves_p.extend(picks.tolist())
                    di += take
                if moves_d:
                    n_tiny = len(moves_d)
                    new_centroids = _scatter_rows(
                        new_centroids, x,
                        _pad_idx(moves_d, nlist), _pad_idx(moves_p, 0),
                    )
        # empty clusters (no donor role possible): k-means++-style reseed
        empty_np = np.nonzero(counts_np < 0.5)[0][:_MAX_MOVES]
        if len(empty_np):
            weight = (
                jnp.maximum(2.0 - 2.0 * dists, 1e-30) if spherical
                else jnp.maximum(dists, 1e-30)
            )
            sub = jax.random.fold_in(key, 1000 + it)
            new_centroids = _reseed_rows(
                new_centroids, x, weight, _pad_idx(empty_np, nlist), sub
            )
            n_tiny += len(empty_np)
        if spherical:
            new_centroids = _normalize_rows(new_centroids)
        centroids = new_centroids
        if bias is not None:
            # leaky integral controller with a clipped step: overfull lists
            # price themselves up in units of the current mean squared
            # distance. The clip bounds a 10x-overfull list to the same
            # step as a 2x one (unclipped steps empty it outright and the
            # partition ping-pongs); the leak bleeds off stale price so the
            # loop converges instead of winding up.
            scale = abs(obj) if metric == "L2" else max(
                2.0 - 2.0 * obj, 1e-6
            )
            step = jnp.clip(counts / target - 1.0, -1.0, 1.0)
            bias = 0.9 * bias + (balance_weight * scale) * step
            bias = bias - bias.min()  # pure shift; keeps prices >= 0
        if stats is not None:
            stats["assign_s"] += t1 - t0
            stats["update_s"] += t2 - t1
            stats["host_s"] += _time.perf_counter() - t2
            stats["iters"] = it + 1
        if verbose:
            logger.info("kmeans iter %d: obj=%.5f tiny=%d", it, obj, n_tiny)
        if bias is None and n_tiny == 0 and (
            abs(prev_obj - obj) < tol * max(abs(obj), 1e-12)
        ):
            break
        prev_obj = obj
    assignments, _ = assign(x, centroids, metric=metric, bias=bias)
    if return_bias:
        if bias is None:
            bias = jnp.zeros((nlist,), jnp.float32)
        return centroids, assignments, bias
    return centroids, assignments
