"""Independent numpy IVF oracle (VERDICT r2 weak #6 / BASELINE config #3).

No faiss wheel exists in this image, so "recall parity with FAISS-IVF at
equal nprobe" was previously argued against this repo's own fp32 oracle.
This module carries a from-scratch ~80-line numpy IVF — k-means++ init,
Lloyd iterations, exact per-list scan, classic nprobe probing, zero shared
code with the library — and asserts the TPU tier's recall@10 at equal
nlist/nprobe meets or beats it on mixture data. The oracle is the same
algorithm family as ``faiss.IndexIVFFlat`` (quantizer top-nprobe + exact
list scan), making the parity claim checkable instead of rhetorical.
"""

import pytest
import numpy as np

from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex

from .test_distance import numpy_exact
from .test_ivf_fused import _recall


class NumpyIVF:
    """Classic IVF-Flat: Lloyd k-means coarse quantizer, exact within-list
    scan, per-query top-nprobe probing. Pure numpy float64 scoring."""

    def __init__(self, nlist: int, n_iters: int = 20, seed: int = 0):
        self.nlist = nlist
        self.n_iters = n_iters
        self.seed = seed

    @staticmethod
    def _sqdist(a, b):
        return (
            (a * a).sum(1)[:, None] - 2.0 * a @ b.T + (b * b).sum(1)[None, :]
        )

    def _kmeanspp(self, x, rng):
        c = [x[rng.integers(len(x))]]
        for _ in range(self.nlist - 1):
            d2 = np.min(self._sqdist(x, np.stack(c)), axis=1)
            p = np.maximum(d2, 0) / max(np.maximum(d2, 0).sum(), 1e-12)
            c.append(x[rng.choice(len(x), p=p)])
        return np.stack(c)

    def build(self, x):
        x = np.asarray(x, np.float64)
        rng = np.random.default_rng(self.seed)
        cents = self._kmeanspp(x, rng)
        for _ in range(self.n_iters):
            assign = np.argmin(self._sqdist(x, cents), axis=1)
            for l in range(self.nlist):
                rows = x[assign == l]
                if len(rows):
                    cents[l] = rows.mean(0)
        self.centroids = cents
        self.assign = np.argmin(self._sqdist(x, cents), axis=1)
        self.lists = [np.nonzero(self.assign == l)[0] for l in range(self.nlist)]
        self.x = x

    def search(self, q, k, nprobe):
        q = np.asarray(q, np.float64)
        probes = np.argsort(self._sqdist(q, self.centroids), axis=1)[:, :nprobe]
        out = np.full((len(q), k), -1, np.int64)
        for i in range(len(q)):
            cand = np.concatenate([self.lists[l] for l in probes[i]]) \
                if nprobe else np.zeros(0, np.int64)
            if not len(cand):
                continue
            d = ((self.x[cand] - q[i]) ** 2).sum(1)
            top = cand[np.argsort(d, kind="stable")[:k]]
            out[i, : len(top)] = top
        return out


@pytest.mark.slow
def test_tpu_ivf_recall_meets_numpy_ivf_oracle(rng):
    """At equal nlist and equal nprobe on mixture data, the fused TPU tier's
    recall@10 must meet the independent oracle's (small slack for different
    k-means inits). Swept over the nprobe range of BASELINE config #3."""
    n_modes, dim, k = 32, 32, 10
    centers = rng.standard_normal((n_modes, dim)).astype(np.float32) * 2
    mode = rng.integers(0, n_modes, 4096)
    pts = (centers[mode]
           + 0.5 * rng.standard_normal((4096, dim))).astype(np.float32)
    q = (pts[::16] + 0.2 * rng.standard_normal(
        (len(pts[::16]), dim))).astype(np.float32)
    _, truth = numpy_exact(q, pts, k, "L2")

    oracle = NumpyIVF(nlist=n_modes, n_iters=15, seed=1)
    oracle.build(pts)
    idx = IVFFlatIndex(dim, nlist=n_modes, train_iters=15,
                       balance="reassign")
    idx.build(pts)

    for nprobe in (1, 4, 16, 32):
        r_oracle = _recall(oracle.search(q, k, nprobe), truth)
        _, ids = idx.search(q, k, nprobe=nprobe)
        r_tpu = _recall(ids, truth)
        # the fused kernel scans the chunk UNION (a superset of each
        # query's own lists), so it typically exceeds the oracle; 0.03
        # slack absorbs partition differences from distinct inits
        assert r_tpu >= r_oracle - 0.03, (nprobe, r_tpu, r_oracle)
    # both must be exact at full probe
    assert _recall(oracle.search(q, k, n_modes), truth) == 1.0
    _, ids = idx.search(q, k, nprobe=n_modes)
    assert _recall(ids, truth) == 1.0


@pytest.mark.slow
def test_balanced_build_zero_spill_on_bench_distribution(rng):
    """Spill regression bound (VERDICT r03 #9: the r03 headline build
    spilled 38 rows at 1M/nlist=8192 where r02 spilled 0). Proportional
    replica of the bench regime — gaussian mixture, mean 128 rows/list,
    window cap 2x the mean, donor-split training + greedy reassignment —
    must place every row in a capped list (spill = 0). bench.py data:
    8192 modes, spread 0.7, nlist ~ 8*sqrt(N)."""
    n, nlist, dim, n_modes = 65536, 512, 128, 512
    centers = rng.standard_normal((n_modes, dim)).astype(np.float32)
    mode = rng.integers(0, n_modes, size=n)
    pts = centers[mode] + 0.7 * rng.standard_normal((n, dim)).astype(
        np.float32)
    idx = IVFFlatIndex(dim, nlist=nlist, dtype="bfloat16", train_iters=10,
                       balance="reassign")
    idx.build(pts)
    assert idx._pending.ntotal == 0, (
        f"balanced build spilled {idx._pending.ntotal} rows "
        f"(window {idx._window})")


def test_rescue_pass_places_exhausted_rows_nearest_open_list(rng):
    """The rescue pass behind zero-spill builds (VERDICT r03 #9): rows
    whose greedy choices all filled must land in the nearest list that
    still has capacity — never exceed any list's cap, never stay
    unassigned while capacity remains."""
    dim, nlist, cap = 16, 8, 4
    pts = rng.standard_normal((nlist * cap, dim)).astype(np.float32)
    idx = IVFFlatIndex(dim, nlist=nlist, dtype="float32", train_iters=5,
                       balance="reassign")
    idx.train(pts)
    # fabricate a post-greedy state: lists 0..5 full, rows 0..7 unplaced
    assign = np.repeat(np.arange(6), cap).astype(np.int64)
    assign = np.concatenate([np.full(8, -1, np.int64), assign])[: len(pts)]
    spill_rows = np.where(assign < 0)[0]
    import jax.numpy as jnp

    out = idx._rescue_exhausted(jnp.asarray(pts), spill_rows,
                                assign.copy(), cap)
    assert (out >= 0).all(), "capacity remained but rows stayed unassigned"
    counts = np.bincount(out, minlength=nlist)
    assert (counts <= cap).all(), counts
    # every rescued row went to an OPEN list (6 or 7), and to the nearer
    # of the two open centroids by its own metric distance
    cents = np.asarray(idx.centroids, np.float64)
    for r in spill_rows:
        assert out[r] in (6, 7)
    d = ((pts[spill_rows, None, :].astype(np.float64)
          - cents[None, 6:8, :]) ** 2).sum(-1)
    want = d.argmin(1) + 6
    got = out[spill_rows]
    # greedy order may bump a later row off its nearest once that list
    # fills; with 8 rows and 2x4 slots, at most the overflow differs
    assert (got == want).sum() >= len(spill_rows) - max(
        0, int((want == 6).sum()) - cap, int((want == 7).sum()) - cap)
