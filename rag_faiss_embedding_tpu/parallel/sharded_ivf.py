"""Multi-chip IVF-Flat: shared centroids, row-sharded inverted lists.

Combines BASELINE.md configs #3 and #4: corpora past one chip's
HBM-comfortable flat scan get BOTH the IVF pruning and mesh scale-out.

Design (TPU-first):
- centroids are trained once on a global sample (ops/kmeans k-means++ +
  Lloyd) and replicated to every device;
- each device of the ``db`` mesh axis owns a contiguous row range and builds
  its own cluster-sorted local lists (same fixed-window layout as
  index/ivf.py, with one COMMON window across devices so shard_map sees
  uniform shapes);
- query: coarse top-nprobe over the replicated centroids (computed once,
  replicated), then under ``shard_map`` each device probes its local lists
  and emits a local top-k with GLOBAL row ids; one all-gather of
  (k values, k ids) per query merges across the mesh — same tiny collective
  as the sharded flat scan.

Row ids returned are global insertion positions, so VectorStore's
position->doc-id mapping works unchanged.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.logging import get_logger
from ..index.flat import _round_up
from ..index.ivf import probe_scan_math
from ..ops import distance as dist_ops
from ..ops.kmeans import assign as kmeans_assign, train_kmeans

logger = get_logger(__name__)


@functools.lru_cache(maxsize=64)
def _build_sharded_probe(mesh: Mesh, k: int, window: int, db_axis: str):
    def kernel(q, vecs, sq, ids, offsets, lengths, probes):
        vals, gids = probe_scan_math(
            q, vecs[0], sq[0], ids[0], offsets[0], lengths[0], probes,
            k=k, window=window,
        )
        all_vals = jax.lax.all_gather(vals, db_axis, axis=1, tiled=True)
        all_ids = jax.lax.all_gather(gids, db_axis, axis=1, tiled=True)
        scores = jnp.where(all_ids >= 0, -all_vals, dist_ops.NEG_INF)
        k_out = min(k, all_vals.shape[1])
        best, pos = jax.lax.top_k(scores, k_out)
        out_v = jnp.take_along_axis(all_vals, pos, axis=1)
        out_i = jnp.take_along_axis(all_ids, pos, axis=1)
        out_v = jnp.where(out_i >= 0, out_v, jnp.inf)
        return out_v, out_i

    mapped = jax.shard_map(
        kernel,
        mesh=mesh,
        in_specs=(P(), P(db_axis), P(db_axis), P(db_axis),
                  P(db_axis), P(db_axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(mapped)


class ShardedIVFIndex:
    """IVF-Flat sharded over a device mesh (build once, query many)."""

    def __init__(
        self,
        dim: int,
        mesh: Mesh,
        nlist: int = 1024,
        nprobe: int = 8,
        metric: str = "L2",
        dtype: str | jnp.dtype = "float32",
        db_axis: str = "db",
        train_iters: int = 20,
        seed: int = 0,
    ):
        if metric != "L2":
            raise ValueError("ShardedIVFIndex currently supports metric='L2' only")
        if jnp.dtype(dtype) == jnp.int8:
            # a bare cast would truncate unit-scale floats to zeros
            raise ValueError("ShardedIVFIndex supports float32/bfloat16 storage")
        self.dim = int(dim)
        self.mesh = mesh
        self.nlist = int(nlist)
        self.nprobe = int(nprobe)
        self.metric = metric
        self.dtype = jnp.dtype(dtype)
        self.db_axis = db_axis
        self.n_dev = mesh.shape[db_axis]
        self.train_iters = train_iters
        self.seed = seed
        self.centroids: Optional[jax.Array] = None
        self.ntotal = 0
        self._window = 0
        self._sharding = NamedSharding(mesh, P(db_axis))
        self._replicated = NamedSharding(mesh, P())

    def build(self, vectors: np.ndarray) -> None:
        """Train centroids globally, build per-device local lists."""
        vectors = np.asarray(vectors, np.float32)
        n = len(vectors)
        nlist = min(self.nlist, max(1, n // self.n_dev))
        if nlist != self.nlist:
            logger.warning("reducing nlist %d -> %d", self.nlist, nlist)
            self.nlist = nlist
        centroids, _ = train_kmeans(
            jnp.asarray(vectors), self.nlist,
            n_iters=self.train_iters, seed=self.seed,
        )
        self.centroids = jax.device_put(centroids, self._replicated)

        # split rows contiguously across devices (global id = position)
        per_dev = -(-n // self.n_dev)
        dev_rows = [
            (d * per_dev, min((d + 1) * per_dev, n)) for d in range(self.n_dev)
        ]
        assigns = np.asarray(
            kmeans_assign(jnp.asarray(vectors), centroids)[0]
        )

        locals_ = []
        max_len = 1
        for start, end in dev_rows:
            a = assigns[start:end]
            order = np.argsort(a, kind="stable")
            lengths = np.bincount(a[order], minlength=self.nlist).astype(np.int32)
            max_len = max(max_len, int(lengths.max()) if len(a) else 1)
            locals_.append((start, end, order, lengths))
        window = int(_round_up(max_len, 128))
        rows_pad = _round_up(per_dev, 8) + window  # common per-device size

        vec_buf = np.zeros((self.n_dev, rows_pad, self.dim), np.float32)
        sq_buf = np.zeros((self.n_dev, rows_pad), np.float32)
        id_buf = np.full((self.n_dev, rows_pad), -1, np.int32)
        off_buf = np.zeros((self.n_dev, self.nlist), np.int32)
        len_buf = np.zeros((self.n_dev, self.nlist), np.int32)
        for d, (start, end, order, lengths) in enumerate(locals_):
            rows = vectors[start:end][order]
            vec_buf[d, : len(rows)] = rows
            sq_buf[d, : len(rows)] = (rows ** 2).sum(-1)
            id_buf[d, : len(rows)] = start + order  # global row ids
            off_buf[d, 1:] = np.cumsum(lengths[:-1])
            len_buf[d] = lengths

        cast = self.dtype
        self._vecs = jax.device_put(jnp.asarray(vec_buf, cast), self._sharding)
        self._sq = jax.device_put(jnp.asarray(sq_buf), self._sharding)
        self._ids = jax.device_put(jnp.asarray(id_buf), self._sharding)
        self._offsets = jax.device_put(jnp.asarray(off_buf), self._sharding)
        self._lengths = jax.device_put(jnp.asarray(len_buf), self._sharding)
        self._window = window
        self.ntotal = n
        logger.info(
            "built sharded IVF: n=%d over %d devices, nlist=%d window=%d",
            n, self.n_dev, self.nlist, window,
        )

    def search(
        self, queries, k: int, nprobe: Optional[int] = None
    ) -> Tuple[jax.Array, jax.Array]:
        nprobe = min(nprobe or self.nprobe, self.nlist)
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        if self.ntotal == 0:
            nq = q.shape[0]
            return (
                jnp.full((nq, k), jnp.inf, jnp.float32),
                jnp.full((nq, k), -1, jnp.int32),
            )
        q = jax.device_put(q, self._replicated)
        _, probes = dist_ops.exact_search(
            q, self.centroids, nprobe, metric="L2",
            chunk_size=min(65536, self.nlist),
        )
        probes = jax.device_put(probes, self._replicated)
        fn = _build_sharded_probe(self.mesh, k, self._window, self.db_axis)
        vals, ids = fn(
            q, self._vecs, self._sq, self._ids, self._offsets,
            self._lengths, probes,
        )
        if vals.shape[1] < k:
            nq = q.shape[0]
            pad = k - vals.shape[1]
            vals = jnp.concatenate(
                [vals, jnp.full((nq, pad), jnp.inf, vals.dtype)], axis=1
            )
            ids = jnp.concatenate(
                [ids, jnp.full((nq, pad), -1, jnp.int32)], axis=1
            )
        return vals, ids

    def reset(self) -> None:
        self.centroids = None
        self.ntotal = 0
        self._window = 0
