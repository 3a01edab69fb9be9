"""Multi-chip sharded exact scan with all-gather top-k merge.

The reference has zero distributed code (SURVEY.md §2 "Parallelism
inventory": no DP/TP/PP/EP, no comm backend). This module implements the
TPU-native scale-out design from BASELINE.md config #4 (10M x 384-d flat
scan sharded across a slice):

- Database rows are sharded over the ``"db"`` mesh axis (each chip holds
  N/n_dev rows + its precomputed sqnorms); queries are replicated over "db"
  and optionally sharded over a ``"data"`` axis (query data-parallelism).
- Under ``shard_map`` each device runs the same fused local scan used on one
  chip (the lax-scan path of ops/distance.py), producing a LOCAL top-k.
- A single ``all_gather`` over the k best (value, local-index) pairs rides
  the ICI — k*n_dev candidates per query, thousands of times smaller than
  the raw shards — followed by an on-device merge and global re-indexing.

This mirrors FAISS's IndexShards CPU-thread merge, re-expressed as XLA
collectives over a jax.sharding.Mesh.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.logging import get_logger
from ..index import codec
from ..ops import distance as dist_ops

logger = get_logger(__name__)


def _local_scan(q, db_shard, sq_shard, start, n_valid, k, metric, chunk_size,
                selector="exact", dead_shard=None):
    """Per-device fused scan over the local shard; returns global indices."""
    vals, idx = dist_ops._exact_search_impl(
        q, db_shard, k,
        metric=metric, db_sq=sq_shard,
        n_valid=jnp.maximum(n_valid - start, 0).astype(jnp.int32),
        chunk_size=chunk_size, selector=selector, dead=dead_shard,
    )
    gidx = jnp.where(idx >= 0, idx + start, -1)
    return vals, gidx


@functools.lru_cache(maxsize=128)
def _build_sharded_search(
    mesh: Mesh,
    k: int,
    k_eff: int,
    rows_per_dev: int,
    metric: str,
    chunk_size: int,
    db_axis: str,
    data_axis: Optional[str],
    selector: str,
    with_dead: bool = False,
):
    """Build + jit the shard_map'd search once per static signature.

    Rebuilding the closure per call would defeat the jit cache (every search
    would retrace + recompile); lru_cache keyed on the static config returns
    the same compiled callable.
    """
    n_dev = mesh.shape[db_axis]
    qspec = P(data_axis) if data_axis else P()
    in_specs = (qspec, P(db_axis), P(db_axis), P())
    if with_dead:
        in_specs = in_specs + (P(db_axis),)
    out_specs = (qspec, qspec)

    def kernel(q_l, db_l, sq_l, nv_l, *rest):
        dev = jax.lax.axis_index(db_axis)
        start = dev * rows_per_dev
        vals, gidx = _local_scan(
            q_l, db_l, sq_l, start, nv_l, k_eff, metric, chunk_size, selector,
            dead_shard=rest[0] if rest else None,
        )
        # merge across the db axis: gather k candidates from every shard
        all_vals = jax.lax.all_gather(vals, db_axis, axis=1, tiled=True)
        all_idx = jax.lax.all_gather(gidx, db_axis, axis=1, tiled=True)
        scores = -all_vals if metric == "L2" else all_vals
        scores = jnp.where(all_idx >= 0, scores, dist_ops.NEG_INF)
        best, pos = jax.lax.top_k(scores, min(k, k_eff * n_dev))
        merged_vals = jnp.take_along_axis(all_vals, pos, axis=1)
        merged_idx = jnp.take_along_axis(all_idx, pos, axis=1)
        merged_vals = jnp.where(
            merged_idx >= 0, merged_vals,
            jnp.inf if metric == "L2" else -jnp.inf,
        )
        return merged_vals, merged_idx

    mapped = jax.shard_map(
        kernel, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(mapped)


def sharded_exact_search(
    mesh: Mesh,
    q: jax.Array,
    db: jax.Array,
    k: int,
    *,
    metric: str = "L2",
    db_sq: Optional[jax.Array] = None,
    n_valid: Optional[int] = None,
    chunk_size: int = 65536,
    db_axis: str = "db",
    data_axis: Optional[str] = None,
    selector: str = "exact",
    dead: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over a row-sharded database.

    ``db`` has layout (n_dev * rows_per_dev, dim) and is (or will be) sharded
    over ``db_axis``; ``q`` is replicated over ``db_axis`` (and sharded over
    ``data_axis`` if given). Returns replicated (values, indices) with the
    same contract as ops.distance.exact_search.
    """
    n = db.shape[0]
    n_dev = mesh.shape[db_axis]
    if n % n_dev:
        raise ValueError(f"db rows {n} must divide mesh axis {db_axis}={n_dev}")
    rows_per_dev = n // n_dev
    k_eff = min(k, rows_per_dev)  # each shard contributes at most its rows
    nv = jnp.asarray(n if n_valid is None else n_valid, jnp.int32)
    if db_sq is None:
        db_sq = dist_ops.sqnorms(db)
    chunk_size = min(chunk_size, rows_per_dev)

    fn = _build_sharded_search(
        mesh, k, k_eff, rows_per_dev, metric, chunk_size, db_axis,
        data_axis, selector, with_dead=dead is not None,
    )
    vals, idx = (
        fn(q, db, db_sq, nv, dead) if dead is not None
        else fn(q, db, db_sq, nv)
    )
    k_got = vals.shape[1]
    if k_got < k:
        nq = q.shape[0]
        fill = jnp.inf if metric == "L2" else -jnp.inf
        vals = jnp.concatenate(
            [vals, jnp.full((nq, k - k_got), fill, vals.dtype)], axis=1
        )
        idx = jnp.concatenate(
            [idx, jnp.full((nq, k - k_got), -1, jnp.int32)], axis=1
        )
    return vals, idx


class ShardedFlatIndex:
    """Flat exact index with rows sharded across a device mesh.

    Multi-chip counterpart of index.flat.FlatIndex: same add/search/reset
    contract, but the vector buffer is laid out (and padded) so each device
    of the ``db`` mesh axis owns a contiguous row range, and search merges
    per-device top-k via all-gather (BASELINE.md config #4).
    """

    def __init__(
        self,
        dim: int,
        mesh: Mesh,
        metric: str = "L2",
        dtype: str | jnp.dtype = "float32",
        capacity: int = 8192,
        db_axis: str = "db",
        selector: str = "exact",
    ):
        if metric not in ("L2", "IP"):
            raise ValueError(f"metric must be 'L2' or 'IP', got {metric!r}")
        self.dim = int(dim)
        self.mesh = mesh
        self.metric = metric
        self.dtype = jnp.dtype(dtype)
        self.db_axis = db_axis
        self.selector = selector
        self.n_dev = mesh.shape[db_axis]
        self.ntotal = 0
        self._capacity = self._round_cap(capacity)
        self._sharding = NamedSharding(mesh, P(db_axis))
        self._replicated = NamedSharding(mesh, P())
        self._buf = jax.device_put(
            jnp.zeros((self._capacity, self.dim), self.dtype), self._sharding
        )
        self._sq = jax.device_put(
            jnp.zeros((self._capacity,), jnp.float32), self._sharding
        )
        # tombstone mask (remove_ids); allocated on first removal
        self._dead: Optional[jax.Array] = None
        self.ndeleted = 0

    def _round_cap(self, cap: int) -> int:
        per_dev = -(-cap // self.n_dev)
        per_dev = max(1024, -(-per_dev // 1024) * 1024)
        return per_dev * self.n_dev

    def _grow(self, needed: int) -> None:
        """Grow the sharded buffers ON DEVICE: a jitted zero-pad with sharded
        output shardings. Rows keep their global positions (the id mapping is
        positional), so XLA redistributes the shard boundaries over ICI — no
        multi-GB host round trip (at the 10M-row BASELINE config #4 scale the
        old host copy moved the whole corpus through the host per growth)."""
        if needed <= self._capacity:
            return
        new_cap = self._capacity
        while new_cap < needed:
            new_cap *= 2
        pad = new_cap - self._capacity
        pad_buf = jax.jit(
            lambda b: jnp.pad(b, ((0, pad), (0, 0))),
            out_shardings=self._sharding,
        )
        pad_sq = jax.jit(
            lambda s: jnp.pad(s, (0, pad)), out_shardings=self._sharding
        )
        self._buf = pad_buf(self._buf)
        self._sq = pad_sq(self._sq)
        if self._dead is not None:
            self._dead = jax.jit(
                lambda d: jnp.pad(d, (0, pad)), out_shardings=self._sharding
            )(self._dead)
        self._capacity = new_cap
        logger.debug("grew sharded index capacity to %d rows (on device)",
                     new_cap)

    @functools.cached_property
    def _update_fns(self):
        """Jitted in-place appenders, built once (watermark is traced so
        streaming adds never retrace)."""
        buf_update = jax.jit(
            lambda b, v, at: jax.lax.dynamic_update_slice(b, v, (at, 0)),
            donate_argnums=(0,),
            out_shardings=self._sharding,
        )
        sq_update = jax.jit(
            lambda s, v, at: jax.lax.dynamic_update_slice(s, v, (at,)),
            donate_argnums=(0,),
            out_shardings=self._sharding,
        )
        return buf_update, sq_update

    def add(self, vectors) -> None:
        vecs = jnp.asarray(vectors, self.dtype)
        if vecs.ndim == 1:
            vecs = vecs[None, :]
        n_new = vecs.shape[0]
        self._grow(self.ntotal + n_new)
        sq_new = dist_ops.sqnorms(vecs)
        buf_update, sq_update = self._update_fns
        at = jnp.int32(self.ntotal)
        self._buf = buf_update(self._buf, vecs, at)
        self._sq = sq_update(self._sq, sq_new, at)
        self.ntotal += n_new

    def search(self, queries, k: int, chunk_size: int = 65536,
               filter_mask=None):
        """``filter_mask``: optional (ntotal,) bool, True = searchable
        (FAISS ``IDSelector`` analog). OR-ed into the tombstone mask and
        sharded over the db axis, so each device masks its local rows with
        no cross-device traffic."""
        q = jnp.asarray(queries, self.dtype)
        if q.ndim == 1:
            q = q[None, :]
        if self.ntotal == 0:
            nq = q.shape[0]
            fill = jnp.inf if self.metric == "L2" else -jnp.inf
            return (
                jnp.full((nq, k), fill, jnp.float32),
                jnp.full((nq, k), -1, jnp.int32),
            )
        dead = self._dead
        if filter_mask is not None:
            block = ~jnp.asarray(filter_mask, jnp.bool_)
            if block.shape[0] != self.ntotal:
                raise ValueError(
                    f"filter_mask has {block.shape[0]} entries, "
                    f"index has {self.ntotal}"
                )
            block = jnp.pad(block, (0, self._capacity - self.ntotal))
            combine = jax.jit(
                (lambda d, b: d | b) if dead is not None else (lambda b: b),
                out_shardings=self._sharding,
            )
            dead = combine(dead, block) if dead is not None else combine(block)
        q = jax.device_put(q, self._replicated)
        return sharded_exact_search(
            self.mesh, q, self._buf, k,
            metric=self.metric, db_sq=self._sq, n_valid=self.ntotal,
            chunk_size=chunk_size, db_axis=self.db_axis,
            selector=self.selector, dead=dead,
        )

    @property
    def nlive(self) -> int:
        """Rows that remain searchable (``ntotal`` minus tombstones)."""
        return self.ntotal - self.ndeleted

    def remove_ids(self, ids) -> int:
        """Tombstone rows by position (``faiss.Index.remove_ids`` analog;
        same stable-position semantics as FlatIndex.remove_ids). The mask is
        sharded over the db axis like the buffers, so the per-device scan
        masks its local rows with no cross-device traffic."""
        pos = np.unique(np.asarray(ids, np.int64).ravel())
        pos = pos[(pos >= 0) & (pos < self.ntotal)]
        if not len(pos):
            return 0
        if self._dead is None:
            self._dead = jax.device_put(
                jnp.zeros((self._capacity,), jnp.bool_), self._sharding
            )
        before = self._dead
        upd = jax.jit(
            lambda d, p: d.at[p].set(True), out_shardings=self._sharding
        )
        self._dead = upd(before, jnp.asarray(pos, jnp.int32))
        newly = int(len(pos) - jnp.sum(before[jnp.asarray(pos, jnp.int32)]))
        self.ndeleted += newly
        logger.debug("tombstoned %d rows (%d live)", newly, self.nlive)
        return newly

    def reset(self) -> None:
        self.ntotal = 0
        self.ndeleted = 0
        self._dead = None
        self._buf = jax.device_put(
            jnp.zeros_like(self._buf), self._sharding
        )
        self._sq = jax.device_put(jnp.zeros_like(self._sq), self._sharding)

    def vectors(self) -> np.ndarray:
        return np.asarray(self._buf[: self.ntotal])

    def state_dict(self) -> dict:
        # payload layout matches FlatIndex ("vectors" in insertion order), so
        # a sharded save can also be reloaded single-chip and vice versa; the
        # kind tag routes VectorStore.load_index back to a sharded instance
        vecs = codec.to_host(self._buf[: self.ntotal])
        state = {
            "kind": "sharded_flat",
            "dim": self.dim,
            "metric": self.metric,
            "dtype": str(self.dtype),
            "vectors": vecs,
        }
        if self.ndeleted:
            state["dead"] = np.asarray(self._dead[: self.ntotal])
        return state

    @classmethod
    def from_state_dict(
        cls, state: dict, mesh: Optional[Mesh] = None, **kwargs
    ) -> "ShardedFlatIndex":
        """Rebuild from a saved state (the round-1 gap: persistence was
        one-way). ``mesh`` defaults to all local devices on a "db" axis."""
        def item(v):
            v = np.asarray(v)
            return v.item() if v.ndim == 0 else v

        if mesh is None:
            from ..core.mesh import make_mesh

            mesh = make_mesh({"db": len(jax.devices())})
        idx = cls(
            dim=int(item(state["dim"])),
            mesh=mesh,
            metric=str(item(state["metric"])),
            dtype=str(item(state["dtype"])),
            **kwargs,
        )
        vectors = np.asarray(state["vectors"])
        if idx.dtype == jnp.bfloat16 and vectors.dtype != np.float32:
            # uint16 bit pattern (or legacy void "|V2"): bf16 bits -> f32
            vectors = np.asarray(
                codec.from_host(vectors, jnp.bfloat16).astype(jnp.float32))
        if len(vectors):
            idx.add(vectors)
        if "dead" in state:
            idx.remove_ids(np.nonzero(np.asarray(state["dead"], bool))[0])
        return idx
