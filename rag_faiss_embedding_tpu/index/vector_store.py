"""Vector store: index + document-id mapping + persistence.

Capability parity with the reference's ``FAISSVectorStore``
(``faiss_store.py:10-128``): position->doc-id mapping kept alongside the
index, search returns mapped doc ids with invalid (-1) slots filtered, save
writes the index plus a ``.mapping`` sidecar, load falls back to sequential
ids when the sidecar is missing (``faiss_store.py:108-116``), and ``reset()``
clears everything.

Differences by design:
- No singleton (the reference makes both the store and the DB singletons,
  ``faiss_store.py:10-17`` — a global-state hazard).
- The sidecar is JSON, not pickle (no arbitrary code execution on load).
- The index payload is a ``.npz`` of device-shard contents, not a FAISS
  binary; the id mapping is loaded once at startup, not re-read per query
  (the reference unpickles the mapping on every search,
  ``rag_datastore_manager.py:221-223``).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..core.logging import get_logger
from .flat import FlatIndex

logger = get_logger(__name__)


class VectorStore:
    def __init__(
        self,
        dimension: int = 384,
        metric: str = "L2",
        index_path: str | Path = "data/index.tpu",
        dtype: str = "float32",
        index: Optional[object] = None,
        selector: str = "exact",
        mesh: Optional[object] = None,
    ):
        self.dimension = dimension
        self.metric = metric
        self.index_path = Path(index_path)
        # mesh used when loading sharded index kinds; None -> the sharded
        # classes default to all local devices on a "db" axis
        self._mesh = mesh
        self.doc_ids: List[int] = []
        self.index = index if index is not None else FlatIndex(
            dimension, metric=metric, dtype=dtype, selector=selector
        )
        if self.index_path.exists():
            self.load_index()

    @property
    def ntotal(self) -> int:
        return self.index.ntotal

    @property
    def nlive(self) -> int:
        """Searchable vectors (``ntotal`` minus ``remove_ids`` tombstones)."""
        return getattr(self.index, "nlive", self.index.ntotal)

    def add_vectors(self, vectors: np.ndarray, ids: Sequence[int]) -> None:
        """Add vectors with their document ids (``faiss_store.py:36-47``)."""
        vectors = np.asarray(vectors, dtype=np.float32)
        if vectors.ndim == 1:
            vectors = vectors.reshape(1, -1)
        if len(ids) != len(vectors):
            raise ValueError(f"{len(vectors)} vectors but {len(ids)} ids")
        self.doc_ids.extend(int(i) for i in ids)
        self.index.add(vectors)
        logger.debug("added %d vectors (ntotal=%d)", len(ids), self.ntotal)

    def import_faiss(self, path: str | Path,
                     mapping_path: Optional[str | Path] = None) -> int:
        """Migrate a reference ``faiss.write_index`` flat binary into this
        store (one-way; see :mod:`.faiss_import`). The file's metric must
        match the store's. Returns the number of vectors imported."""
        from .faiss_import import import_faiss_index

        vecs, ids, metric = import_faiss_index(path, mapping_path)
        if metric != self.metric:
            raise ValueError(
                f"FAISS file is {metric} but this store is {self.metric}")
        if vecs.shape[1] != self.dimension:
            raise ValueError(
                f"FAISS file is {vecs.shape[1]}-d but this store is "
                f"{self.dimension}-d")
        self.add_vectors(vecs, ids)
        return len(ids)

    def search(
        self,
        query_vectors: np.ndarray,
        k: int = 5,
        allowed_doc_ids: Optional[Sequence[int]] = None,
    ) -> Tuple[np.ndarray, List[List[int]]]:
        """Search and map row positions to document ids.

        Accepts a single vector or a batch. Returns (distances, doc_ids)
        with invalid slots dropped, mirroring ``faiss_store.py:49-81`` —
        but batched: distances is a list-of-arrays aligned with doc_ids.

        ``allowed_doc_ids``: optional allowlist of DOCUMENT ids (filtered
        search, the FAISS ``IDSelector`` analog): translated to a
        row-position mask through the id mapping and applied inside the
        scan, so only allowed documents are scored and returned.
        """
        q = np.asarray(query_vectors, dtype=np.float32)
        single = q.ndim == 1
        if single:
            q = q.reshape(1, -1)
        kwargs = {}
        if allowed_doc_ids is not None:
            allowed = {int(i) for i in allowed_doc_ids}
            mask = np.fromiter(
                (d in allowed for d in self.doc_ids),
                dtype=bool, count=len(self.doc_ids),
            )
            n = self.index.ntotal
            if len(mask) < n:  # defensive: sequential-id fallback mapping
                mask = np.pad(mask, (0, n - len(mask)))
            kwargs["filter_mask"] = mask[:n]
        values, indices = self.index.search(q, k, **kwargs)
        values = np.asarray(values)
        indices = np.asarray(indices)
        all_ids: List[List[int]] = []
        all_dists: List[np.ndarray] = []
        for row_v, row_i in zip(values, indices):
            ids, dists = [], []
            for v, i in zip(row_v, row_i):
                if i != -1 and i < len(self.doc_ids):
                    ids.append(self.doc_ids[int(i)])
                    dists.append(float(v))
            all_ids.append(ids)
            all_dists.append(np.asarray(dists, dtype=np.float32))
        if single:
            return all_dists[0], all_ids[0]
        return all_dists, all_ids

    def remove_doc_ids(self, doc_ids: Sequence[int]) -> int:
        """Remove all vectors mapped to the given document ids.

        Pairs with the index tiers' ``remove_ids`` (FAISS
        ``Index.remove_ids`` + ``IDSelector``): row positions stay stable,
        so the position->doc-id mapping keeps working; removed slots are
        set to -1 in the mapping, making staleness explicit in the
        persisted sidecar. Returns the number of vectors removed."""
        wanted = {int(i) for i in doc_ids}
        positions = [
            p for p, d in enumerate(self.doc_ids) if d in wanted
        ]
        if not positions:
            return 0
        removed = self.index.remove_ids(np.asarray(positions, np.int64))
        for p in positions:
            self.doc_ids[p] = -1
        logger.debug(
            "removed %d vectors for %d doc ids", removed, len(wanted)
        )
        return int(removed)

    # ------------------------------------------------------------------ io
    def save_index(self, filepath: Optional[str | Path] = None) -> None:
        """Persist index payload + ``.mapping`` sidecar (``faiss_store.py:83-97``)."""
        path = Path(filepath or self.index_path)
        path.parent.mkdir(parents=True, exist_ok=True)
        state = self.index.state_dict()
        np.savez_compressed(
            path, **{k: np.asarray(v) for k, v in state.items()}
        )
        # np.savez appends .npz unless present; normalize to the exact path.
        written = path if path.suffix == ".npz" else path.with_name(path.name + ".npz")
        if written != path:
            written.replace(path)
        mapping_path = Path(str(path) + ".mapping")
        mapping_path.write_text(json.dumps(self.doc_ids))
        logger.info("saved index (%d vectors) to %s", self.ntotal, path)

    def load_index(self, filepath: Optional[str | Path] = None) -> None:
        """Load index + mapping; sequential-id fallback if sidecar missing
        (``faiss_store.py:99-122``)."""
        path = Path(filepath or self.index_path)
        with np.load(path, allow_pickle=False) as z:
            state = {k: z[k] for k in z.files}
        kind = str(state["kind"])
        if kind == "flat":
            self.index = FlatIndex.from_state_dict(
                {k: (v if k == "vectors" else v.item() if v.ndim == 0 else v)
                 for k, v in state.items()}
            )
        elif kind == "ivf":
            from .ivf import IVFFlatIndex

            self.index = IVFFlatIndex.from_state_dict(state)
        elif kind == "pq":
            from .pq import PQIndex

            self.index = PQIndex.from_state_dict(state)
        elif kind == "sharded_flat":
            from ..parallel.sharded import ShardedFlatIndex

            self.index = ShardedFlatIndex.from_state_dict(
                state, mesh=self._mesh
            )
        elif kind == "sharded_ivf":
            from ..parallel.sharded_ivf import ShardedIVFIndex

            self.index = ShardedIVFIndex.from_state_dict(
                state, mesh=self._mesh
            )
        else:
            raise ValueError(f"unknown index kind {kind!r}")
        self.dimension = self.index.dim
        self.metric = self.index.metric
        mapping_path = Path(str(path) + ".mapping")
        if mapping_path.exists():
            self.doc_ids = [int(i) for i in json.loads(mapping_path.read_text())]
            logger.info("loaded id mapping for %d documents", len(self.doc_ids))
        else:
            self.doc_ids = list(range(self.index.ntotal))
            logger.warning("no mapping sidecar; using sequential ids")
        logger.info("loaded index from %s (%d vectors)", path, self.ntotal)

    def reset(self) -> None:
        self.index.reset()
        self.doc_ids = []
        logger.info("reset vector store")
