"""One-way FAISS binary import (migration parity).

The reference persists its index with ``faiss.write_index`` + a pickled
id list (``faiss_store.py:83-97``); a migrating user arrives with those
files. ``index.faiss_import`` must read the BUNDLED reference artifact at
runtime (never copied into this repo) and round it into a live
:class:`VectorStore`.
"""

from __future__ import annotations

import json
import pickle
import struct
from pathlib import Path

import numpy as np
import pytest

from rag_faiss_embedding_tpu.index import VectorStore, import_faiss_index
from rag_faiss_embedding_tpu.index.faiss_import import (
    FaissImportError,
    read_flat_index,
    read_mapping,
)

REF = Path("/root/reference")

pytestmark = pytest.mark.skipif(
    not (REF / "data" / "faiss_index.bin").exists(),
    reason="reference artifact tree not mounted",
)


def _write_flat(path: Path, vecs: np.ndarray, fourcc: bytes = b"IxF2",
                metric_enum: int = 1, count: int | None = None,
                trained: int = 1) -> None:
    """Synthesize a faiss.write_index-layout flat file."""
    n, d = vecs.shape
    if count is None:
        count = n * d  # legacy float-count convention
    hdr = fourcc + struct.pack("<iqqqBi", d, n, 1 << 20, 1 << 20,
                               trained, metric_enum)
    path.write_bytes(hdr + struct.pack("<Q", count)
                     + vecs.astype("<f4").tobytes())


def test_reads_bundled_reference_index():
    vecs, metric = read_flat_index(REF / "data" / "faiss_index.bin")
    assert metric == "L2"
    assert vecs.shape == (23, 384)
    assert vecs.dtype == np.float32
    assert np.all(np.isfinite(vecs))
    # real embeddings, not zero padding
    assert np.linalg.norm(vecs, axis=1).min() > 0


def test_reads_bundled_mapping_and_ids_match_documents():
    ids = read_mapping(REF / "data" / "faiss_index.bin.mapping")
    assert len(ids) == 23
    doc_ids = {d["id"] for d in json.loads(
        (REF / "data" / "documents.json").read_text())}
    assert set(ids) == doc_ids


def test_import_into_vector_store_self_similarity(tmp_path):
    store = VectorStore(dimension=384, metric="L2",
                        index_path=tmp_path / "idx.tpu")
    n = store.import_faiss(REF / "data" / "faiss_index.bin")
    assert n == 23 and store.ntotal == 23
    vecs, ids, _ = import_faiss_index(REF / "data" / "faiss_index.bin")
    # each stored vector's nearest neighbor is itself, at distance ~0,
    # mapped back to ITS doc id (the shuffled reference mapping order)
    dists, got = store.search(vecs, k=1)
    assert [g[0] for g in got] == ids
    assert max(d[0] for d in dists) < 1e-3


def test_import_persists_through_own_codec(tmp_path):
    p = tmp_path / "idx.tpu"
    store = VectorStore(dimension=384, metric="L2", index_path=p)
    store.import_faiss(REF / "data" / "faiss_index.bin")
    store.save_index()
    reloaded = VectorStore(dimension=384, metric="L2", index_path=p)
    assert reloaded.ntotal == 23
    assert reloaded.doc_ids == store.doc_ids


def test_missing_mapping_falls_back_to_sequential(tmp_path):
    vecs = np.random.default_rng(0).standard_normal((5, 8)).astype(np.float32)
    f = tmp_path / "solo.bin"
    _write_flat(f, vecs)
    got, ids, metric = import_faiss_index(f)
    assert ids == [0, 1, 2, 3, 4] and metric == "L2"
    np.testing.assert_allclose(got, vecs)


def test_byte_count_convention_and_ip_fourcc(tmp_path):
    vecs = np.random.default_rng(1).standard_normal((4, 16)).astype(np.float32)
    f = tmp_path / "codes.bin"
    _write_flat(f, vecs, fourcc=b"IxFI", metric_enum=0, count=4 * 16 * 4)
    got, _, metric = import_faiss_index(f)
    assert metric == "IP"
    np.testing.assert_allclose(got, vecs)


def test_rejects_non_flat_and_corrupt_files(tmp_path):
    vecs = np.zeros((2, 4), np.float32)
    ivf = tmp_path / "ivf.bin"
    _write_flat(ivf, vecs, fourcc=b"IwFl")  # IVF-flat fourcc
    with pytest.raises(FaissImportError, match="IwFl"):
        read_flat_index(ivf)
    bad_count = tmp_path / "bad.bin"
    _write_flat(bad_count, vecs, count=999)
    with pytest.raises(FaissImportError, match="neither"):
        read_flat_index(bad_count)
    untrained = tmp_path / "untrained.bin"
    _write_flat(untrained, vecs, trained=0)
    with pytest.raises(FaissImportError, match="implausible"):
        read_flat_index(untrained)


def test_mapping_unpickler_refuses_code_execution(tmp_path):
    class Evil:
        def __reduce__(self):
            return (print, ("pwned",))

    mp = tmp_path / "evil.mapping"
    mp.write_bytes(pickle.dumps(Evil()))
    with pytest.raises(pickle.UnpicklingError):
        read_mapping(mp)


def test_metric_mismatch_raises(tmp_path):
    store = VectorStore(dimension=384, metric="IP",
                        index_path=tmp_path / "idx.tpu")
    with pytest.raises(ValueError, match="L2"):
        store.import_faiss(REF / "data" / "faiss_index.bin")
