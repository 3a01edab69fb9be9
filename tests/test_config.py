import numpy as np
import pytest

from rag_faiss_embedding_tpu.core import Config


def test_defaults(tmp_path):
    cfg = Config(base_dir=tmp_path)
    assert cfg.vector_dimension == 384
    assert cfg.index_metric == "L2"
    assert cfg.top_k == 5
    assert cfg.data_dir == tmp_path / "data"
    assert cfg.db_path == tmp_path / "data" / "documents.db"


def test_validation():
    with pytest.raises(ValueError):
        Config(index_metric="COSINE")
    with pytest.raises(ValueError):
        Config(batch_size=0)
    with pytest.raises(ValueError):
        Config(top_k=-1)
    with pytest.raises(ValueError):
        Config(model_name="")


def test_dotenv_and_env_overrides(tmp_path, monkeypatch):
    (tmp_path / ".env").write_text("RFE_BATCH_SIZE=64\nRFE_INDEX_METRIC=IP\n")
    monkeypatch.setenv("RFE_TOP_K", "9")
    cfg = Config.from_env(base_dir=tmp_path)
    assert cfg.batch_size == 64
    assert cfg.index_metric == "IP"
    assert cfg.top_k == 9


def test_kwargs_beat_env(tmp_path, monkeypatch):
    monkeypatch.setenv("RFE_TOP_K", "9")
    cfg = Config.from_env(base_dir=tmp_path, top_k=2)
    assert cfg.top_k == 2


def test_setup_directories(tmp_path):
    cfg = Config(base_dir=tmp_path)
    cfg.setup_directories()
    assert cfg.data_dir.is_dir() and cfg.logs_dir.is_dir()


def test_ivf_balance_knob(tmp_path, monkeypatch):
    from rag_faiss_embedding_tpu.core.config import Config

    cfg = Config(base_dir=tmp_path, ivf_balance="reassign")
    assert cfg.validate()
    with pytest.raises(ValueError, match="ivf_balance"):
        Config(base_dir=tmp_path, ivf_balance="shuffle").validate()


def test_ivf_ip_int8_config_composes_end_to_end(tmp_path):
    """index_kind=ivf with metric=IP and dtype=int8 — the two round-1
    'silently impossible' combinations — now construct and search through
    the manager's index plumbing."""
    from rag_faiss_embedding_tpu.core.config import Config
    from rag_faiss_embedding_tpu.index.ivf import IVFFlatIndex

    cfg = Config(base_dir=tmp_path, index_kind="ivf", index_metric="IP",
                 index_dtype="int8", ivf_nlist=4, ivf_nprobe=4,
                 ivf_balance="reassign")
    assert cfg.validate()
    idx = IVFFlatIndex(8, nlist=cfg.ivf_nlist, nprobe=cfg.ivf_nprobe,
                       metric=cfg.index_metric, dtype=cfg.index_dtype,
                       balance=cfg.ivf_balance)
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((64, 8)).astype(np.float32)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    idx.build(pts)
    _, ids = idx.search(pts[5], 1, nprobe=4)
    assert int(np.asarray(ids)[0, 0]) == 5


def test_int8_selector_auto_resolves_to_rerank(tmp_path, monkeypatch):
    """The gated int8 flat config (VERDICT r2 #2): configuring
    ``index_dtype=int8`` through Config/env yields selector='rerank' — the
    only int8 config that passes the 0.99 recall gate (docs/PERF.md) — and
    it threads through to a working FlatIndex."""
    cfg = Config(base_dir=tmp_path, index_dtype="int8")
    assert cfg.search_selector == "rerank"
    # float dtypes keep the exact selector
    assert Config(base_dir=tmp_path).search_selector == "exact"
    # env route (what a deployment actually sets)
    monkeypatch.setenv("RFE_INDEX_DTYPE", "int8")
    assert Config.from_env(base_dir=tmp_path).search_selector == "rerank"

    from rag_faiss_embedding_tpu.index import FlatIndex

    idx = FlatIndex(16, dtype=cfg.index_dtype, selector=cfg.search_selector)
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((64, 16)).astype(np.float32)
    idx.add(pts)
    _, ids = idx.search(pts[:4], 3)
    assert (np.asarray(ids)[:, 0] == np.arange(4)).all()


def test_rerank_selector_requires_int8(tmp_path):
    with pytest.raises(ValueError, match="rerank"):
        Config(base_dir=tmp_path, index_dtype="float32",
               search_selector="rerank")
    # explicit rerank + int8 is fine
    cfg = Config(base_dir=tmp_path, index_dtype="int8",
                 search_selector="rerank")
    assert cfg.search_selector == "rerank"
