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
