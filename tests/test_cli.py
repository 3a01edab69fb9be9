import json

import pytest

from rag_faiss_embedding_tpu.cli.admin import AdminTool
from rag_faiss_embedding_tpu.cli.search import CLISearch
from rag_faiss_embedding_tpu.cli.selfindex import process_python_files
from rag_faiss_embedding_tpu.core import Config
from rag_faiss_embedding_tpu.rag import RAGManager

from .test_rag import DOCS, SMALL


@pytest.fixture
def manager(tmp_path):
    from rag_faiss_embedding_tpu.models import EmbeddingPipeline

    embedder = EmbeddingPipeline(model_name="offline-test", cfg=SMALL,
                                 max_seq_length=64)
    embedder.fit_tokenizer([d["content"] for d in DOCS], vocab_size=300)
    cfg = Config(base_dir=tmp_path, vector_dimension=32)
    (tmp_path / "data").mkdir(exist_ok=True)
    (tmp_path / "data" / "documents.json").write_text(json.dumps(DOCS))
    m = RAGManager(config=cfg, embedder=embedder)
    m.vector_store.index._use_pallas = False
    return m


def test_cli_search_one_shot(manager, capsys):
    manager.initialize_database()
    cli = CLISearch(manager=manager)
    results = cli.search(DOCS[0]["content"], k=2)
    assert results[0]["id"] == 9
    cli.print_results(results, interactive=False)
    out = capsys.readouterr().out
    assert "jax.html" in out and "Similarity" in out


def test_cli_similarity_convention(manager):
    # 1/(1+distance) display convention (2-cli-rag-search.py:48)
    assert CLISearch.similarity({"distance": 0.0}) == 1.0
    assert CLISearch.similarity({"distance": 3.0}) == 0.25


def test_cli_empty_results_panel(manager, capsys):
    manager.initialize_database()
    cli = CLISearch(manager=manager)
    cli.print_results([], interactive=False)
    assert "no matches" in capsys.readouterr().out


def test_admin_tool_flow(manager, capsys):
    admin = AdminTool(manager=manager)
    n = admin.initialize()
    assert n == 3
    assert admin.document_count() == 3
    assert admin.verify_system() is True
    admin.test_search(DOCS[2]["content"])
    out = capsys.readouterr().out
    assert "VERIFY: OK" in out
    assert "db.html" in out
    # option 8: deletion by id and by url (persists both stores)
    assert admin.delete_document("4") == 1
    assert admin.delete_document("https://ex/jax") == 1
    assert admin.delete_document("https://nope") == 0
    assert admin.document_count() == 1
    results = admin.manager.search_similar_documents(DOCS[0]["content"], k=3)
    assert [r["id"] for r in results] == [1]


def test_process_python_files(tmp_path):
    (tmp_path / "a.py").write_text("print('hello')\n")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "b.py").write_text("x = 1\n")
    docs = process_python_files(tmp_path)
    assert [d["url"] for d in docs] == ["a.py", "sub/b.py"]
    assert docs[0]["title"] == "a.py"


def test_pipeline_end_to_end(tmp_path, manager):
    from rag_faiss_embedding_tpu.cli.pipeline import run_pipeline

    site = tmp_path / "site"
    site.mkdir()
    (site / "doc.html").write_text(
        "<html><body><main><p>JAX compiles numerical programs with XLA "
        "for TPU accelerators. It traces python functions.</p></main>"
        "</body></html>"
    )
    n = run_pipeline(
        base_dir=str(tmp_path),
        html_root=str(site),
        config=manager.config,
        manager=manager,
    )
    assert n == 1
    results = manager.search_similar_documents("jax compiles programs", k=1)
    assert results and "compiles" in results[0]["content"].lower()


def test_ingest_json_with_validation(tmp_path, manager):
    import json as _json

    from rag_faiss_embedding_tpu.cli.ingest_json import ingest_json

    raw = [
        {"url": "example.com/good", "title": "Good",
         "content": "this document easily has more than ten words of real "
                    "content inside it. definitely enough."},
        {"url": "", "title": "bad", "content": "too short"},
    ]
    p = tmp_path / "search-index.json"
    p.write_text(_json.dumps(raw))
    n = ingest_json(manager, p, validate=True)
    assert n == 1
    assert manager.db.get_document_count() == 1
    results = manager.search_similar_documents("real content document", k=1)
    assert results and results[0]["url"] == "https://example.com/good"
