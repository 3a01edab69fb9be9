"""End-to-end demo on the bundled example corpus.

    python examples/demo.py [workdir]

Ingests examples/corpus/*.html, builds the index, runs a few searches with
generated answers, then demonstrates persistence by reloading in a second
manager. Runs on TPU when available, CPU otherwise.
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from rag_faiss_embedding_tpu.cli.pipeline import run_pipeline
from rag_faiss_embedding_tpu.core import Config
from rag_faiss_embedding_tpu.models.generator import AnswerGenerator
from rag_faiss_embedding_tpu.rag import QueryEngine, RAGManager


def main() -> None:
    workdir = Path(sys.argv[1]) if len(sys.argv) > 1 else Path(
        tempfile.mkdtemp(prefix="rfe_demo_")
    )
    corpus = Path(__file__).parent / "corpus"
    print(f"workdir: {workdir}")

    cfg = Config.from_env(base_dir=workdir)
    n = run_pipeline(
        base_dir=str(workdir),
        html_root=str(corpus),
        url_prefix="https://example.com",
        config=cfg,
    )
    print(f"\nindexed {n} documents\n")

    manager = RAGManager(config=cfg)
    manager.load_indices()
    engine = QueryEngine(
        manager.db, manager.vector_store, manager.embedder,
        generator=AnswerGenerator(backend="auto"),
    )
    for query in (
        "how does the matrix unit multiply matrices",
        "what does an inverted file index trade off",
        "how is the database sharded across chips",
    ):
        print(f"Q: {query}")
        results = engine.search(query, top_k=2)
        for doc in results:
            print(f"   [{doc['score']:.3f}] {doc['title']}: "
                  f"{doc['content'][:90]}...")
        print(f"A: {engine.generate_response(query, results)}\n")

    # second session: everything reloads from disk
    m2 = RAGManager(config=cfg)
    m2.load_indices()
    hits = m2.search_similar_documents("contrastive training of encoders", k=1)
    print(f"reloaded index answers too: {hits[0]['title']}")


if __name__ == "__main__":
    main()
