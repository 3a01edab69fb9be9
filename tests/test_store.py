from rag_faiss_embedding_tpu.store import Database


def docs():
    return [
        {"id": 3, "url": "https://a.example/x", "title": "X", "content": "xx"},
        {"id": 7, "url": "https://a.example/y", "title": "Y", "content": "yy"},
    ]


def test_insert_and_fetch(tmp_path):
    db = Database(tmp_path / "d.db")
    ids = db.insert_documents(docs())
    assert ids == [3, 7]
    assert db.get_document_count() == 2
    doc = db.get_document_by_id(7)
    assert doc["title"] == "Y"
    assert doc["created_at"]
    assert db.fetch_document(3)["url"] == "https://a.example/x"


def test_autoincrement_ids(tmp_path):
    db = Database(tmp_path / "d.db")
    ids = db.insert_documents(
        [{"url": "https://a/1", "title": "t", "content": "c"},
         {"url": "https://a/2", "title": "t", "content": "c"}]
    )
    assert ids == [1, 2]
    assert db.get_document_id_by_url("https://a/2") == 2


def test_replace_on_conflict(tmp_path):
    db = Database(tmp_path / "d.db")
    db.insert_documents(docs())
    db.insert_documents([{"id": 3, "url": "https://a.example/x",
                          "title": "X2", "content": "new"}])
    assert db.get_document_count() == 2
    assert db.get_document_by_id(3)["content"] == "new"


def test_batched_lookup_preserves_order(tmp_path):
    db = Database(tmp_path / "d.db")
    db.insert_documents(docs())
    got = db.get_documents_by_ids([7, 99, 3])
    assert got[0]["id"] == 7
    assert got[1] is None
    assert got[2]["id"] == 3


def test_fetch_all(tmp_path):
    db = Database(tmp_path / "d.db")
    db.insert_documents(docs())
    all_docs = db.fetch_all_documents()
    assert [d["id"] for d in all_docs] == [3, 7]


def test_duplicate_ids_get_fresh_dicts(tmp_path):
    db = Database(tmp_path / "d.db")
    db.insert_documents(docs())
    a, b = db.get_documents_by_ids([3, 3])
    a["distance"] = 1.0
    assert "distance" not in b  # no aliasing between duplicate hits


def test_delete_documents(tmp_path):
    db = Database(tmp_path / "d.db")
    ids = db.insert_documents([
        {"url": f"https://ex/{i}", "content": f"doc {i}"} for i in range(5)
    ])
    assert db.delete_documents(ids[1:3]) == 2
    assert db.get_document_count() == 3
    assert db.get_document_by_id(ids[1]) is None
    # absent / repeated ids are no-ops
    assert db.delete_documents(ids[1:3]) == 0
    assert db.delete_documents([]) == 0


def test_delete_document_by_url(tmp_path):
    db = Database(tmp_path / "d.db")
    [did] = db.insert_documents([{"url": "https://ex/one", "content": "x"}])
    assert db.delete_document_by_url("https://ex/one") == did
    assert db.delete_document_by_url("https://ex/one") is None
    assert db.get_document_count() == 0
