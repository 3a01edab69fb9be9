import json

import pytest

from rag_faiss_embedding_tpu.ingest import DocumentValidator, HtmlIngestor, IndexEntry
from rag_faiss_embedding_tpu.ingest.html import clean_text
from rag_faiss_embedding_tpu.utils.text import sentence_split

HTML = """<html><head><title>Page</title>
<script>var x = 1;</script><style>.a{}</style></head>
<body><nav>Skip me</nav><header>Skip header</header>
<main><p>JAX is a numerical computing library. It compiles programs with XLA.
JAX is a numerical computing library for accelerators.</p></main>
<pre>code block preserved</pre>
<footer>Skip footer</footer></body></html>"""


@pytest.fixture
def corpus_dir(tmp_path):
    (tmp_path / "site").mkdir()
    (tmp_path / "site" / "page1.html").write_text(HTML)
    (tmp_path / "site" / "page2.html").write_text(
        "<html><body><p>FAISS searches dense vectors efficiently. "
        "It supports exact and approximate indexes.</p></body></html>"
    )
    (tmp_path / "site" / "index.html").write_text("<html><body>skip</body></html>")
    return tmp_path


def test_sentence_split_abbreviations():
    s = sentence_split("Dr. Smith arrived. He sat down. Then Mr. Jones left.")
    assert len(s) == 3


def test_clean_text_removes_html_words_and_specials():
    out = clean_text("The menu and nav bar! [with] *specials* -- and dots...")
    assert "menu" not in out and "nav" not in out
    assert "[" not in out and "*" not in out
    assert "..." not in out


def test_extract_strips_chrome_preserves_pre(corpus_dir):
    from bs4 import BeautifulSoup

    ing = HtmlIngestor(output_dir=corpus_dir / "data")
    soup = BeautifulSoup(HTML, "html.parser")
    text = ing.extract_text_from_html(soup)
    assert "Skip me" not in text and "Skip header" not in text
    assert "Skip footer" not in text and "var x" not in text
    assert "code block preserved" in text
    assert "numerical computing" in text


def test_summarize_dedups_similar_sentences():
    ing = HtmlIngestor(max_sentences=3)
    text = ("JAX is a numerical computing library. "
            "JAX is a numerical computing library for accelerators. "
            "SQLite is an embedded database engine.")
    key = ing.extract_key_sentences(text)
    assert len(key) == 2  # near-duplicate second sentence suppressed
    assert "SQLite" in key[1]


def test_generate_index_writes_documents_json(corpus_dir):
    IndexEntry.reset_counter()
    ing = HtmlIngestor(output_dir=corpus_dir / "data",
                       url_prefix="https://example.com")
    entries = ing.generate_index(root=corpus_dir)
    assert len(entries) == 2  # index.html skipped
    assert entries[0]["id"] == 1 and entries[1]["id"] == 2
    assert entries[0]["url"].startswith("https://example.com/site/")
    assert all(e["content"] for e in entries)
    on_disk = json.loads((corpus_dir / "data" / "documents.json").read_text())
    assert on_disk == entries


def test_content_length_cap(corpus_dir):
    ing = HtmlIngestor(output_dir=corpus_dir / "data", max_content_length=50)
    entries = ing.generate_index(root=corpus_dir)
    assert all(len(e["content"]) <= 50 for e in entries)


# ---------------------------------------------------------------- validator

GOOD_DOC = {
    "url": "example.com/page",
    "title": "  A   Title  ",
    "content": "This is a perfectly reasonable document with more than ten "
               "words of content. It has two sentences!",
}


def test_validate_document_cleans_fields():
    v = DocumentValidator()
    out = v.validate_document(GOOD_DOC)
    assert out["url"] == "https://example.com/page"
    assert out["title"] == "A Title"
    assert out["content"] == out["content"].lower()
    assert out["metadata"]["word_count"] >= 10
    assert out["metadata"]["summary"]


def test_validate_rejects_short_and_missing():
    v = DocumentValidator()
    assert v.validate_document({"url": "x.com", "title": "t", "content": "too short"}) is None
    assert v.validate_document({"title": "t", "content": "x " * 20}) is None
    assert v.validate_document({}) is None


def test_textrank_summary_picks_sentences():
    v = DocumentValidator(summarization_method="textrank", max_summary_sentences=2)
    text = ("jax compiles programs. jax compiles programs quickly. "
            "databases store documents. vectors enable search. "
            "jax compiles numerical programs for accelerators.")
    summary = v.summarize_text(text)
    assert 0 < len(sentence_split(summary)) <= 2


def test_batch_validate_and_run(tmp_path):
    inp = tmp_path / "in.json"
    out = tmp_path / "out.json"
    inp.write_text(json.dumps([GOOD_DOC, {"url": "", "title": "", "content": ""}]))
    v = DocumentValidator(default_input=inp, default_output=out)
    validated = v.run(show_summary=False)
    assert len(validated) == 1
    assert json.loads(out.read_text()) == validated


def test_index_entry_counter_thread_safe():
    """The reference's id counter races under ThreadPoolExecutor
    (process_unstructured_html.py:42-46,276-280); ours must not."""
    from concurrent.futures import ThreadPoolExecutor

    IndexEntry.reset_counter()

    def make(i):
        return IndexEntry(url=f"u{i}", title=f"t{i}", content="c").id

    with ThreadPoolExecutor(max_workers=16) as ex:
        ids = list(ex.map(make, range(500)))
    assert sorted(ids) == list(range(1, 501))  # no duplicates, no gaps


def test_validator_summary_stats_parity():
    """Stats rows match the reference's display_summary computations
    (document_validator.py:238-253): averages, reduction %, extremes."""
    from rag_faiss_embedding_tpu.ingest.validator import DocumentValidator

    v = DocumentValidator(summarization_method="basic")
    docs = v.batch_validate_documents([
        {"url": "http://a.com/x", "title": "Doc A",
         "content": "alpha beta gamma delta epsilon zeta eta theta iota "
                    "kappa lambda mu"},
        {"url": "http://b.com/y", "title": "Doc B",
         "content": "one two three four five six seven eight nine ten "
                    "eleven twelve thirteen fourteen"},
    ])
    stats = dict(v.summary_stats(docs))
    assert stats["Total Documents"] == "2"
    assert stats["Unique URLs"] == "2"
    assert stats["Average Word Count"] == "13.0"
    assert stats["Shortest Document"] == "12"
    assert stats["Longest Document"] == "14"
    assert stats["Summarization Method"] == "basic"
    assert stats["Average Content Reduction"].endswith("%")
    # rendering smoke: rich path and no-docs path both run
    v.display_summary(docs)
    v.display_summary([])


def test_validator_summary_stats_empty():
    """summary_stats is public API: an empty validation run must return an
    empty-corpus table, not ZeroDivisionError."""
    from rag_faiss_embedding_tpu.ingest.validator import DocumentValidator

    rows = DocumentValidator().summary_stats([])
    assert ("Total Documents", "0") in rows
