"""HTML corpus ingestion and extractive summarization.

Capability parity with the reference's ``TextSummarizer``
(``process_unstructured_html.py:64-287``): walk ``**/*.html`` skipping
``index.html``, strip script/style/nav/footer/header while preserving
``<pre>`` blocks, prefer main/article/section content, regex-clean the text,
summarize to <= ``max_sentences`` key sentences / <= ``max_content_length``
chars with near-duplicate-sentence suppression (similarity > 0.7), assign
incremental integer ids, and write ``data/documents.json`` entries with
``id,url,title,content,created_at,updated_at``.

Differences by design:
- spaCy sentence segmentation + word vectors are replaced by a regex
  splitter and TF cosine similarity (utils/text.py) — no model downloads.
- The id counter is thread-safe (``itertools.count`` under the GIL); the
  reference increments a bare class attribute from ThreadPoolExecutor workers
  (``process_unstructured_html.py:42-46,276-280``), an actual data race that
  shuffles the bundled ``faiss_index.bin.mapping``.
- Entries are collected in deterministic sorted-path order.
"""

from __future__ import annotations

import itertools
import json
import re
from concurrent.futures import ThreadPoolExecutor
from datetime import datetime, timezone
from pathlib import Path
from typing import List, Optional

from ..core.logging import get_logger
from ..utils.text import cosine_sim, sentence_split, tf_vector

logger = get_logger(__name__)

DEFAULT_MAX_CONTENT_LENGTH = 512
DEFAULT_MAX_SENTENCES = 2
_SIMILARITY_DEDUP = 0.7


class IndexEntry:
    """One summarized document (reference ``process_unstructured_html.py:40-62``).

    Ids default to a thread-safe incremental counter; ``generate_index``
    re-assigns them in deterministic sorted-path order after the parallel
    extraction completes (the reference increments the counter from worker
    threads, which both races and shuffles ids by completion order — the
    bundled ``faiss_index.bin.mapping`` is shuffled for exactly this reason).
    """

    _counter = itertools.count(1)

    def __init__(self, url: str, title: str, content: str,
                 max_content_length: int = DEFAULT_MAX_CONTENT_LENGTH,
                 id: Optional[int] = None):
        self.id = next(IndexEntry._counter) if id is None else id
        self.url = url
        self.title = title
        self.content = content[:max_content_length] if content else ""
        now = datetime.now(timezone.utc)
        self.created_at = now
        self.updated_at = now

    def to_dict(self) -> dict:
        return {
            "id": self.id,
            "url": self.url,
            "title": self.title,
            "content": self.content,
            "created_at": self.created_at.isoformat(),
            "updated_at": self.updated_at.isoformat(),
        }

    @classmethod
    def reset_counter(cls) -> None:
        cls._counter = itertools.count(1)


def clean_text(text: str) -> str:
    """Normalize extracted text (reference ``clean_text``, ``:219-232``)."""
    text = re.sub(r"\b(menu|html|title|include|nav|header|footer)\b", "", text,
                  flags=re.IGNORECASE)
    text = re.sub(r"[^\w\s\.\!\?-]", " ", text)
    text = re.sub(r"-+", " ", text)
    text = re.sub(r"\s+", " ", text)
    text = re.sub(r"\.+", ".", text)
    return text.strip()


class HtmlIngestor:
    def __init__(
        self,
        output_dir: str | Path = "data",
        url_prefix: str = "",
        max_content_length: int = DEFAULT_MAX_CONTENT_LENGTH,
        max_sentences: int = DEFAULT_MAX_SENTENCES,
    ):
        self.output_dir = Path(output_dir).resolve()
        self.url_prefix = url_prefix.rstrip("/")
        self.max_content_length = max_content_length
        self.max_sentences = max_sentences

    # ------------------------------------------------------------- extract
    def extract_text_from_html(self, soup) -> str:
        """Reference ``extract_text_from_html`` semantics (``:144-165``)."""
        pre_tags = soup.find_all("pre")
        pre_contents = [tag.extract() for tag in pre_tags]
        for element in soup(["script", "style", "nav", "footer", "header"]):
            element.decompose()
        content_areas = soup.find_all(["main", "article", "section"])
        if content_areas:
            text = " ".join(
                area.get_text(separator=" ", strip=True) for area in content_areas
            )
        else:
            text = soup.get_text(separator=" ", strip=True)
        pre_texts = "\n".join(pre.get_text() for pre in pre_contents)
        return f"{text}\n{pre_texts}" if pre_texts else text

    # ----------------------------------------------------------- summarize
    def extract_key_sentences(self, text: str) -> List[str]:
        """Position+length heuristic with near-duplicate suppression
        (reference ``extract_key_sentences``, ``:111-142``; spaCy vector
        similarity replaced by TF cosine)."""
        sentences = sentence_split(text)
        if not sentences:
            return []
        key: List[str] = []
        key_vecs = []
        if len(sentences[0].split()) >= 3:
            key.append(sentences[0])
            key_vecs.append(tf_vector(sentences[0]))
        for sent in sentences[1:]:
            if len(sent.split()) < 3:
                continue
            vec = tf_vector(sent)
            if key_vecs and any(
                cosine_sim(vec, kv) > _SIMILARITY_DEDUP for kv in key_vecs
            ):
                continue
            key.append(sent)
            key_vecs.append(vec)
            if len(key) >= self.max_sentences:
                break
        return key

    def summarize_text(self, text: str) -> str:
        """Reference ``summarize_text`` (``:167-188``)."""
        if not text.strip():
            return ""
        summary = " ".join(self.extract_key_sentences(text))
        if len(summary) > self.max_content_length:
            summary = summary[: self.max_content_length]
            last_period = summary.rfind(".")
            if last_period > 0:
                summary = summary[: last_period + 1]
        return summary.strip()

    # -------------------------------------------------------------- files
    def process_html_file(self, file_path: Path, root: Path) -> Optional[IndexEntry]:
        try:
            from bs4 import BeautifulSoup

            with open(file_path, "r", encoding="utf-8") as f:
                soup = BeautifulSoup(f, "html.parser")
            text = clean_text(self.extract_text_from_html(soup))
            if not text:
                logger.warning("skipping %s: no meaningful content", file_path)
                return None
            content = self.summarize_text(text)
            rel = file_path.relative_to(root)
            url = f"{self.url_prefix}/{rel}" if self.url_prefix else str(rel)
            return IndexEntry(
                url=url.strip(),
                title=file_path.name,
                content=content,
                max_content_length=self.max_content_length,
            )
        except Exception as e:
            logger.error("error processing %s: %s", file_path, e)
            return None

    def generate_index(self, root: str | Path = ".") -> List[dict]:
        """Walk HTML files, summarize, write documents.json
        (reference ``generate_index``, ``:257-287``)."""
        root = Path(root).resolve()
        html_files = sorted(
            p for p in root.rglob("*.html")
            if p.name != "index.html" and self.output_dir not in p.parents
        )
        if not html_files:
            logger.warning("no HTML files found under %s", root)
            return []
        logger.info("found %d HTML files to process", len(html_files))
        with ThreadPoolExecutor() as executor:
            entries = list(
                filter(None, executor.map(
                    lambda p: self.process_html_file(p, root), html_files
                ))
            )
        # Deterministic ids: executor.map preserves input order, so number
        # the surviving entries 1..n in sorted-path order.
        for i, e in enumerate(entries, start=1):
            e.id = i
        valid = [
            e.to_dict() for e in entries if e.url and e.title and e.content
        ]
        if not valid:
            logger.error("no valid entries generated")
            return []
        self.write_index_file(valid)
        return valid

    def write_index_file(self, entries: List[dict]) -> None:
        self.output_dir.mkdir(parents=True, exist_ok=True)
        out = self.output_dir / "documents.json"
        out.write_text(json.dumps(entries, indent=2, ensure_ascii=False))
        logger.info("wrote %s with %d entries", out, len(entries))
