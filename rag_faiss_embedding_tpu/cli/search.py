"""Interactive CLI search REPL.

Capability parity with ``2-cli-rag-search.py``: a results table
(doc number / title / similarity / content preview), similarity displayed
as ``1/(1+distance)`` (``2-cli-rag-search.py:48``), numeric drill-down into
a per-document detail view, a busy indicator while the query runs, and
``exit`` to quit. Presentation (layout, styling, prompts) is this repo's
own; only the column semantics and the score convention are parity.

Also usable non-interactively (queries on stdin or argv), which suits
scripted smoke tests.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from ..core.config import Config
from ..core.logging import get_logger
from ..rag.manager import RAGManager

logger = get_logger(__name__)

PREVIEW_CHARS = 200


def _preview(text: str, limit: int = PREVIEW_CHARS) -> str:
    text = text or ""
    return text if len(text) <= limit else text[: limit - 1] + "…"


class CLISearch:
    def __init__(self, manager: Optional[RAGManager] = None,
                 config: Optional[Config] = None):
        from rich.console import Console

        self.console = Console()
        self.manager = manager or RAGManager(config=config)
        self.manager.load_indices()

    @staticmethod
    def similarity(doc: dict) -> float:
        return 1.0 / (1.0 + doc.get("distance", 0.0))

    def print_results(self, results: List[dict], interactive: bool = True) -> None:
        from rich import box
        from rich.table import Table

        if not results:
            self.console.print("[yellow]no matches — try different terms[/]")
            return
        table = Table(title=f"top {len(results)} matches",
                      box=box.SIMPLE_HEAVY, header_style="bold")
        table.add_column("#", justify="right")
        table.add_column("Title", style="bright_blue", no_wrap=False)
        table.add_column("Similarity", justify="right")
        table.add_column("Preview")
        for i, doc in enumerate(results, 1):
            sim = self.similarity(doc)
            table.add_row(str(i), doc.get("title") or "(untitled)",
                          f"{sim:.3f}",
                          _preview(doc.get("content", "")))
        self.console.print(table)
        if not interactive:
            return
        self.console.print(
            f"[dim]open a result? type 1-{len(results)}, blank to skip[/]"
        )
        try:
            choice = input("open> ").strip()
        except EOFError:
            return
        if choice.isdigit() and 1 <= int(choice) <= len(results):
            self.show_detailed_view(results[int(choice) - 1])

    def show_detailed_view(self, doc: dict) -> None:
        from rich import box
        from rich.panel import Panel
        from rich.table import Table

        meta = Table.grid(padding=(0, 1))
        meta.add_column(style="bold", justify="right")
        meta.add_column()
        meta.add_row("title", doc.get("title") or "(untitled)")
        meta.add_row("url", doc.get("url") or "-")
        meta.add_row("similarity", f"{self.similarity(doc):.3f}")
        self.console.print(Panel(meta, box=box.ROUNDED, title="result"))
        self.console.print(doc.get("content") or "(no content)")

    def search(self, query: str, k: Optional[int] = None) -> List[dict]:
        try:
            return self.manager.search_similar_documents(query, k)
        except Exception as e:
            logger.error("search error: %s", e)
            return []

    def search_loop(self, interactive: bool = True) -> None:
        self.console.print(
            "[bold]rag-faiss-embedding-tpu search[/] — "
            "type a query, or 'exit' when done"
        )
        while True:
            try:
                if interactive:
                    query = self.console.input("\n[bold]query>[/] ")
                else:
                    query = input()
            except (EOFError, KeyboardInterrupt):
                break
            if query.strip().lower() == "exit":
                break
            if not query.strip():
                continue
            if interactive:
                with self.console.status("running query on device"):
                    results = self.search(query)
            else:
                results = self.search(query)
            self.print_results(results, interactive=interactive)

    def cleanup(self) -> None:
        self.manager.cleanup()


def main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser(description="Interactive RAG search")
    parser.add_argument("--base-dir", default=".", help="framework base dir")
    parser.add_argument("--top-k", type=int, default=None)
    parser.add_argument("query", nargs="*", help="one-shot query (skips REPL)")
    args = parser.parse_args(argv)
    cfg = Config.from_env(base_dir=args.base_dir)
    searcher = CLISearch(config=cfg)
    try:
        if args.query:
            results = searcher.search(" ".join(args.query), args.top_k)
            searcher.print_results(results, interactive=False)
        else:
            searcher.search_loop(interactive=sys.stdin.isatty())
    finally:
        searcher.cleanup()


if __name__ == "__main__":
    main()
