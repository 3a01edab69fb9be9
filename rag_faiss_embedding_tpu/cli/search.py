"""Interactive CLI search REPL.

Capability parity with ``2-cli-rag-search.py``: rich results table
(Doc# / Title / Similarity / 200-char content preview), similarity displayed
as ``1/(1+distance)`` (``2-cli-rag-search.py:48``), numeric drill-down into a
detail panel, progress spinner, ``exit`` to quit.

Also usable non-interactively (queries on stdin), which the reference's
``console.input`` loop happens to support too.
"""

from __future__ import annotations

import argparse
import sys
from typing import List, Optional

from ..core.config import Config
from ..core.logging import get_logger
from ..rag.manager import RAGManager

logger = get_logger(__name__)


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
        from rich.panel import Panel
        from rich.table import Table

        if not results:
            self.console.print(
                Panel("No documents found.", title="Search Results", style="yellow")
            )
            return
        table = Table(title="Search Results", show_header=True,
                      header_style="bold magenta")
        table.add_column("Doc #", style="dim", width=6)
        table.add_column("Title", style="cyan")
        table.add_column("Similarity", justify="right", style="green")
        table.add_column("Content Preview", style="white")
        for i, doc in enumerate(results, 1):
            content = doc.get("content", "N/A")
            preview = content[:200] + "..." if len(content) > 200 else content
            table.add_row(str(i), doc.get("title", "N/A"),
                          f"{self.similarity(doc):.3f}", preview)
        self.console.print(table)
        if not interactive:
            return
        self.console.print(
            "\nFor detailed view of a document, enter its number "
            "(or press Enter to continue)"
        )
        try:
            choice = input("> ").strip()
        except EOFError:
            return
        if choice.isdigit() and 1 <= int(choice) <= len(results):
            self.show_detailed_view(results[int(choice) - 1])

    def show_detailed_view(self, doc: dict) -> None:
        from rich.panel import Panel
        from rich.text import Text

        self.console.print("\n")
        self.console.print(Panel(
            Text.from_markup(
                f"[bold cyan]Title:[/] {doc.get('title', 'N/A')}\n"
                f"[bold cyan]URL:[/] {doc.get('url', 'N/A')}\n"
                f"[bold cyan]Similarity Score:[/] {self.similarity(doc):.3f}\n"
                f"\n[bold cyan]Content:[/]\n{doc.get('content', 'N/A')}"
            ),
            title="Document Details",
            expand=False,
        ))

    def search(self, query: str, k: Optional[int] = None) -> List[dict]:
        try:
            return self.manager.search_similar_documents(query, k)
        except Exception as e:
            logger.error("search error: %s", e)
            return []

    def search_loop(self, interactive: bool = True) -> None:
        from rich.panel import Panel

        self.console.print(Panel(
            "[bold]Welcome to RAG CLI Search[/]\n"
            "Enter your search queries below, or type 'exit' to quit",
            style="bold blue",
        ))
        while True:
            try:
                if interactive:
                    query = self.console.input(
                        "\n[bold yellow]Enter search query:[/] "
                    )
                else:
                    query = input()
            except (EOFError, KeyboardInterrupt):
                break
            if query.strip().lower() == "exit":
                self.console.print("\n[bold green]Goodbye![/]")
                break
            if not query.strip():
                continue
            if interactive:
                with self.console.status("[green]Searching..."):
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
