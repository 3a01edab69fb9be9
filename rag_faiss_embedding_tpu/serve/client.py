"""Interactive API client REPL.

Capability parity with ``4-api-rag-search.py``: POSTs
``{"text": query, "top_k": 3}`` to ``/search`` (``:91-94``), renders the
``similar_documents`` table with Score column and 200-char previews plus the
``generated_response`` panel (``:96-107``), numeric drill-down detail view,
connection-error handling, ``exit`` to quit.
"""

from __future__ import annotations

import argparse
import asyncio
import sys
from typing import List, Optional

from ..core.logging import get_logger

logger = get_logger(__name__)


class APISearch:
    def __init__(self, api_url: str = "http://localhost:8000/search",
                 top_k: int = 3):
        from rich.console import Console

        self.api_url = api_url
        self.top_k = top_k
        self.console = Console()

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
        table.add_column("Score", justify="right", style="green")
        table.add_column("Content Preview", style="white")
        for i, doc in enumerate(results, 1):
            content = doc.get("content", "N/A")
            preview = content[:200] + "..." if len(content) > 200 else content
            table.add_row(str(i), doc.get("title", "N/A"),
                          f"{doc.get('score', 0):.3f}", preview)
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
                f"[bold cyan]Score:[/] {doc.get('score', 0):.3f}\n"
                f"\n[bold cyan]Content:[/]\n{doc.get('content', 'N/A')}"
            ),
            title="Document Details",
            expand=False,
        ))

    async def query_once(self, session, query: str) -> Optional[dict]:
        import aiohttp
        from rich.panel import Panel

        try:
            async with session.post(
                self.api_url, json={"text": query, "top_k": self.top_k}
            ) as response:
                if response.status == 200:
                    return await response.json()
                error_text = await response.text()
                self.console.print(Panel(
                    f"API request failed with status {response.status}\n"
                    f"Details: {error_text}",
                    title="Error", style="bold red",
                ))
        except aiohttp.ClientError as e:
            self.console.print(Panel(
                f"Error connecting to API server: {e}\n"
                f"Make sure the API server is running at {self.api_url}",
                title="Connection Error", style="bold red",
            ))
        return None

    async def search_loop(self, interactive: bool = True) -> None:
        import aiohttp
        from rich.panel import Panel

        self.console.print(Panel(
            "[bold]Welcome to RAG API Search[/]\n"
            "Enter your search queries below, or type 'exit' to quit\n"
            f"API URL: {self.api_url}",
            style="bold blue",
        ))
        async with aiohttp.ClientSession() as session:
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
                data = await self.query_once(session, query)
                if data is None:
                    continue
                self.print_results(data.get("similar_documents", []),
                                   interactive=interactive)
                if data.get("generated_response"):
                    self.console.print(Panel(
                        data["generated_response"],
                        title="Generated Response", style="green",
                    ))


def main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser(description="RAG API search client")
    parser.add_argument("--url", default="http://localhost:8000/search")
    parser.add_argument("--top-k", type=int, default=3)
    args = parser.parse_args(argv)
    searcher = APISearch(api_url=args.url, top_k=args.top_k)
    asyncio.run(searcher.search_loop(interactive=sys.stdin.isatty()))


if __name__ == "__main__":
    main()
