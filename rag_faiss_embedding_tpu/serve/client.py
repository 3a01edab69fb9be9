"""Interactive API client REPL.

Capability parity with ``4-api-rag-search.py``: POSTs
``{"text": query, "top_k": k}`` to ``/search`` (``:91-94``), renders the
``similar_documents`` hits (title / score / content preview) and the
``generated_response`` text (``:96-107``), numeric drill-down detail view,
connection-error handling, ``exit`` to quit. Presentation (layout, styling,
prompts) is this repo's own; only the request/response contract and column
semantics are parity.
"""

from __future__ import annotations

import argparse
import asyncio
import sys
from typing import List, Optional

from ..core.logging import get_logger

logger = get_logger(__name__)

PREVIEW_CHARS = 200


def _preview(text: str, limit: int = PREVIEW_CHARS) -> str:
    text = text or ""
    return text if len(text) <= limit else text[: limit - 1] + "…"


class APISearch:
    def __init__(self, api_url: str = "http://localhost:8000/search",
                 top_k: int = 3):
        from rich.console import Console

        self.api_url = api_url
        self.top_k = top_k
        self.console = Console()

    def print_results(self, results: List[dict], interactive: bool = True) -> None:
        from rich import box
        from rich.table import Table

        if not results:
            self.console.print("[yellow]server returned no matches[/]")
            return
        table = Table(title=f"top {len(results)} matches",
                      box=box.SIMPLE_HEAVY, header_style="bold")
        table.add_column("#", justify="right")
        table.add_column("Title", style="bright_blue", no_wrap=False)
        table.add_column("Score", justify="right")
        table.add_column("Preview")
        for i, doc in enumerate(results, 1):
            table.add_row(str(i), doc.get("title") or "(untitled)",
                          f"{doc.get('score', 0):.3f}",
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
        meta.add_row("score", f"{doc.get('score', 0):.3f}")
        self.console.print(Panel(meta, box=box.ROUNDED, title="result"))
        self.console.print(doc.get("content") or "(no content)")

    async def query_once(self, session, query: str) -> Optional[dict]:
        import aiohttp

        try:
            async with session.post(
                self.api_url, json={"text": query, "top_k": self.top_k}
            ) as response:
                if response.status == 200:
                    return await response.json()
                detail = await response.text()
                self.console.print(
                    f"[bold red]server replied {response.status}[/] — {detail}"
                )
        except aiohttp.ClientError as e:
            self.console.print(
                f"[bold red]cannot reach {self.api_url}[/] ({e}) — "
                "is the server up? try scripts/serve.sh"
            )
        return None

    async def search_loop(self, interactive: bool = True) -> None:
        import aiohttp

        self.console.print(
            f"[bold]rag-faiss-embedding-tpu API client[/] → {self.api_url}\n"
            "type a query, or 'exit' when done"
        )
        async with aiohttp.ClientSession() as session:
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
                data = await self.query_once(session, query)
                if data is None:
                    continue
                self.print_results(data.get("similar_documents", []),
                                   interactive=interactive)
                if data.get("generated_response"):
                    self.console.print(
                        "[bold]answer:[/] " + data["generated_response"]
                    )


def main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser(description="RAG API search client")
    parser.add_argument("--url", default="http://localhost:8000/search")
    parser.add_argument("--top-k", type=int, default=3)
    args = parser.parse_args(argv)
    searcher = APISearch(api_url=args.url, top_k=args.top_k)
    asyncio.run(searcher.search_loop(interactive=sys.stdin.isatty()))


if __name__ == "__main__":
    main()
