"""Driver-side fetch utilities — the DAG's extract tasks (SURVEY.md §2.A A1/A2).

Reference behavior: ``dags/ingest_firmographics_to_snowflake.py:24-39`` GETs a
JSON API document and ships it to the stage; ``:43-62`` scrapes the Wikipedia
S&P 500 page with ``pd.read_html(...)`` and keeps table ``[1]``. Both are
orchestrator-side, out-of-cluster steps: they land ONE small source document
which ``read_json_landing`` then loads into the RAW shape. These helpers
close that last mile for users replaying the reference end-to-end.

Design notes:
- Network access is injectable (``opener: url -> bytes``) — air-gapped
  environments, unit tests, and retry/auth policies plug in without
  monkeypatching; the default is stdlib ``urllib`` (no requests dependency).
- Writes are atomic (temp file + ``os.replace``) so a concurrent
  ``read_json_landing`` glob never sees a half-written document.
- The HTML table extractor is a small stdlib ``html.parser`` visitor
  producing the same row-objects ``pd.read_html`` would (header row ->
  dict keys), since lxml/bs4 are not available in this container.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from datetime import datetime, timezone
from html.parser import HTMLParser

Opener = Callable[[str], bytes]


def _default_opener(url: str, timeout: float = 30.0) -> bytes:
    from urllib.request import urlopen

    with urlopen(url, timeout=timeout) as resp:  # noqa: S310 (caller-supplied URL)
        return resp.read()


def _land(out_dir: str, source_name: str, text: str, clock: Callable[[], datetime] | None) -> str:
    ts = (clock or (lambda: datetime.now(timezone.utc)))().strftime("%Y%m%dT%H%M%S")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{source_name}_{ts}.json")
    tmp = path + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(text)
    os.replace(tmp, path)
    return path


def fetch_json_to_landing(
    url: str,
    out_dir: str,
    source_name: str,
    *,
    opener: Opener | None = None,
    clock: Callable[[], datetime] | None = None,
) -> str:
    """GET a JSON document and land it as one timestamped file
    (``DAG:24-39`` analogue). The document is validated as JSON before
    landing (a failed fetch never pollutes the landing dir). Returns the
    landed path, ready for ``read_json_landing(dir, glob=...)``."""
    raw = (opener or _default_opener)(url)
    text = raw.decode("utf-8") if isinstance(raw, (bytes, bytearray)) else raw
    json.loads(text)  # validate early; raises on truncated/HTML error pages
    return _land(out_dir, source_name, text, clock)


class _TableExtractor(HTMLParser):
    """Collects every <table> as a list of rows of stripped cell texts."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: list[list[list[str]]] = []
        self._row: list[str] | None = None
        self._cell: list[str] | None = None
        self._depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "table":
            self._depth += 1
            if self._depth == 1:
                self.tables.append([])
        elif self._depth == 1 and tag == "tr":
            self._row = []
        elif self._depth == 1 and tag in ("td", "th"):
            self._cell = []

    def handle_endtag(self, tag: str) -> None:
        if tag == "table":
            self._depth -= 1
        elif self._depth == 1 and tag in ("td", "th") and self._cell is not None:
            assert self._row is not None
            self._row.append(" ".join("".join(self._cell).split()))
            self._cell = None
        elif self._depth == 1 and tag == "tr" and self._row is not None:
            self.tables[-1].append(self._row)
            self._row = None

    def handle_data(self, data: str) -> None:
        if self._cell is not None:
            self._cell.append(data)


def html_tables(html: str) -> list[list[dict[str, str]]]:
    """All top-level HTML tables as row-object lists (first row = header),
    the shape ``pd.read_html`` + ``to_dict('records')`` would give."""
    parser = _TableExtractor()
    parser.feed(html)
    out: list[list[dict[str, str]]] = []
    for rows in parser.tables:
        if not rows:
            out.append([])
            continue
        header, *body = rows
        out.append([dict(zip(header, r)) for r in body])
    return out


def scrape_table_to_landing(
    url: str,
    out_dir: str,
    source_name: str,
    *,
    table_index: int = 1,
    opener: Opener | None = None,
    clock: Callable[[], datetime] | None = None,
) -> str:
    """Scrape the ``table_index``-th HTML table into a JSON array of
    row-objects and land it (``DAG:43-62`` analogue — the reference keeps
    ``pd.read_html(wiki_url)[1]``). The landed document is exactly the
    wiki RAW payload shape the staging flatten consumes."""
    raw = (opener or _default_opener)(url)
    html = raw.decode("utf-8") if isinstance(raw, (bytes, bytearray)) else raw
    tables = html_tables(html)
    if table_index >= len(tables):
        raise IndexError(
            f"page has {len(tables)} table(s); table_index={table_index} out of range"
        )
    return _land(out_dir, source_name, json.dumps(tables[table_index]), clock)
