"""HTML table extraction (SURVEY.md S9): pages → span-structured documents.

Reference semantics: takco's Extractor parses each ``<table>`` and expands
``colspan``/``rowspan`` into a dense cell GRID — a spanned cell's text is
replicated into every grid position it covers
(/root/reference/takco/extract/htmltables.py:50-140, based on
html-table-extractor); page extraction walks all tables per page
(/root/reference/takco/extract/pages.py).

Spark shape: identical to :func:`takco_spark.sources.readers.read_csv_tables`
— wholetext read, Arrow-batched ``mapInPandas``, one output document per
table, spans in row-major grid order. The parser is the stdlib
``html.parser`` (the sandbox has no bs4/lxml; the reference's bs4 walk maps
1:1 onto these start/end-tag callbacks).

Span mapping: ``<th>`` → kind='header'; ``<td>`` → 'cell'; a cell containing
an ``<a href>`` becomes kind='mention' with ``media_ref`` = the href (the
span model's typed-link slot — takco cells carry surfaceLinks the same way,
/root/reference/takco/table.py:76-132).
"""

from __future__ import annotations

from html.parser import HTMLParser

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from takco_spark.spans import DOCUMENT_SCHEMA


class _Cell:
    __slots__ = ("text", "header", "href", "colspan", "rowspan")

    def __init__(self, header: bool):
        self.text: list[str] = []
        self.header = header
        self.href: str | None = None
        self.colspan = 1
        self.rowspan = 1


class _TableParser(HTMLParser):
    """Collect (possibly multiple) tables from one page; nested tables fold
    their text into the enclosing cell (the reference treats only the
    outermost table as structure)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.tables: list[list[list[_Cell]]] = []
        self._depth = 0          # <table> nesting depth
        self._rows: list[list[_Cell]] | None = None
        self._row: list[_Cell] | None = None
        self._cell: _Cell | None = None

    def _flush_row(self) -> None:
        """Append the open row (if any) to the table — called on explicit
        </tr>, on an implied closure (next <tr> start), and on </table>."""
        if self._rows is not None and self._row is not None:
            if self._row:
                self._rows.append(self._row)
            self._row = None
        self._cell = None

    @staticmethod
    def _span(attrs, name: str) -> int:
        for k, v in attrs:
            if k == name:
                try:
                    return max(1, int(v))
                except (TypeError, ValueError):
                    return 1
        return 1

    def handle_starttag(self, tag, attrs):
        if tag == "table":
            self._depth += 1
            if self._depth == 1:
                self._rows = []
            return
        if self._depth != 1 or self._rows is None:
            return
        if tag == "tr":
            # implied </tr>: HTML5 allows omitting row/cell end tags — a new
            # <tr> with a row still open must flush it, not drop it
            self._flush_row()
            self._row = []
        elif tag in ("td", "th") and self._row is not None:
            self._cell = None  # implied </td>/</th>
            self._cell = _Cell(header=(tag == "th"))
            self._cell.colspan = self._span(attrs, "colspan")
            self._cell.rowspan = self._span(attrs, "rowspan")
            self._row.append(self._cell)
        elif tag == "a" and self._cell is not None:
            for k, v in attrs:
                if k == "href" and v and self._cell.href is None:
                    self._cell.href = v

    def handle_endtag(self, tag):
        if tag == "table":
            if self._depth == 1:
                self._flush_row()  # implied </tr> before </table>
                if self._rows:
                    self.tables.append(self._rows)
                self._rows = None
            self._depth = max(0, self._depth - 1)
            return
        if self._depth != 1:
            return
        if tag == "tr":
            self._flush_row()
        elif tag in ("td", "th"):
            self._cell = None

    def handle_data(self, data):
        if self._cell is not None and self._depth >= 1:
            self._cell.text.append(data)


def _expand_grid(rows: list[list[_Cell]]) -> list[list[_Cell | None]]:
    """colspan/rowspan → dense grid; spanned cells replicated into every
    covered position (reference Extractor.parse semantics)."""
    grid: dict[tuple[int, int], _Cell] = {}
    n_cols = 0
    for r, row in enumerate(rows):
        c = 0
        for cell in row:
            while (r, c) in grid:
                c += 1
            for dr in range(cell.rowspan):
                for dc in range(cell.colspan):
                    grid.setdefault((r + dr, c + dc), cell)
            c += cell.colspan
            n_cols = max(n_cols, c)
    n_rows = (max(r for r, _ in grid) + 1) if grid else 0
    return [
        [grid.get((r, c)) for c in range(n_cols)] for r in range(n_rows)
    ]


def tables_from_html(html: str) -> list[list[list[_Cell | None]]]:
    """Parse one page → list of dense cell grids (driver-free helper, also
    used directly in tests)."""
    p = _TableParser()
    p.feed(html or "")
    p.close()
    return [_expand_grid(t) for t in p.tables]


def _grid_to_spans(grid) -> list[dict]:
    spans, off = [], 0
    for row in grid:
        for cell in row:
            if cell is None:
                text, kind, ref = "", "cell", ""
            else:
                text = " ".join(" ".join(cell.text).split())
                ref = cell.href or ""
                kind = (
                    "header" if cell.header
                    else ("mention" if ref else "cell")
                )
            spans.append({
                "kind": kind, "text": text, "media_ref": ref, "offset": off,
            })
            off += 1
    return spans


def html_pages_to_documents(pages: DataFrame, id_col: str = "url",
                            html_col: str = "html") -> DataFrame:
    """(id, html) page table → one span document per ``<table>`` on each
    page (doc_id = '<id>#t<k>'). The S8→S9 composition point: any page
    source (files, WARC, line pages) feeds this."""
    import pandas as pd

    src = pages.select(F.col(id_col).alias("_pid"), F.col(html_col).alias("_html"))

    def parse(batches):
        for pdf in batches:
            doc_ids, spans_col = [], []
            for pid, content in zip(pdf["_pid"], pdf["_html"]):
                for k, grid in enumerate(tables_from_html(content)):
                    doc_ids.append(f"{pid}#t{k}")
                    spans_col.append(_grid_to_spans(grid))
            yield pd.DataFrame({"doc_id": doc_ids, "spans": spans_col})

    return src.mapInPandas(parse, schema=DOCUMENT_SCHEMA)


def read_html_tables(spark: SparkSession, path: str) -> DataFrame:
    """S9: HTML page files → one document per ``<table>``.

    doc_id = '<file>#t<k>'; spans are the dense grid in row-major order with
    kinds header/cell/mention and media_ref = first link href. Distributed
    one-page-per-row via wholetext + mapInPandas — no driver-side parsing.
    """
    raw = spark.read.text(path, wholetext=True).select(
        F.input_file_name().alias("page"), "value"
    )
    return html_pages_to_documents(raw, id_col="page", html_col="value")
