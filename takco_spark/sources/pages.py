"""Page sources (SURVEY.md S8): WARC archives and line-page files → a page
table ``(url, about, html)`` that feeds S9's table extraction.

Reference semantics (/root/reference/takco/extract/pages.py):
- ``WarcPages`` (:64-105): iterate WARC *response* records; the page URL is
  the ``WARC-Target-URI`` header, an optional entity URI rides in a
  ``?about=`` suffix that is split off; the record body (after the HTTP
  headers) is the page HTML.
- ``LinePages`` (:107-155): each line is ``<url><whitespace><json-string>``
  where the JSON string literal holds the HTML; an optional ``title_regex``
  extracts the 'about' entity from the URL.

Spark shape: WARC files arrive whole via the ``binaryFile`` source and are
parsed per file inside ``mapInPandas`` with a stdlib WARC record walker
(warcio is not in the sandbox; WARC/1.0 framing is
``WARC/1.0\\r\\n<headers>\\r\\n\\r\\n<Content-Length bytes>\\r\\n\\r\\n``).
Gzipped archives (.warc.gz) are decompressed with stdlib gzip. Line pages
are a plain distributed text scan — JVM-side splitting and JSON-literal
decoding, no Python.

The ``Download`` source (live HTTP fetch per entity) is intentionally NOT
reproduced: a web-scale engine ingests from an archived crawl, and the
sandbox has no network. Its output shape IS this page table — a user lands
downloaded pages as files/WARC and enters here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGE_SCHEMA = "url string, about string, html string"


def _iter_warc_records(data: bytes):
    """Yield (headers: dict, payload: bytes) for each WARC/1.0 record."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] in (b"\r\n",) :
            pos += 2
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            return
        head = data[pos:head_end].decode("utf-8", "replace")
        if not head.startswith("WARC/"):
            return
        headers = {}
        for line in head.split("\r\n")[1:]:
            if ":" in line:
                k, v = line.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body_start = head_end + 4
        payload = data[body_start:body_start + length]
        yield headers, payload
        pos = body_start + length


def _parse_warc_pages(name: str, content: bytes) -> list[tuple[str, str | None, str]]:
    import gzip

    if name.endswith(".gz"):
        content = gzip.decompress(content)
    out = []
    for headers, payload in _iter_warc_records(content):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri", "")
        about = None
        if "?about=" in url:
            url, about = url.rsplit("?about=", 1)
        # response payload = HTTP headers + body; body follows the blank line
        sep = payload.find(b"\r\n\r\n")
        body = payload[sep + 4:] if sep >= 0 else payload
        out.append((url, about, body.decode("utf-8", "replace")))
    return out


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """S8 WarcPages: WARC(.gz) files → (url, about, html), one input row per
    archive (binaryFile source), records parsed Arrow-batched per file."""
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path).select("path", "content")

    def parse(batches):
        for pdf in batches:
            urls, abouts, htmls = [], [], []
            for name, content in zip(pdf["path"], pdf["content"]):
                for url, about, html in _parse_warc_pages(name, bytes(content)):
                    urls.append(url)
                    abouts.append(about)
                    htmls.append(html)
            yield pd.DataFrame({"url": urls, "about": abouts, "html": htmls})

    return raw.mapInPandas(parse, schema=PAGE_SCHEMA)


def read_line_pages(spark: SparkSession, path: str,
                    title_regex: str | None = None) -> DataFrame:
    """S8 LinePages: '<url> <json-html-string>' lines → (url, about, html).

    Pure JVM: whitespace split + JSON string-literal decode via from_json on
    a wrapped object; ``title_regex`` group 1 (regexp_extract) becomes
    'about', else the url itself (reference LinePages.load)."""
    lines = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    url = F.regexp_extract("value", r"^(\S+)\s", 1)
    raw_json = F.regexp_replace("value", r"^\S+\s+", "")
    html = F.from_json(
        F.concat(F.lit('{"h":'), raw_json, F.lit("}")), "h string"
    )["h"]
    about = (
        F.regexp_extract(url, title_regex, 1) if title_regex else url
    )
    return lines.select(
        url.alias("url"),
        F.when(F.length(about) > 0, about).otherwise(url).alias("about"),
        html.alias("html"),
    ).where(F.col("html").isNotNull())
