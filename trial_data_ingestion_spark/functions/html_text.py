"""HTML → text extraction for web-corpus ingestion (the step between
``sources.warc`` and the curation pipeline).

Pure stdlib (``html.parser.HTMLParser``) in an Arrow-batched kernel:
script/style/template subtrees are dropped, block-level boundaries
become newlines, entities are decoded by the parser itself, and the
page ``<title>`` rides along as its own column.  This is
tag-stripping extraction, not boilerplate removal — the downstream
hygiene gates (repetition ratios, quality score, LID) are the
engine's boilerplate defense, per the curation pipeline's design.

Spark shape: stateless per-row kernel, no shuffle, streaming-safe —
the same contract as the chunkers and the BPE tokenizer.
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Iterator

from pyspark.sql import DataFrame

_SKIP = {"script", "style", "template", "noscript", "svg", "head"}
_BLOCK = {"p", "div", "br", "li", "ul", "ol", "h1", "h2", "h3", "h4",
          "h5", "h6", "tr", "table", "section", "article", "header",
          "footer", "blockquote", "pre", "hr", "figure", "nav",
          "aside", "main"}


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list = []
        self.title_parts: list = []
        self._skip_depth = 0
        self._in_title = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
        if tag == "title":
            self._in_title = True
        if tag in _BLOCK:
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in _SKIP and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag == "title":
            self._in_title = False
        if tag in _BLOCK:
            self.parts.append("\n")

    def handle_data(self, data):
        if self._in_title:
            self.title_parts.append(data)
        # <title> lives inside <head> (a skip tag) — title capture
        # above runs regardless; body text only outside skips
        if self._skip_depth == 0 and not self._in_title:
            self.parts.append(data)


def extract_text(html: str) -> tuple:
    """(title, text): entity-decoded visible text with block tags as
    newline boundaries; whitespace normalized per line."""
    p = _TextExtractor()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass          # truncated/hostile markup: keep what parsed
    title = " ".join("".join(p.title_parts).split()) or None
    lines = []
    for raw_line in "".join(p.parts).split("\n"):
        line = " ".join(raw_line.split())
        if line:
            lines.append(line)
    return title, "\n".join(lines)


class _LinkExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)


def extract_links(html: str, base_url: str | None = None) -> list:
    """Ordered, de-duplicated outbound link URLs from anchor hrefs;
    relative hrefs resolve against ``base_url`` (RFC 3986 join);
    fragment-only and non-http(s) schemes (mailto:, javascript:)
    are dropped."""
    from urllib.parse import urljoin, urlparse

    p = _LinkExtractor()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass
    out, seen = [], set()
    for h in p.hrefs:
        h = h.strip()
        if not h or h.startswith("#"):
            continue
        u = urljoin(base_url, h) if base_url else h
        scheme = urlparse(u).scheme
        if scheme not in ("http", "https"):
            continue
        if u not in seen:
            seen.add(u)
            out.append(u)
    return out


def html_to_links(df: DataFrame, html_col: str = "html",
                  base_url_col: str | None = "url",
                  out_col: str = "links") -> DataFrame:
    """Attach ``out_col array<string>`` of outbound absolute URLs —
    the crawl-side feed for ``operators.graph.domain_edges`` /
    ``pagerank`` (same stateless Arrow kernel contract as
    ``html_to_text``)."""
    import pandas as pd

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    out_schema = f"{fields}, {out_col} array<string>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            links = []
            bases = (pdf[base_url_col] if base_url_col in pdf.columns
                     else [None] * len(pdf))
            for h, b in zip(pdf[html_col], bases):
                if isinstance(h, (bytes, bytearray)):
                    h = bytes(h).decode("utf-8", "replace")
                links.append(extract_links(
                    h, b if isinstance(b, str) else None))
            pdf = pdf.copy()
            pdf[out_col] = links
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def html_to_text(df: DataFrame, html_col: str = "html",
                 text_col: str = "text",
                 title_col: str = "title") -> DataFrame:
    """Attach extracted ``text_col``/``title_col``: one Arrow pass."""
    import pandas as pd

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    out_schema = f"{fields}, {title_col} string, {text_col} string"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            titles, texts = [], []
            for h in pdf[html_col]:
                if isinstance(h, (bytes, bytearray)):
                    h = bytes(h).decode("utf-8", "replace")
                t, x = extract_text(h)
                titles.append(t)
                texts.append(x)
            pdf = pdf.copy()
            pdf[title_col] = titles
            pdf[text_col] = texts
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)
