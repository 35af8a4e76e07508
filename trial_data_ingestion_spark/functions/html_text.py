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


_STRUCTURAL_BP = {"nav", "aside", "footer", "header"}
_HEADINGS = {"h1", "h2", "h3", "h4", "h5", "h6"}


class _BlockExtractor(HTMLParser):
    """Segments the page into text blocks at block-tag boundaries,
    tracking per block: the chars emitted inside ``<a>`` subtrees
    (link density), whether the block sits inside a structural
    boilerplate container (nav/aside/header/footer), and whether it
    opened as a heading."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list = []          # (text, link_chars, in_bp, heading)
        self._parts: list = []
        self._link_chars = 0
        self._skip_depth = 0
        self._anchor_depth = 0
        self._bp_depth = 0
        self._heading = False
        self._in_title = False

    def _flush(self):
        text = " ".join("".join(self._parts).split())
        if text:
            self.blocks.append((text, self._link_chars, self._bp_depth > 0,
                                self._heading))
        self._parts = []
        self._link_chars = 0
        self._heading = False

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self._skip_depth += 1
        if tag == "title":
            self._in_title = True
        if tag == "a":
            self._anchor_depth += 1
        if tag in _STRUCTURAL_BP:
            self._flush()
            self._bp_depth += 1
        elif tag in _BLOCK:
            self._flush()
        if tag in _HEADINGS:
            self._heading = True

    def handle_endtag(self, tag):
        if tag in _SKIP and self._skip_depth > 0:
            self._skip_depth -= 1
        if tag == "title":
            self._in_title = False
        if tag == "a" and self._anchor_depth > 0:
            self._anchor_depth -= 1
        if tag in _STRUCTURAL_BP:
            self._flush()
            if self._bp_depth > 0:
                self._bp_depth -= 1
        elif tag in _BLOCK:
            self._flush()

    def handle_data(self, data):
        if self._skip_depth == 0 and not self._in_title:
            self._parts.append(data)
            if self._anchor_depth > 0:
                self._link_chars += len(data)


def extract_main_content(html: str, min_words: int = 5,
                         max_link_density: float = 0.4,
                         min_stopword_density: float = 0.0,
                         stopwords: frozenset | None = None) -> tuple:
    """jusText-lite boilerplate removal: ``(main_text, kept_blocks,
    total_blocks, removed_char_frac)``.

    Two deterministic passes over the block list (no trained model):

    1. Each block is GOOD if it has ``>= min_words`` words, link
       density ``<= max_link_density``, and (when a stopword set is
       given) stopword density ``>= min_stopword_density``; BAD if it
       is link-dominated or sits inside nav/aside/header/footer;
       otherwise SHORT (undecided).
    2. SHORT blocks inherit GOOD from an adjacent GOOD neighbor —
       jusText's context rule, which keeps headings and short
       connective paragraphs inside article bodies while dropping
       isolated short fragments (button labels, copyright lines).

    ``min_stopword_density=0`` disables the stopword gate (the right
    default for code and non-English corpora); pass
    ``textstats.STOPWORDS['en']`` semantics via ``stopwords`` to
    enable it for English web text.
    """
    p = _BlockExtractor()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass          # truncated/hostile markup: keep what parsed
    p._flush()
    blocks = p.blocks
    if not blocks:
        return "", 0, 0, 0.0

    classes = []      # 1 good, 0 short, -1 bad
    for text, link_chars, in_bp, _heading in blocks:
        ld = link_chars / max(len(text), 1)
        if in_bp or ld > max_link_density:
            classes.append(-1)
            continue
        words = text.split()
        if len(words) < min_words:
            classes.append(0)
            continue
        if stopwords is not None and min_stopword_density > 0:
            sw = sum(1 for w in words if w.lower().strip(".,;:!?\"'()")
                     in stopwords)
            if sw / len(words) < min_stopword_density:
                classes.append(-1)
                continue
        classes.append(1)

    final = list(classes)
    for i, c in enumerate(classes):
        if c == 0:
            prev_good = i > 0 and classes[i - 1] == 1
            next_good = i + 1 < len(classes) and classes[i + 1] == 1
            final[i] = 1 if (prev_good or next_good) else -1

    kept = [blocks[i][0] for i in range(len(blocks)) if final[i] == 1]
    total_chars = sum(len(b[0]) for b in blocks)
    kept_chars = sum(len(t) for t in kept)
    removed_frac = ((total_chars - kept_chars) / total_chars
                    if total_chars else 0.0)
    return "\n".join(kept), len(kept), len(blocks), removed_frac


def html_to_main_text(df: DataFrame, html_col: str = "html",
                      text_col: str = "main_text",
                      min_words: int = 5,
                      max_link_density: float = 0.4,
                      min_stopword_density: float = 0.0,
                      stopword_lang: str | None = None) -> DataFrame:
    """Attach boilerplate-stripped ``text_col`` plus audit columns
    ``kept_blocks``/``total_blocks``/``removed_char_frac`` — the
    content-extraction step between ``html_to_text`` (tag stripping)
    and the hygiene gates.  Same stateless Arrow-kernel contract as
    ``html_to_text``: no shuffle, streaming-safe; the stopword set
    (when ``stopword_lang`` is given) is a module constant on the
    executor, not a broadcast."""
    import pandas as pd

    sw = None
    if stopword_lang is not None:
        from ..operators.textstats import STOPWORDS
        sw = frozenset(STOPWORDS[stopword_lang])

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    out_schema = (f"{fields}, {text_col} string, kept_blocks int, "
                  f"total_blocks int, removed_char_frac double")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, keptc, totc, fracs = [], [], [], []
            for h in pdf[html_col]:
                if isinstance(h, (bytes, bytearray)):
                    h = bytes(h).decode("utf-8", "replace")
                t, k, n, fr = extract_main_content(
                    h, min_words=min_words,
                    max_link_density=max_link_density,
                    min_stopword_density=min_stopword_density,
                    stopwords=sw)
                texts.append(t)
                keptc.append(k)
                totc.append(n)
                fracs.append(fr)
            pdf = pdf.copy()
            pdf[text_col] = texts
            pdf["kept_blocks"] = keptc
            pdf["total_blocks"] = totc
            pdf["removed_char_frac"] = fracs
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


class _LinkExtractor(HTMLParser):
    """Collects (href, anchor text) pairs; text accumulates between
    an anchor's open and close tags (nested anchors are invalid HTML
    — the inner open implicitly closes the outer, matching browser
    recovery)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.hrefs: list = []          # (href, [text parts])
        self._open = False

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            self._open = False
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append((v, []))
                    self._open = True
                    break

    def handle_endtag(self, tag):
        if tag == "a":
            self._open = False

    def handle_data(self, data):
        if self._open and self.hrefs:
            self.hrefs[-1][1].append(data)


def extract_links(html: str, base_url: str | None = None,
                  with_text: bool = False) -> list:
    """Ordered, de-duplicated outbound link URLs from anchor hrefs;
    relative hrefs resolve against ``base_url`` (RFC 3986 join);
    fragment-only and non-http(s) schemes (mailto:, javascript:)
    are dropped.  With ``with_text`` each entry is an
    ``(url, anchor_text)`` pair (first occurrence's text,
    whitespace-normalized, empty string for imageless/empty anchors)
    — anchor text is the classic relevance signal for link-graph
    features and URL-level quality models."""
    from urllib.parse import urljoin, urlparse

    p = _LinkExtractor()
    try:
        p.feed(html or "")
        p.close()
    except Exception:
        pass
    out, seen = [], set()
    for h, parts in p.hrefs:
        h = h.strip()
        if not h or h.startswith("#"):
            continue
        u = urljoin(base_url, h) if base_url else h
        scheme = urlparse(u).scheme
        if scheme not in ("http", "https"):
            continue
        if u not in seen:
            seen.add(u)
            out.append((u, " ".join("".join(parts).split()))
                       if with_text else u)
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


def html_to_anchor_links(df: DataFrame, html_col: str = "html",
                         base_url_col: str | None = "url",
                         out_col: str = "anchor_links") -> DataFrame:
    """Attach ``out_col array<struct<url string, anchor string>>`` —
    outbound links WITH their anchor text (the relevance signal
    link-graph features and URL quality models train on).  Same
    dedup/scheme rules as :func:`html_to_links`; same stateless
    Arrow-kernel contract."""
    import pandas as pd

    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in df.schema.fields)
    out_schema = (f"{fields}, {out_col} "
                  f"array<struct<url: string, anchor: string>>")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            links = []
            bases = (pdf[base_url_col] if base_url_col in pdf.columns
                     else [None] * len(pdf))
            for h, b in zip(pdf[html_col], bases):
                if isinstance(h, (bytes, bytearray)):
                    h = bytes(h).decode("utf-8", "replace")
                links.append(extract_links(
                    h, b if isinstance(b, str) else None,
                    with_text=True))
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
