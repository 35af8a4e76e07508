"""Springer OA JATS source S10 + escaped-XML record extraction X9
(SURVEY.md §2.1/§2.4).

The reference's Springer connector (``sources/springer.py:122-316``,
upstream-disabled with "IGNORE FOR NOW") wraps the public Springer
Nature Open Access API: one ``?q=doi:<doi>`` GET returns an outer
response holding ``<record>`` elements whose JATS payload arrives in
one of three shapes, tried in order (springer.py:120-152):

  A) a direct ``<article>`` descendant;
  B) an ``<xml>`` wrapper whose *text* is escaped (often double- or
     triple-escaped) JATS — multi-unescape, reparse, find article;
  C) last-ditch: regex-scan the record's unescaped text for
     ``<article ...>...</article>``.

The record whose ``article-id[pub-id-type=doi]`` matches the
requested DOI wins; otherwise the first extractable record
(springer.py:245-263).  Parse semantics (title / abstract / body /
"Springer: ..." failure taxonomy) reuse the shared JATS kernel, which
already mirrors the namespace-agnostic matching both reference
connectors share.

P13 full-unescape: ``multi_unescape`` below is the exact reference
semantics (stdlib ``html.unescape`` in a <=3-round loop,
springer.py:108-116) and owns full fidelity — named, decimal and hex
entities, semicolon-less forms.  The Column-side
``functions.text.html_multi_unescape`` handles the named + numeric
forms natively so relational pipelines stay codegen'd.

Spark-side: ``map_springer`` is the same mapInPandas connector shape
as ``map_efetch`` — partition parallelism replaces the reference's
sequential loop, the per-partition RateLimiter keeps the global rate
under Springer's ~90 rpm cap (choose ``df.repartition(n)`` from the
rate budget: n x per-partition rpm <= 90).
"""

from __future__ import annotations

import html
import re
import xml.etree.ElementTree as ET
from typing import Callable, Dict, Iterator, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from trial_data_ingestion_spark.schemas import SECTIONS
from trial_data_ingestion_spark.sources.http_connector import RateLimiter
from trial_data_ingestion_spark.sources.jats import (
    _find, _find_all, _get_text, _local, parse_article_element,
)

SPRINGER_RPM = 90  # springer.py:86 — default ~1.5 rps


def multi_unescape(s: str, max_rounds: int = 3) -> str:
    """P13 — repeated HTML entity unescape (springer.py:108-116):
    full ``html.unescape`` semantics per round (named + ``&#NNN;`` +
    ``&#xHH;``), up to ``max_rounds`` or until a fixed point."""
    prev = s
    for _ in range(max_rounds):
        cur = html.unescape(prev)
        if cur == prev:
            break
        prev = cur
    return prev


def parse_retry_after(header_val: Optional[str]) -> float:
    """Seconds to wait from a Retry-After header — integer-seconds or
    HTTP-date form (springer.py:48-64)."""
    if not header_val:
        return 0.0
    try:
        return max(0.0, float(header_val))
    except (TypeError, ValueError):
        pass
    try:
        from datetime import datetime, timezone
        from email.utils import parsedate_to_datetime
        dt = parsedate_to_datetime(header_val)
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return max(0.0, (dt - datetime.now(timezone.utc)).total_seconds())
    except Exception:  # noqa: BLE001 — malformed header -> no wait
        return 0.0


# ---------------------------------------------------------------------------
# X9 — escaped-XML record extraction
# ---------------------------------------------------------------------------

_ARTICLE_RE = re.compile(r"<article\b[\s\S]*?</article>", re.IGNORECASE)


def _parse_fragment(xml: str):
    try:
        return ET.fromstring(xml)
    except ET.ParseError:
        return None


def extract_article_from_record(rec) -> Optional[ET.Element]:
    """X9 — the three-way ladder of springer.py:120-152 over an
    ElementTree ``<record>`` element."""
    # A) direct JATS descendant
    if _local(rec.tag) == "article":
        return rec
    art = _find(rec, "article")
    if art is not None:
        return art

    # B) <xml> wrapper holding escaped JATS as text
    xml_tag = _find(rec, "xml")
    if xml_tag is not None:
        raw = "".join(xml_tag.itertext())
        if raw.strip():
            inner = _parse_fragment(multi_unescape(raw))
            if inner is not None:
                if _local(inner.tag) == "article":
                    return inner
                art = _find(inner, "article")
                if art is not None:
                    return art

    # C) regex scan of the record's unescaped text
    txt = "".join(rec.itertext())
    m = _ARTICLE_RE.search(multi_unescape(txt))
    if m:
        inner = _parse_fragment(m.group(0))
        if inner is not None and _local(inner.tag) == "article":
            return inner
    return None


def _article_doi(article) -> str:
    for aid in _find_all(article, "article-id"):
        if (aid.get("pub-id-type") or "").lower() == "doi":
            return _get_text(aid, "").strip().lower()
    return ""


def parse_springer_response(xml: str, requested_doi: str
                            ) -> Tuple[Optional[dict], Optional[str]]:
    """S10 — outer response -> best-matching parsed article, with the
    reference's failure taxonomy (springer.py:238-266,280-316)."""
    root = _parse_fragment(xml)
    if root is None:
        return None, "Springer: no <record>"
    records = ([root] if _local(root.tag) == "record"
               else _find_all(root, "record"))
    if not records:
        return None, "Springer: no <record>"

    requested = (requested_doi or "").strip().lower()
    best = None
    for rec in records:
        art = extract_article_from_record(rec)
        if art is None:
            continue
        if _article_doi(art) == requested:
            best = art
            break
        if best is None:
            best = art
    if best is None:
        return None, "Springer: no JATS <article> found"

    parsed = parse_article_element(best)
    if parsed["error"]:
        # the kernel's "No sections/text" maps to the Springer-branded
        # form (springer.py:314)
        return None, f"Springer: {parsed['error'].lower()}"
    return parsed, None


# ---------------------------------------------------------------------------
# Fetchers
# ---------------------------------------------------------------------------

class SpringerFixtureFetcher:
    """Offline test double: DOI -> canned outer-response XML."""

    def __init__(self, doi_to_response: Dict[str, str]):
        self._responses = doi_to_response
        self.calls = 0

    def springer_jats(self, doi: str) -> Tuple[Optional[dict],
                                               Optional[str]]:
        self.calls += 1
        payload = self._responses.get(doi)
        if payload is None:
            return None, "Springer HTTP 404"
        return parse_springer_response(payload, doi)


class SpringerLiveFetcher:
    """Live connector for the public Springer Nature OA API.  Requires
    network + requests + an API key; never used in tests.  Retry
    semantics follow springer.py:186-238: honor Retry-After on 429,
    exponential backoff on 5xx/network errors, 6 attempts."""

    BASE = "https://api.springernature.com/openaccess/jats"

    def __init__(self, api_key: str, timeout: int = 45,
                 rpm: int = SPRINGER_RPM, max_attempts: int = 6,
                 backoff: float = 0.75):
        if not api_key:
            # mirrors the reference's early "SPRINGER_API_KEY not set"
            # failure (springer.py:178-180)
            raise ValueError("SPRINGER_API_KEY not set")
        import requests  # deferred: offline envs never import this
        self._session = requests.Session()
        self._session.headers.update({"User-Agent": "spark-graft/0.1"})
        self._key = api_key
        self._timeout = timeout
        self._limiter = RateLimiter(rpm)
        self._max_attempts = max_attempts
        self._backoff = backoff

    def springer_jats(self, doi: str) -> Tuple[Optional[dict],
                                               Optional[str]]:
        import time as _time
        import requests
        last_err = None
        for attempt in range(1, self._max_attempts + 1):
            self._limiter.acquire()
            try:
                resp = self._session.get(
                    self.BASE, params={"q": f"doi:{doi}",
                                       "api_key": self._key},
                    timeout=self._timeout)
            except requests.RequestException as exc:
                last_err = f"Springer request error: {exc}"
                if attempt < self._max_attempts:
                    _time.sleep(self._backoff ** attempt)
                continue
            if resp.status_code == 200:
                # 200 is final even when blank: the reference breaks
                # out of the retry loop on any 200 and reports the
                # empty body (springer.py:228-230)
                if not resp.content.strip():
                    return None, "Springer: empty response"
                return parse_springer_response(resp.text, doi)
            if resp.status_code == 429:
                wait = (parse_retry_after(resp.headers.get("Retry-After"))
                        or self._backoff ** attempt)
                _time.sleep(min(wait, 60.0))
                last_err = "Springer HTTP 429"
                continue
            last_err = f"Springer HTTP {resp.status_code}"
            if attempt < self._max_attempts:
                _time.sleep(self._backoff ** attempt)
        return None, last_err or "Springer: empty response"


# ---------------------------------------------------------------------------
# Spark operator
# ---------------------------------------------------------------------------

_SPRINGER_SCHEMA = T.StructType([
    T.StructField("doi_norm", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("sections", SECTIONS),
    T.StructField("abstract", T.StringType()),
    T.StructField("fetch_error", T.StringType()),
])


def map_springer(df: DataFrame, fetcher_factory: Callable,
                 key_col: str = "doi_norm") -> DataFrame:
    """S10 — distributed Springer OA fetch + parse, one row per input
    DOI (resolved or failure-tagged), same connector contract as
    ``map_efetch``."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetcher = fetcher_factory()
        for pdf in batches:
            rows = []
            for doi in pdf[key_col]:
                if not doi:
                    continue
                rec, err = fetcher.springer_jats(doi)
                if rec is None:
                    rows.append((doi, None, [], None, err))
                else:
                    rows.append((doi, rec["title"], rec["sections"],
                                 rec["abstract"], None))
            yield pd.DataFrame(
                rows, columns=["doi_norm", "title", "sections",
                               "abstract", "fetch_error"])

    return (df.select(key_col).where(f"{key_col} is not null").distinct()
              .mapInPandas(run, _SPRINGER_SCHEMA))
