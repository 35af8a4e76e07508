"""Batched remote-lookup connector pattern S6-S10 (SURVEY.md §2.1/§2.9).

The reference fetches DOI->PMCID mappings (idconv, <=150/call) and
JATS fulltext (EFetch, <=80/call) through a driver-side thread pool
(``preprocessing/fulltext_enricher.py:144-187``).  Spark-first design:

* partition parallelism replaces the thread pool (F2) — each partition
  runs batches sequentially through one session (F3);
* batches are formed *inside* ``mapInPandas`` (F1), so Arrow batch
  size and HTTP batch size decouple;
* tasks are idempotent pure reads, so Spark task retry is safe (F4);
* global request rate ≈ #concurrent partitions x per-partition rate —
  choose ``df.repartition(n)`` from the rate budget, not data size
  (F5; e.g. Springer's 90 rpm cap -> n x per-partition rpm <= 90).

Tests run offline: ``FixtureFetcher`` serves canned responses with the
same result/failure contract as the live NCBI fetcher
(``sources/pmc.py:63-107,213-256``); the live implementation is gated
behind a requests import and mirrors the reference's retry ladder
(3 attempts, ``1.5**attempt`` backoff — pmc.py:14-41).
"""

from __future__ import annotations

import time
from typing import Callable, Dict, Iterator, List, Optional, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from trial_data_ingestion_spark.schemas import SECTIONS

IDCONV_BATCH = 150   # fulltext_enricher.py:111
EFETCH_BATCH = 80    # fulltext_enricher.py:112
BATCH_THROTTLE_SEC = 0.10  # fulltext_enricher.py:114


class RateLimiter:
    """F5 — sliding-window client-side limiter (springer.py:28-45):
    at most ``rpm`` acquisitions per 60s window, per partition."""

    def __init__(self, rpm: int):
        self.rpm = rpm
        self._times: List[float] = []

    def acquire(self) -> None:
        now = time.monotonic()
        self._times = [t for t in self._times if now - t < 60.0]
        if len(self._times) >= self.rpm:
            time.sleep(60.0 - (now - self._times[0]) + 0.01)
        self._times.append(time.monotonic())


def _article_was_found(err: str) -> bool:
    """True when a parse error came from a located <article> (so the
    S8 ladder must surface it) rather than from a response with no
    extractable article (so the ladder should try the next source).
    Matches the reference's try_pmc_jats, which returns
    ``_parse_article(art)`` — error included — as soon as an
    <article> is found (pmc.py:156-209)."""
    return (err != "No <article> element"
            and not err.startswith("XML parse error"))


def retry_with_backoff(fn: Callable, attempts: int = 3,
                       backoff: float = 1.5):
    """F4 — the reference's retry ladder (pmc.py:23-41)."""
    last_err = None
    for attempt in range(attempts):
        try:
            return fn(), None
        except Exception as exc:  # noqa: BLE001 — connector boundary
            last_err = str(exc)
            if attempt < attempts - 1:
                time.sleep(backoff ** attempt)
    return None, last_err


class FixtureFetcher:
    """Deterministic offline fetcher for tests: dict-served lookups
    with the reference's failure taxonomy.

    The three optional dicts model the S8/S9 fallback surfaces
    (pmc.py:156-209,41-58): ``oai_xml`` is the OAI-PMH GetRecord
    store, ``epmc_xml`` the EuropePMC fullTextXML store, and
    ``epmc_doi_to_pmcid`` the EuropePMC search index."""

    def __init__(self, doi_to_pmcid: Dict[str, str],
                 pmcid_to_xml: Dict[str, str],
                 oai_xml: Optional[Dict[str, str]] = None,
                 epmc_xml: Optional[Dict[str, str]] = None,
                 epmc_doi_to_pmcid: Optional[Dict[str, str]] = None):
        self._ids = doi_to_pmcid
        self._xml = pmcid_to_xml
        self._oai = oai_xml or {}
        self._epmc = epmc_xml or {}
        self._epmc_ids = epmc_doi_to_pmcid or {}
        self.idconv_calls = 0
        self.efetch_calls = 0
        self.oai_calls = 0
        self.epmc_calls = 0
        self.epmc_search_calls = 0

    def idconv_batch(self, dois: List[str]
                     ) -> Tuple[Dict[str, str], List[Tuple[str, str]]]:
        self.idconv_calls += 1
        out, fails = {}, []
        for d in dois:
            if d in self._ids:
                out[d] = self._ids[d]
            else:
                fails.append((d, "idconv: no PMCID"))
        return out, fails

    def efetch_batch(self, pmcids: List[str]
                     ) -> Tuple[Dict[str, dict], List[Tuple[str, str]]]:
        from trial_data_ingestion_spark.sources.jats import parse_jats
        self.efetch_calls += 1
        out, fails = {}, []
        for p in pmcids:
            xml = self._xml.get(p)
            if xml is None:
                fails.append((p, "EFetch: article not found in response"))
                continue
            rec = parse_jats(xml)
            if rec["error"]:
                fails.append((p, rec["error"]))
            else:
                out[p] = rec
        return out, fails

    # ---- S8 single-item ladder: EFetch -> OAI-PMH -> EuropePMC ----

    def jats_single(self, pmcid: str) -> Tuple[Optional[dict],
                                               Optional[str]]:
        """Mirror of ``try_pmc_jats`` (pmc.py:156-209): try each
        source in order, return the parse result of the first that
        yields an <article> — including its error (e.g. "No
        sections/text"); only responses with no extractable
        <article> fall through to the next source."""
        from trial_data_ingestion_spark.sources.jats import parse_jats
        for store, counter in ((self._xml, "efetch_calls"),
                               (self._oai, "oai_calls"),
                               (self._epmc, "epmc_calls")):
            setattr(self, counter, getattr(self, counter) + 1)
            xml = store.get(pmcid)
            if xml is None:
                continue
            rec = parse_jats(xml)
            err = rec["error"]
            if err is None:
                return rec, None
            if _article_was_found(err):
                return None, err
        return None, "PMC/EPMC: no JATS <article> found"

    # ---- S9 single DOI -> PMCID with EuropePMC search fallback ----

    def doi_to_pmcid_single(self, doi: str) -> Tuple[Optional[str],
                                                     Optional[str]]:
        """Mirror of ``doi_to_pmcid`` (pmc.py:14-58): idconv first,
        EuropePMC search second, chained failure reasons."""
        self.idconv_calls += 1
        pmcid = self._ids.get(doi)
        if pmcid:
            return pmcid, None
        self.epmc_search_calls += 1
        pmcid = self._epmc_ids.get(doi)
        if pmcid:
            return pmcid, None
        return None, "EuropePMC: no PMCID | idconv: no PMCID"


class LiveNCBIFetcher:
    """Live NCBI connector mirroring sources/pmc.py semantics
    (idconv JSON API + EFetch JATS). Requires network + requests;
    never used in tests."""

    IDCONV_URL = ("https://www.ncbi.nlm.nih.gov/pmc/utils/idconv/v1.0/"
                  "?tool=spark-graft&format=json&ids=")
    EFETCH_URL = ("https://eutils.ncbi.nlm.nih.gov/entrez/eutils/"
                  "efetch.fcgi?db=pmc&retmode=xml&id=")
    OAI_URL = ("https://www.ncbi.nlm.nih.gov/pmc/oai/oai.cgi"
               "?verb=GetRecord&metadataPrefix=pmc"
               "&identifier=oai:pubmedcentral.nih.gov:")
    EPMC_XML_URL = "https://www.ebi.ac.uk/europepmc/webservices/rest/"
    EPMC_SEARCH_URL = ("https://www.ebi.ac.uk/europepmc/webservices/"
                       "rest/search?format=json&query=doi:")

    def __init__(self, timeout: int = 45, rpm: Optional[int] = None):
        import requests  # deferred: offline envs never import this
        self._session = requests.Session()
        self._timeout = timeout
        self._limiter = RateLimiter(rpm) if rpm else None

    def _get(self, url: str) -> str:
        if self._limiter:
            self._limiter.acquire()
        resp = self._session.get(
            url, timeout=self._timeout,
            headers={"User-Agent": "spark-graft/0.1"})
        resp.raise_for_status()
        return resp.text

    def idconv_batch(self, dois):
        import json as _json
        from urllib.parse import quote as _quote
        # Percent-encode each DOI (reserved chars #, &, +, space are
        # all legal in DOIs); the separating commas stay literal —
        # idconv reads ids as a comma-delimited list.
        def call():
            return self._get(self.IDCONV_URL
                             + ",".join(_quote(d, safe="") for d in dois))
        text, err = retry_with_backoff(call)
        if text is None:
            return {}, [(d, f"idconv: {err}") for d in dois]
        out, fails = {}, []
        try:
            records = _json.loads(text).get("records", [])
        except ValueError as exc:
            # non-JSON 200 body is a failure row, not a task failure
            return {}, [(d, f"idconv: bad response: {exc}") for d in dois]
        by_doi = {(r.get("doi") or "").lower(): r.get("pmcid")
                  for r in records}
        for d in dois:
            pmcid = by_doi.get(d.lower())
            if pmcid:
                out[d] = pmcid
            else:
                fails.append((d, "idconv: no PMCID"))
        return out, fails

    def efetch_batch(self, pmcids):
        import re as _re
        from trial_data_ingestion_spark.sources.jats import (
            parse_jats_response,
        )
        nums = [_re.sub(r"\D", "", p) for p in pmcids]
        def call():
            return self._get(self.EFETCH_URL + ",".join(nums))
        text, err = retry_with_backoff(call)
        if text is None:
            return {}, [(p, f"efetch: {err}") for p in pmcids]
        out, fails = {}, []
        parsed = parse_jats_response(text)
        by_pmcid = {r["pmcid"]: r for r in parsed if r.get("pmcid")}
        for p in pmcids:
            rec = by_pmcid.get(p)
            if rec is None:
                fails.append((p, "EFetch: article not found in response"))
            elif rec["error"]:
                fails.append((p, rec["error"]))
            else:
                out[p] = rec
        return out, fails

    # ---- S8 single-item ladder (pmc.py:156-209) ----

    def jats_single(self, pmcid):
        import re as _re
        from trial_data_ingestion_spark.sources.jats import (
            parse_jats_response,
        )
        num = _re.sub(r"\D", "", pmcid or "")
        if not num:
            return None, "Invalid PMCID"
        urls = (self.EFETCH_URL + num,
                self.OAI_URL + num,
                f"{self.EPMC_XML_URL}PMC{num}/fullTextXML")
        for url in urls:
            text, _err = retry_with_backoff(lambda u=url: self._get(u),
                                            attempts=1)
            if not text:
                continue
            # parse_jats_response returns [] when no <article> exists
            # and a synthetic "XML parse error" record for unparseable
            # payloads — both mean "article not found here", so fall
            # through; an actual article's result (error included) is
            # returned immediately (pmc.py:156-209).
            recs = [r for r in parse_jats_response(text)
                    if r["error"] is None or _article_was_found(r["error"])]
            if not recs:
                continue
            rec = recs[0]
            if rec["error"]:
                return None, rec["error"]
            return rec, None
        return None, "PMC/EPMC: no JATS <article> found"

    # ---- S9 single DOI -> PMCID (pmc.py:14-58) ----

    def doi_to_pmcid_single(self, doi):
        import json as _json
        from urllib.parse import quote as _quote
        out, fails = self.idconv_batch([doi])
        if doi in out:
            return out[doi], None
        last_err = fails[0][1] if fails else "idconv: no PMCID"
        # quote the DOI: #, &, +, space are legal in DOIs and would
        # truncate or corrupt the query string unencoded (the
        # reference passes the DOI via requests params=, which encodes)
        text, err = retry_with_backoff(
            lambda: self._get(self.EPMC_SEARCH_URL + _quote(doi, safe="")),
            attempts=1)
        if text is None:
            return None, f"EuropePMC error: {err} | {last_err}"
        try:
            hits = ((_json.loads(text).get("resultList") or {})
                    .get("result") or [])
        except ValueError as exc:
            return None, f"EuropePMC error: bad response: {exc} | {last_err}"
        for h in hits:
            if h.get("pmcid"):
                return h["pmcid"], None
        return None, f"EuropePMC: no PMCID | {last_err}"


# --------------------------------------------------------------------------
# Spark operators over a fetcher
# --------------------------------------------------------------------------

_IDCONV_SCHEMA = T.StructType([
    T.StructField("doi_norm", T.StringType()),
    T.StructField("pmcid", T.StringType()),
    T.StructField("fetch_error", T.StringType()),
])

_EFETCH_SCHEMA = T.StructType([
    T.StructField("pmcid", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("sections", SECTIONS),
    T.StructField("abstract", T.StringType()),
    T.StructField("fetch_error", T.StringType()),
])


def map_idconv(df: DataFrame, fetcher_factory: Callable,
               key_col: str = "doi_norm",
               batch_size: int = IDCONV_BATCH,
               throttle_sec: float = 0.0,
               single_fallback: bool = False,
               num_partitions: int | None = None) -> DataFrame:
    """S6/J5 — distributed DOI->PMCID resolution.

    ``num_partitions`` is the Spark twin of the reference CLI's
    ``--batch-workers`` thread-pool width (cli.py:17): each worklist
    partition runs one fetcher loop, so the partition count bounds
    concurrent HTTP fetch tasks — and, each task holding its own
    client-side limiter (F5), the aggregate request rate is at most
    ``num_partitions * rpm``.  Default (None) keeps the worklist's
    incoming partitioning.

    Output has one row per input key: resolved (pmcid, null error) or
    failed (null pmcid, error) — the batch set-difference J5 happens
    inside the connector, so downstream is a plain left join.

    ``single_fallback=True`` enables S9: each batch miss retries the
    single-item ladder (idconv single + EuropePMC search,
    pmc.py:14-58) before being reported as a failure.  Off by default
    to mirror ``skip_pmc_single_fallback=True``
    (fulltext_enricher.py:117) — the extra per-miss HTTP round-trips
    only pay off on recall-critical worklists.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetcher = fetcher_factory()
        for pdf in batches:
            keys = [k for k in pdf[key_col] if k]
            rows = []
            for i in range(0, len(keys), batch_size):
                chunk = keys[i:i + batch_size]
                out, fails = fetcher.idconv_batch(chunk)
                if single_fallback and fails:
                    retried = []
                    for d, err in fails:
                        pmcid, err2 = fetcher.doi_to_pmcid_single(d)
                        retried.append((d, pmcid, None if pmcid
                                        else (err2 or err)))
                    rows += retried
                else:
                    rows += [(d, None, err) for d, err in fails]
                rows += [(d, p, None) for d, p in out.items()]
                if throttle_sec:
                    time.sleep(throttle_sec)
            yield pd.DataFrame(rows,
                               columns=["doi_norm", "pmcid", "fetch_error"])

    keys = df.select(key_col).where(f"{key_col} is not null")
    if num_partitions is not None:
        keys = keys.repartition(num_partitions)
    return keys.mapInPandas(run, _IDCONV_SCHEMA)


def map_efetch(df: DataFrame, fetcher_factory: Callable,
               key_col: str = "pmcid",
               batch_size: int = EFETCH_BATCH,
               throttle_sec: float = 0.0,
               single_fallback: bool = False,
               num_partitions: int | None = None) -> DataFrame:
    """S7/S8 — distributed PMC JATS fetch + parse.

    ``single_fallback=True`` enables the S8 ladder: pmcids missing
    from the batch EFetch response are retried one at a time through
    EFetch -> OAI-PMH -> EuropePMC fullTextXML (pmc.py:156-209).

    ``num_partitions`` bounds concurrent fetch tasks exactly like
    :func:`map_idconv`'s (the ``--batch-workers`` twin).
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        fetcher = fetcher_factory()
        for pdf in batches:
            keys = [k for k in pdf[key_col] if k]
            rows = []
            for i in range(0, len(keys), batch_size):
                chunk = keys[i:i + batch_size]
                out, fails = fetcher.efetch_batch(chunk)
                if single_fallback and fails:
                    still_failed = []
                    for p, err in fails:
                        rec, err2 = fetcher.jats_single(p)
                        if rec is not None:
                            out[p] = rec
                        else:
                            still_failed.append((p, err2 or err))
                    fails = still_failed
                rows += [(p, r["title"], r["sections"], r["abstract"],
                          None) for p, r in out.items()]
                rows += [(p, None, [], None, err) for p, err in fails]
                if throttle_sec:
                    time.sleep(throttle_sec)
            yield pd.DataFrame(
                rows, columns=["pmcid", "title", "sections", "abstract",
                               "fetch_error"])

    keys = df.select(key_col).where(f"{key_col} is not null").distinct()
    if num_partitions is not None:
        keys = keys.repartition(num_partitions)
    return keys.mapInPandas(run, _EFETCH_SCHEMA)
