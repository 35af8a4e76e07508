"""S2 — BibTeX source (doi_utils.py:30-48 / bib_parser.py:4-19).

A dependency-free parser (the reference uses bibtexparser; this
environment has none, and the grammar subset actually consumed —
``@type{key, field = {...}|"..."|bare,}`` — is small).  Spark-side:
``wholetext`` scan -> Arrow-batched parse -> explode entries, so a
directory of thousands of .bib files parses in parallel; single small
files short-circuit through the same code path.
"""

from __future__ import annotations

import re
from typing import Iterator, List

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from trial_data_ingestion_spark.functions.text import normalize_doi
from trial_data_ingestion_spark.operators.dedup import dedup_exact

_DOI_RE = re.compile(r"10\.\d{4,9}/\S+", re.I)
_ENTRY_RE = re.compile(r"@(\w+)\s*\{", re.M)


def _parse_fields(body: str) -> dict:
    """Parse ``field = value`` pairs; values are {...} (brace-balanced),
    "..." or bare words.  Field keys lowercased (doi_utils.py:37)."""
    fields = {}
    i = 0
    n = len(body)
    # skip the citation key (up to first comma)
    comma = body.find(",")
    key = body[:comma].strip() if comma >= 0 else body.strip()
    fields["ID"] = key
    i = comma + 1 if comma >= 0 else n
    while i < n:
        m = re.compile(r"\s*(\w[\w-]*)\s*=\s*").match(body, i)
        if not m:
            break
        name = m.group(1).lower()
        i = m.end()
        if i < n and body[i] == "{":
            depth, j = 0, i
            while j < n:
                if body[j] == "{":
                    depth += 1
                elif body[j] == "}":
                    depth -= 1
                    if depth == 0:
                        break
                j += 1
            fields[name] = body[i + 1:j]
            i = j + 1
        elif i < n and body[i] == '"':
            j = body.find('"', i + 1)
            fields[name] = body[i + 1:j if j >= 0 else n]
            i = (j + 1) if j >= 0 else n
        else:
            m2 = re.compile(r"[^,\n]*").match(body, i)
            fields[name] = m2.group(0).strip()
            i = m2.end()
        comma2 = body.find(",", i)
        if comma2 < 0:
            break
        i = comma2 + 1
    return fields


def parse_bib_text(text: str) -> List[dict]:
    """Split a .bib file into entries and extract fields, preserving
    file order (needed for keep-first dedup determinism)."""
    entries = []
    for m in _ENTRY_RE.finditer(text):
        start = m.end()
        depth, j = 1, start
        while j < len(text) and depth > 0:
            if text[j] == "{":
                depth += 1
            elif text[j] == "}":
                depth -= 1
            j += 1
        fields = _parse_fields(text[start:j - 1])
        fields["ENTRYTYPE"] = m.group(1).lower()
        entries.append(fields)
    return entries


def _strip_braces(s):
    if not isinstance(s, str):
        return None
    s = re.sub(r"[{}]", "", s)
    s = re.sub(r"\s+", " ", s).strip()
    return s or None


def _doi_from_any(s):
    if not isinstance(s, str):
        return None
    m = _DOI_RE.search(s)
    return m.group(0) if m else None


def _rows_from_text(text: str) -> List[tuple]:
    """Reference extraction semantics (doi_utils.py:36-42): doi field,
    else DOI mined from url/howpublished; brace-stripped title;
    journal|journaltitle|booktitle coalesce; entries without a DOI are
    dropped."""
    rows = []
    for ord_, e in enumerate(parse_bib_text(text)):
        doi = (e.get("doi") or _doi_from_any(e.get("url", ""))
               or _doi_from_any(e.get("howpublished", "")))
        if not doi:
            continue
        rows.append((doi, _strip_braces(e.get("journal")
                                        or e.get("journaltitle")
                                        or e.get("booktitle")),
                     _strip_braces(e.get("title")), ord_))
    return rows


_BIB_SCHEMA = T.StructType([
    T.StructField("doi", T.StringType()),
    T.StructField("journal", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("__file", T.StringType()),
    T.StructField("__ord", T.LongType()),
])


def read_bib(spark: SparkSession, path: str) -> DataFrame:
    """Distributed .bib reader: one wholetext row per file ->
    mapInPandas parse -> normalize/dedup (doi_utils.py:46-48).

    The keep-first order key is (source file, in-file ordinal) — the
    in-file ordinal alone collides across files when ``path`` is a
    directory, which would make keep-first nondeterministic for
    duplicate DOIs spanning files.  File path order is lexicographic:
    arbitrary but stable across runs and engines.
    """
    files = (spark.read.text(path, wholetext=True)
             .select(F.input_file_name().alias("__file"), "value"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for fname, text in zip(pdf["__file"], pdf["value"]):
                out.extend((d, j, t, fname, o)
                           for (d, j, t, o) in _rows_from_text(text or ""))
            yield pd.DataFrame(
                out, columns=["doi", "journal", "title", "__file", "__ord"])

    parsed = files.mapInPandas(parse, _BIB_SCHEMA)
    df = (parsed.withColumn("doi_norm", normalize_doi(F.col("doi")))
                .where(F.col("doi_norm").isNotNull())
                .withColumn("__gord",
                            F.concat_ws("#", F.col("__file"),
                                        F.lpad(F.col("__ord").cast("string"),
                                               12, "0"))))
    return (dedup_exact(df, ["doi_norm"], order_col="__gord")
            .drop("__ord", "__file", "__gord")
            .select("doi", "journal", "title", "doi_norm"))
