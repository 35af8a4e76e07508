"""String/projection operators P1-P16 as native Column expressions.

Each function reproduces the semantics of the reference (file:line
cited per function, paths relative to /root/reference) but compiles to
Catalyst expressions — whole-stage-codegen'd JVM code, never a Python
UDF — so predicate pushdown and column pruning survive around them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Zero-width space that the reference strips out of DOIs
# (src/ingestion_pipeline/preprocessing/doi_utils.py:16).
_ZWSP = "​"

# html.entities.html5 (public stdlib table, 2231 entries incl. the
# 106 semicolon-less legacy names) serialized for str_to_map.  The
# separators are control chars proven absent from every key/value.
from html.entities import html5 as _HTML5_ENTITIES  # noqa: E402

_HTML5_PAIR_SEP, _HTML5_KV_SEP = "\x1e", "\x1f"
assert not any(_HTML5_PAIR_SEP in s or _HTML5_KV_SEP in s
               for kv in _HTML5_ENTITIES.items() for s in kv)
_HTML5_MAP_SRC = _HTML5_PAIR_SEP.join(
    f"{k}{_HTML5_KV_SEP}{v}" for k, v in _HTML5_ENTITIES.items())

# DOI regex (src/ingestion_pipeline/preprocessing/doi_utils.py:9).
DOI_PATTERN = r"10\.\d{4,9}/\S+"


def _pystrip(c: Column) -> Column:
    """Python ``str.strip()`` semantics: remove ALL leading/trailing
    whitespace.  ``F.trim`` strips only ASCII spaces — a trailing
    ``\\n`` or ``\\t`` would survive it."""
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def normalize_doi(c: Column) -> Column:
    """P1 — canonical DOI form.

    Mirrors ``normalize_doi`` (preprocessing/doi_utils.py:11-17)
    operation-for-operation: trim, strip an ``http(s)://(dx.)doi.org/``
    prefix CASE-INSENSITIVELY (the reference passes ``flags=re.I``),
    remove zero-width spaces, trim, lowercase; empty string -> null.
    The case-insensitive strip also makes the function idempotent —
    without it ``HTTPS://DOI.ORG/x`` survives pass 1 and is stripped
    on pass 2.  "Trim" is a regex ``^\\s+|\\s+$`` strip, NOT
    ``F.trim``: Python's ``str.strip()`` removes all whitespace while
    Spark's ``trim`` removes only ASCII spaces, so a trailing newline
    would survive ``F.trim`` (both divergences caught by
    tests/test_text_properties.py).
    """
    stripped = F.regexp_replace(_pystrip(c),
                                r"(?i)^https?://(dx\.)?doi\.org/", "")
    no_zwsp = F.regexp_replace(stripped, _ZWSP, "")
    normed = F.lower(_pystrip(no_zwsp))
    return F.nullif(normed, F.lit(""))


def extract_doi(c: Column) -> Column:
    """P2 — mine a DOI out of an arbitrary string (doi_utils.py:25-28).

    Returns null when no DOI-shaped token is present (regexp_extract
    yields '' on no-match; nullif restores the reference's None).
    """
    return F.nullif(F.regexp_extract(c, DOI_PATTERN, 0), F.lit(""))


def clean_title(c: Column) -> Column:
    """P3 — strip braces, collapse whitespace, trim; empty -> null
    (doi_utils.py:19-23, used on bib titles)."""
    no_braces = F.regexp_replace(c, r"[{}]", "")
    collapsed = F.regexp_replace(no_braces, r"\s+", " ")
    return F.nullif(F.trim(collapsed), F.lit(""))


def normalize_whitespace(c: Column) -> Column:
    """P12 — ``re.sub(r"\\s+", " ", text).strip()``
    (chunking/chunkers.py:52), applied before windowed chunking."""
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def coalesce_fields(*cols: Column) -> Column:
    """P8 — field coalescing (normalize.py:40-46, bib_parser.py:10-13):
    ``id or pmcid or pmid``, ``full_text or text or body``, ...

    Empty strings count as missing, like Python's ``or``."""
    return F.coalesce(*[F.nullif(c, F.lit("")) for c in cols])


def stable_doc_id(doi_norm: Column, title: Column, journal: Column) -> Column:
    """P9 — deterministic document id (pipelines/ingest_and_embed.py:20-26):
    the normalized DOI when present, else ``"hash:" + sha256(title|journal)[:16]``.

    Deliberate divergence: a present-but-null title/journal hashes as
    ``""`` here, where the reference's f-string would render the
    Python artifact ``"None"`` (``rec.get('title','')`` only defaults
    when the KEY is absent).  Null-as-empty is the intended semantics;
    "None" is an accident of CPython string formatting.
    """
    fallback = F.concat(
        F.lit("hash:"),
        F.substring(
            F.sha2(F.concat_ws("|", F.coalesce(title, F.lit("")),
                               F.coalesce(journal, F.lit(""))), 256),
            1, 16),
    )
    return F.coalesce(doi_norm, fallback)


def chunk_id(doc_id: Column, chunk_index: Column) -> Column:
    """P10 — deterministic chunk id ``f"{doc_id}::c{chunk_index}"``
    (pipelines/ingest_and_embed.py:104)."""
    return F.concat(doc_id, F.lit("::c"), chunk_index.cast("string"))


def pmcid_digits(c: Column) -> Column:
    """P16 — strip non-digits from a PMCID (sources/pmc.py:162)."""
    return F.regexp_replace(c, r"\D", "")


def sections_to_text(sections: Column) -> Column:
    """X5 — flatten normalized sections to one body string
    (preprocessing/xml_cleaning.py:57-70): join non-empty section texts
    with blank lines, in document order.

    ``sections`` is ``array<struct<section_path:string, text:string>>``
    (the engine-wide normalized form of the reference's recursive
    sections dict — SURVEY.md §1.3).

    Operation-for-operation with the reference: each kept text is
    ``strip()``-ed, the keep test is strip-truthiness (whitespace-only
    sections drop), and the final join is stripped — all with Python
    whitespace semantics (``_pystrip``), not space-only ``F.trim``."""
    texts = F.filter(
        F.transform(sections, lambda s: _pystrip(s.getField("text"))),
        lambda t: t.isNotNull() & (t != ""),
    )
    return _pystrip(F.array_join(texts, "\n\n"))


def body_length(sections: Column) -> Column:
    """A4 — ``len(sections_to_text(...))`` per record
    (preprocessing/fulltext_enricher.py:67-68), used by the
    min-fulltext-chars gate P6."""
    return F.length(sections_to_text(sections))


def html_multi_unescape(c: Column, rounds: int = 3) -> Column:
    """P13 — repeated HTML entity unescape, <= ``rounds`` passes
    (sources/springer.py:108-116: Springer payloads arrive double- or
    triple-escaped, e.g. ``&amp;amp;lt;`` -> ``<``).

    The reference calls ``html.unescape`` in a loop; this Column
    version is byte-equal to that loop while staying codegen'd — no
    Python in the plan.  Each round reproduces one stdlib
    ``html.unescape`` pass exactly:

    * the text splits before every ``&`` (stdlib's charref regex can
      never match across an ``&``, so the pieces are independent and
      one pass never re-scans its own output — ``&amp;lt;`` becomes
      ``&lt;`` in one round, not ``<``);
    * numeric character references (``&#8212;`` / ``&#x1F600;``)
      decode with full stdlib semantics: semicolon-less forms
      (``&#60abc`` -> ``<abc``), leading zeros, out-of-range/
      surrogate/overflowing values -> U+FFFD, the HTML5 windows-1252
      remap of C1 references (``&#128;`` -> ``€``), and the removed
      invalid-codepoint set (``&#1;`` -> empty) — rendered through
      UTF-32 (``hex`` -> ``unhex`` -> ``decode``) so the full Unicode
      range works without Python;
    * named references resolve against the FULL ~2200-entry
      ``html.entities.html5`` table (a public stdlib constant),
      shipped as one ``str_to_map`` literal that Catalyst constant-
      folds into a map literal at plan time.  Lookup follows the
      stdlib algorithm: the candidate is ``[^\\t\\n\\f <&#;]{1,32};?``
      after the ``&``, tried longest-prefix-first down to length 2,
      remainder re-appended (``&notanumber`` -> ``¬anumber``,
      ``&amp`` -> ``&``, ``&ltcc;`` -> ``⪦``).

    The property corpus in tests/test_text_properties.py pins byte
    equality with ``sources.springer.multi_unescape`` (the connector
    kernel = looped stdlib ``html.unescape``) over named, numeric,
    legacy semicolon-less, and 0-2x re-escaped soup.  Cost note: a
    round is O(pieces x 32 map probes) inside codegen — fine for the
    parse tier this belongs to; it is not used in bench hot paths.
    """
    # HTML5 §13.5 numeric-reference overrides (stdlib
    # html._invalid_charrefs): windows-1252 remap of 0x80-0x9F plus
    # NUL -> U+FFFD and CR -> '\r'.
    _CHARREF_REMAP = {
        0x00: "�", 0x0d: "\r", 0x80: "€", 0x81: "\x81",
        0x82: "‚", 0x83: "ƒ", 0x84: "„", 0x85: "…",
        0x86: "†", 0x87: "‡", 0x88: "ˆ", 0x89: "‰",
        0x8a: "Š", 0x8b: "‹", 0x8c: "Œ", 0x8d: "\x8d",
        0x8e: "Ž", 0x8f: "\x8f", 0x90: "\x90", 0x91: "‘",
        0x92: "’", 0x93: "“", 0x94: "”", 0x95: "•",
        0x96: "–", 0x97: "—", 0x98: "˜", 0x99: "™",
        0x9a: "š", 0x9b: "›", 0x9c: "œ", 0x9d: "\x9d",
        0x9e: "ž", 0x9f: "Ÿ",
    }

    # The html.entities.html5 table as a plan-time map literal.
    # str_to_map over foldable children is itself foldable, so
    # Catalyst's ConstantFolding turns this into a single map literal
    # — the ~23 KB table ships once per plan, not per row.
    ent_map = F.str_to_map(F.lit(_HTML5_MAP_SRC),
                           F.lit(_HTML5_PAIR_SEP), F.lit(_HTML5_KV_SEP))

    def decode_named(p: Column) -> Column:
        # stdlib charref name grammar: up to 32 chars outside the
        # 7-char stop set, optional trailing ';' (html._charref).
        cand = F.regexp_extract(p, r"^&([^\t\n\f <&#;]{1,32};?)", 1)
        # longest-prefix-first, stdlib's exact-then-prefix scan in one
        # descending pass (substr clamps past-the-end lengths to the
        # whole candidate, so the head entries all try `cand` itself)
        prefixes = F.transform(
            F.sequence(F.lit(33), F.lit(2), F.lit(-1)),
            lambda i: cand.substr(F.lit(1), i))
        best = F.get(F.filter(
            prefixes,
            lambda q: F.element_at(ent_map, q).isNotNull()), 0)
        decoded = F.concat(
            F.element_at(ent_map, best),
            p.substr(F.length(best) + F.lit(2), F.length(p)))
        return F.when((cand != "") & best.isNotNull(), decoded) \
                .otherwise(p)

    def decode_piece(p: Column) -> Column:
        dec = F.regexp_extract(p, r"^&#([0-9]+);?", 1)
        hexp = F.regexp_extract(p, r"^&#[xX]([0-9a-fA-F]+);?", 1)
        matched = (dec != "") | (hexp != "")
        rest = (F.when(dec != "",
                       F.regexp_replace(p, r"^&#[0-9]+;?", ""))
                 .when(hexp != "",
                       F.regexp_replace(p, r"^&#[xX][0-9a-fA-F]+;?", ""))
                 .otherwise(p))
        # overflow -> null code -> U+FFFD (stdlib: huge -> FFFD);
        # decimal overflow nulls under try_cast (plain cast THROWS in
        # ANSI mode), hex is length-guarded so conv can't wrap mod
        # 2^64 into a small "valid" value
        code = (F.when(dec != "", dec.try_cast("long"))
                 .when((hexp != "") & (F.length(hexp) <= 15),
                       F.conv(hexp, 16, 10).try_cast("long")))
        remapped = F.lit(None).cast("string")
        for k, v in _CHARREF_REMAP.items():
            remapped = F.when(code == k, F.lit(v)).otherwise(remapped)
        invalid = (code.isNull() | (code > 0x10FFFF)
                   | code.between(0xD800, 0xDFFF))
        # stdlib html._invalid_codepoints: emitted as empty string
        dropped = (code.between(0x01, 0x08) | (code == 0x0B)
                   | code.between(0x0E, 0x1F)
                   | code.between(0x7F, 0x9F)
                   | code.between(0xFDD0, 0xFDEF)
                   | (code % 0x10000).isin(0xFFFE, 0xFFFF))
        ch = F.coalesce(
            remapped,
            F.when(invalid, F.lit("�"))
             .when(dropped, F.lit(""))
             .otherwise(F.decode(F.unhex(F.lpad(F.hex(code), 8, "0")),
                                 "UTF-32")))
        return F.when(matched, F.concat(ch, rest)) \
                .otherwise(decode_named(p))

    def decode_round(s: Column) -> Column:
        # split BEFORE every '&': each piece holds at most one charref
        # candidate, at its head — exactly one stdlib scan position
        pieces = F.split(s, r"(?=&)")
        joined = F.array_join(F.transform(pieces, decode_piece), "")
        # skip the split/transform plan entirely when no candidate
        return F.when(s.contains("&"), joined).otherwise(s)

    out = c
    for _ in range(rounds):
        out = decode_round(out)
    return out
