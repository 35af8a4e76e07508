"""Property-style tests for the native text Column functions
(SURVEY.md §2.3): idempotence and invariants over a fixed-seed
adversarial corpus, evaluated in one Spark job per test."""

from __future__ import annotations

import pytest

import html
import random
import string

from pyspark.sql import functions as F

from trial_data_ingestion_spark.functions.text import (
    normalize_doi, normalize_whitespace, stable_doc_id,
)

_ALPH = (string.ascii_letters + string.digits +
         " \t\n{}/.:-_%&#;​")  # includes the zero-width space


def _corpus(n: int = 400) -> list:
    rng = random.Random(0xC0FFEE)
    out = [None, "", " ", "​", "10.1234/abc",
           "https://doi.org/10.1234/ABC.def",
           "HTTP://DX.DOI.ORG/10.99999/x y",
           "{Brace}  {Title}\n\nwith   gaps"]
    for _ in range(n):
        s = "".join(rng.choice(_ALPH)
                    for _ in range(rng.randrange(0, 60)))
        if rng.random() < 0.3:
            s = "https://doi.org/" + s
        out.append(s)
    return out


def test_normalize_doi_idempotent_and_null_on_empty(spark):
    df = spark.createDataFrame([(s,) for s in _corpus()], "raw string")
    once = normalize_doi(F.col("raw"))
    r = df.select(
        once.alias("n1"),
        normalize_doi(once).alias("n2"),
    ).collect()
    for row in r:
        assert row["n1"] == row["n2"]          # idempotent
        assert row["n1"] != ""                 # empty -> null, never ''
        if row["n1"] is not None:
            assert row["n1"] == row["n1"].strip().lower()
            assert "​" not in row["n1"]         # zero-width stripped


def test_normalize_whitespace_idempotent_no_runs(spark):
    df = spark.createDataFrame([(s,) for s in _corpus()], "raw string")
    once = normalize_whitespace(F.col("raw"))
    r = df.select(once.alias("n1"),
                  normalize_whitespace(once).alias("n2")).collect()
    for row in r:
        assert row["n1"] == row["n2"]
        if row["n1"]:
            assert "  " not in row["n1"]
            assert "\n" not in row["n1"] and "\t" not in row["n1"]
            assert row["n1"] == row["n1"].strip()


def test_stable_doc_id_deterministic_and_doi_passthrough(spark):
    rows = [("10.1/a", "T1", "J1"), (None, "T1", "J1"),
            (None, "T1", None), (None, None, None),
            (None, "", ""), ("10.1/b", None, None)]
    df = spark.createDataFrame(rows, "doi string, title string, j string")
    ids = df.select(
        "doi",
        stable_doc_id(F.col("doi"), F.col("title"), F.col("j"))
        .alias("id1"),
        stable_doc_id(F.col("doi"), F.col("title"), F.col("j"))
        .alias("id2")).collect()
    for r in ids:
        assert r["id1"] == r["id2"]            # deterministic
        assert r["id1"] is not None            # total function
        if r["doi"] is not None:
            assert r["id1"] == r["doi"]        # DOI wins
        else:
            assert r["id1"].startswith("hash:")
            assert len(r["id1"]) == len("hash:") + 16
    # same (title, journal) -> same hash id; different -> different
    a = ids[1]["id1"]; b = ids[2]["id1"]
    assert a != b


def _entity_soup(n: int = 500) -> list:
    """Fixed-seed soup over the FULL stdlib unescape grammar: every
    html.entities.html5 named entity (with and without semicolons,
    including the 106 legacy prefix-matched names), numeric character
    references in every stdlib-relevant shape (decimal/hex, upper/
    lowercase X, semicolon-less, leading zeros, NUL, surrogates,
    overflow, windows-1252 C1 range, dropped control codepoints,
    noncharacters, astral plane), arbitrary literal glue, all wrapped
    in 0-2 rounds of escaping."""
    from html.entities import html5 as _html5
    rng = random.Random(0xE57)
    all_names = sorted(_html5)
    named = ["&lt;", "&gt;", "&quot;", "&apos;", "&amp;"]
    codes = [60, 38, 65, 0, 1, 9, 11, 13, 31, 127, 128, 0x8D, 0x9F,
             0xD800, 0xDFFF, 0xFDD0, 0xFFFE, 0xFFFF, 0x10FFFF,
             0x110000, 8212, 0x1F600]

    def numeric() -> str:
        r = rng.random()
        if r < 0.45:
            s = f"&#{'0' * rng.randrange(0, 3)}{rng.choice(codes)};"
        elif r < 0.75:
            c = rng.choice(codes) or 60
            s = (f"&#x{c:x};" if rng.random() < 0.5 else f"&#X{c:X};")
        elif r < 0.9:
            s = f"&#{rng.choice([60, 38, 65, 128])}"   # semicolon-less
        else:
            s = "&#" + "9" * rng.randrange(19, 25) + ";"  # overflow
        if rng.random() < 0.25 and s.endswith(";"):
            s = s[:-1]
        return s

    atoms = ["z", "9", " ", ";", "#", "&#", "&;", "&zz;", "<", ">",
             "x", "é", "&# ;"]
    out = ["", "&", "&#", "&amp;amp;lt;", "&#38;#60;", "&#x1F600;"]
    for _ in range(n):
        parts = []
        for _ in range(rng.randrange(0, 12)):
            r = rng.random()
            if r < 0.2:
                parts.append(rng.choice(named))
            elif r < 0.4:
                # full-table named entity, sometimes semicolon-less /
                # prefix-truncated to hit the legacy matching path
                name = rng.choice(all_names)
                s = "&" + name
                if rng.random() < 0.25 and name.endswith(";"):
                    s = s[:-1]
                if rng.random() < 0.15:
                    s += rng.choice(["x", "9", ";", "abc"])
                parts.append(s)
            elif r < 0.6:
                parts.append(numeric())
            else:
                parts.append(rng.choice(atoms))
        s = "".join(parts)
        for _ in range(rng.randrange(0, 3)):     # 0-2 escape wraps
            s = html.escape(s, quote=rng.random() < 0.5)
        out.append(s)
    return out


@pytest.mark.slow
def test_html_multi_unescape_matches_stdlib_on_supported_grammar(spark):
    """Property gate (VERDICT r2 #6): over the supported grammar the
    native Column decode must equal the connector kernel
    (sources.springer.multi_unescape = stdlib html.unescape looped
    <= 3 rounds) byte for byte — including semicolon-less numeric
    forms, leading zeros, overflow -> U+FFFD, the windows-1252 C1
    remap, and the dropped-codepoint set."""
    from trial_data_ingestion_spark.functions.text import (
        html_multi_unescape,
    )
    from trial_data_ingestion_spark.sources.springer import multi_unescape
    corpus = _entity_soup()
    df = spark.createDataFrame([(s,) for s in corpus], "raw string")
    got = [r["u"] for r in
           df.select(html_multi_unescape(F.col("raw")).alias("u"))
             .collect()]
    bad = [(raw, g, multi_unescape(raw, 3))
           for raw, g in zip(corpus, got)
           if g != multi_unescape(raw, 3)]
    assert not bad, f"{len(bad)} divergences, first: {bad[0]!r}"


@pytest.mark.slow
def test_html_multi_unescape_former_divergences_now_exact(spark):
    """Round 3 pinned a divergence set (long-tail named entities and
    semicolon-less legacy forms passed through).  Round 4 ships the
    full html.entities.html5 table as a constant-folded map literal,
    so these now decode byte-identically to the stdlib loop — pinned
    here so a regression back to pass-through fails loudly."""
    from trial_data_ingestion_spark.functions.text import (
        html_multi_unescape,
    )
    from trial_data_ingestion_spark.sources.springer import multi_unescape
    cases = ["&ltcc;", "&notanumber", "&amp", "&LT;", "&#38;#38;amp;lt;",
             "&CounterClockwiseContourIntegral;", "&fjlig;", "&gt",
             "&aacute", "&Aacute;x", "&xyz;", "&not;in", "&notin;",
             "&amp &amp; &amp;amp;"]
    df = spark.createDataFrame([(s,) for s in cases], "raw string")
    got = {r["raw"]: r["u"] for r in
           df.select("raw",
                     html_multi_unescape(F.col("raw")).alias("u"))
             .collect()}
    assert got["&ltcc;"] == "⪦"
    assert got["&notanumber"] == "¬anumber"   # legacy longest-prefix
    assert got["&amp"] == "&"                 # legacy semicolon-less
    assert got["&LT;"] == "<"
    for c in cases:
        assert got[c] == multi_unescape(c, 3), c


def test_sections_to_text_matches_reference_semantics(spark):
    """Whitespace-only sections drop, kept texts are stripped, the
    join is stripped — Python strip semantics end to end
    (xml_cleaning.py:57-70)."""
    from trial_data_ingestion_spark.functions.text import sections_to_text
    rows = [([("Intro", "  hello \n"), ("Gap", " \n\t"),
              ("Body", "world"), ("Nil", None)],)]
    schema = ("sections array<struct<section_path:string, text:string>>")
    df = spark.createDataFrame(rows, schema)
    got = df.select(sections_to_text(F.col("sections")).alias("t")) \
            .collect()[0]["t"]
    assert got == "hello\n\nworld"
