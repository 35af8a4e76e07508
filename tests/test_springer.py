"""S10 Springer OA source + X9 escaped-XML extraction + P13 full
unescape (SURVEY.md §2.1/§2.4; reference sources/springer.py)."""

from __future__ import annotations

import html

import pytest


def _jats(doi: str, title: str = "Springer Article") -> str:
    return f"""<article>
  <front>
    <article-meta>
      <article-id pub-id-type="doi">{doi}</article-id>
      <title-group><article-title>{title}</article-title></title-group>
      <abstract><p>An abstract.</p></abstract>
    </article-meta>
  </front>
  <body>
    <sec><title>intro</title><p>Body text of {title}.</p></sec>
  </body>
</article>"""


def _response(*records: str) -> str:
    recs = "\n".join(f"<record>{r}</record>" for r in records)
    return f"<response><records>{recs}</records></response>"


def _escape(s: str, rounds: int = 1) -> str:
    for _ in range(rounds):
        s = html.escape(s)
    return s


# ---- X9: the three extraction shapes ----

def test_extract_direct_article():
    from trial_data_ingestion_spark.sources.springer import (
        parse_springer_response,
    )
    rec, err = parse_springer_response(
        _response(_jats("10.1/direct")), "10.1/direct")
    assert err is None
    assert rec["title"] == "Springer Article"
    assert rec["sections"][0]["text"].startswith("Body text")


def test_extract_escaped_xml_wrapper():
    # single- and double-escaped payloads inside an <xml> wrapper
    from trial_data_ingestion_spark.sources.springer import (
        parse_springer_response,
    )
    for rounds in (1, 2):
        payload = f"<xml>{_escape(_jats('10.1/esc'), rounds)}</xml>"
        rec, err = parse_springer_response(_response(payload), "10.1/esc")
        assert err is None, f"rounds={rounds}: {err}"
        assert rec["title"] == "Springer Article"


def test_extract_regex_fallback():
    # article XML escaped as text of some non-<xml> tag: shapes A and
    # B both miss, the regex scan (springer.py:144-151) recovers it
    from trial_data_ingestion_spark.sources.springer import (
        parse_springer_response,
    )
    payload = f"<blob>prefix {_escape(_jats('10.1/rx'))} suffix</blob>"
    rec, err = parse_springer_response(_response(payload), "10.1/rx")
    assert err is None
    assert rec["title"] == "Springer Article"


def test_doi_preference_and_taxonomy():
    from trial_data_ingestion_spark.sources.springer import (
        parse_springer_response,
    )
    resp = _response(_jats("10.1/other", "Other"),
                     _jats("10.1/want", "Wanted"))
    rec, err = parse_springer_response(resp, "10.1/want")
    assert err is None and rec["title"] == "Wanted"
    # no DOI match -> first extractable record wins (springer.py:262)
    rec2, _ = parse_springer_response(resp, "10.1/absent")
    assert rec2["title"] == "Other"

    assert parse_springer_response("not xml", "x") == \
        (None, "Springer: no <record>")
    assert parse_springer_response("<response/>", "x") == \
        (None, "Springer: no <record>")
    assert parse_springer_response(_response("<other/>"), "x") == \
        (None, "Springer: no JATS <article> found")


def test_abstract_only_record_is_not_an_error():
    # body-less article -> empty sections, no error (springer.py:296-299)
    from trial_data_ingestion_spark.sources.springer import (
        parse_springer_response,
    )
    art = """<article><front><article-meta>
      <title-group><article-title>NoBody</article-title></title-group>
      <abstract><p>only this</p></abstract>
    </article-meta></front></article>"""
    rec, err = parse_springer_response(_response(art), "10.1/nb")
    assert err is None
    assert rec["sections"] == [] and rec["abstract"] == "only this"


# ---- P13: full unescape semantics ----

def test_multi_unescape_matches_stdlib_loop():
    from trial_data_ingestion_spark.sources.springer import multi_unescape
    double = _escape("<a href=\"x\">&#8212; café</a>", 2)
    assert multi_unescape(double) == "<a href=\"x\">— café</a>"
    # the 3-round cap is part of the contract (springer.py:108-116):
    # a triple-escaped numeric ref needs 4 rounds and stays encoded
    triple = _escape("&#8212;", 3)
    assert multi_unescape(triple) == "&#8212;"
    assert multi_unescape(triple, max_rounds=4) == "—"
    # fixed point short-circuits
    assert multi_unescape("plain") == "plain"
    # numeric + hex + named in one pass each round
    assert multi_unescape("&amp;#x1F600;") == "\U0001f600"


def test_parse_retry_after():
    from trial_data_ingestion_spark.sources.springer import (
        parse_retry_after,
    )
    assert parse_retry_after("7") == 7.0
    assert parse_retry_after(None) == 0.0
    assert parse_retry_after("garbage") == 0.0
    # HTTP-date in the past -> clamped to 0
    assert parse_retry_after("Wed, 21 Oct 2015 07:28:00 GMT") == 0.0


def test_html_multi_unescape_numeric_column(spark):
    # the codegen'd Column twin decodes decimal/hex/astral refs
    from pyspark.sql import functions as F
    from trial_data_ingestion_spark.functions.text import (
        html_multi_unescape,
    )
    rows = [
        ("&#60;b&#62;", "<b>"),
        ("&#x2014; dash", "— dash"),
        ("&#128512;", "\U0001f600"),                  # astral plane
        ("&amp;#60;", "<"),                            # double-escaped
        # invalid -> U+FFFD and bare (semicolon-less) forms now carry
        # full stdlib semantics (was a documented passthrough
        # divergence until round 3)
        ("&#0; &#1114112; &#60", "� � <"),
        ("&#128;&#013;&#1;", "€\r"),     # C1 remap / CR / dropped
        ("a &lt;tag&gt; &amp; &quot;q&quot;", 'a <tag> & "q"'),
    ]
    df = spark.createDataFrame(rows, "s string, want string")
    got = df.select(html_multi_unescape(F.col("s")).alias("u"),
                    "want").collect()
    for r in got:
        assert r["u"] == r["want"], r


# ---- S10: connector over Spark ----

def test_map_springer(spark):
    from trial_data_ingestion_spark.sources.springer import (
        SpringerFixtureFetcher, map_springer,
    )
    responses = {
        "10.1/direct": _response(_jats("10.1/direct")),
        "10.1/esc": _response(
            f"<xml>{_escape(_jats('10.1/esc'), 2)}</xml>"),
        "10.1/norec": "<response/>",
    }

    def factory():
        return SpringerFixtureFetcher(responses)

    df = spark.createDataFrame(
        [("10.1/direct",), ("10.1/esc",), ("10.1/norec",),
         ("10.1/missing",)], "doi_norm string")
    out = {r["doi_norm"]: r for r in map_springer(df, factory).collect()}
    assert out["10.1/direct"]["title"] == "Springer Article"
    assert out["10.1/esc"]["title"] == "Springer Article"
    assert out["10.1/norec"]["fetch_error"] == "Springer: no <record>"
    assert out["10.1/missing"]["fetch_error"] == "Springer HTTP 404"


def test_live_fetcher_requires_key():
    from trial_data_ingestion_spark.sources.springer import (
        SpringerLiveFetcher,
    )
    with pytest.raises(ValueError):
        SpringerLiveFetcher(api_key="")
