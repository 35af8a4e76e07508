"""Golden-fixture tests for the JATS parse kernel X1-X7 (FIXTURES.md §4)."""

from __future__ import annotations

from tests import fixtures as FX
from trial_data_ingestion_spark.sources.jats import (
    parse_jats, parse_jats_response,
)


def test_structured_article():
    rec = parse_jats(FX.JATS_STRUCTURED)
    assert rec["error"] is None
    assert rec["pmcid"] == "PMC1234567"
    assert rec["title"] == "Test Article Title"
    paths = [s["section_path"] for s in rec["sections"]]
    # title-cased titles, " / "-joined child paths, document order
    assert paths == ["Introduction", "Introduction / Background Details",
                     "Methods"]
    texts = {s["section_path"]: s["text"] for s in rec["sections"]}
    assert texts["Introduction"] == "Intro paragraph one. Intro paragraph two."
    assert texts["Introduction / Background Details"] == "Nested background text."
    # DROP_TAGS removed; inline markup text kept
    assert "NOISE" not in " ".join(texts.values())
    assert texts["Methods"] == "Methods text with markup inside."
    # structured abstract: sec titles + paras joined with blank lines
    assert rec["abstract"] == ("Background\n\nAbstract background text."
                               "\n\nResults\n\nAbstract results text.")


def test_linearized_body():
    rec = parse_jats(FX.JATS_LINEARIZE)
    assert rec["error"] is None
    assert [s["section_path"] for s in rec["sections"]] == ["Full Text"]
    text = rec["sections"][0]["text"]
    assert "First loose paragraph." in text
    assert "• item one\n• item two" in text
    assert "A quoted block." in text
    assert "NOISE" not in text
    assert rec["abstract"] == "Flat abstract."


def test_abstract_only_no_body():
    rec = parse_jats(FX.JATS_ABSTRACT_ONLY)
    # no body -> empty sections, no error (never synthesized)
    assert rec["error"] is None
    assert rec["sections"] == []
    assert rec["abstract"] == "Just an abstract, no body."


def test_no_body_no_abstract_is_not_error():
    # pmc.py:138-140: a MISSING body short-circuits with empty
    # sections and no error, even with no abstract
    rec = parse_jats(FX.JATS_EMPTY)
    assert rec["error"] is None
    assert rec["sections"] == [] and rec["abstract"] is None


def test_empty_body_no_abstract_is_error():
    # pmc.py:150-151: a PRESENT body that linearizes to nothing with
    # no abstract -> "No sections/text"
    xml = ("<article><front><title-group><article-title>X"
           "</article-title></title-group></front>"
           "<body><p>   </p></body></article>")
    assert parse_jats(xml)["error"] == "No sections/text"


def test_subarticle_body_fallback():
    rec = parse_jats(FX.JATS_SUBARTICLE_BODY)
    assert rec["error"] is None
    assert [s["section_path"] for s in rec["sections"]] == ["Inner Sec"]
    assert rec["sections"][0]["text"] == "Sub-article body text."


def test_malformed_xml_is_failure_row():
    rec = parse_jats("<article><unclosed>")
    assert rec["error"].startswith("XML parse error")


def test_multi_article_response():
    payload = ("<pmc-articleset>" + FX.JATS_STRUCTURED
               + FX.JATS_ABSTRACT_ONLY + "</pmc-articleset>")
    recs = parse_jats_response(payload)
    assert [r["pmcid"] for r in recs] == ["PMC1234567", "PMC7777777"]


def test_kernel_distributed(spark):
    rows = [("a", FX.JATS_STRUCTURED), ("b", FX.JATS_LINEARIZE),
            ("c", FX.JATS_EMPTY), ("d", "not xml at all <")]
    df = spark.createDataFrame(rows, "id string, xml string")
    from trial_data_ingestion_spark.sources.jats import parse_jats_kernel
    out = {r["id"]: r for r in parse_jats_kernel(df, "xml", "id").collect()}
    assert out["a"]["title"] == "Test Article Title"
    assert len(out["a"]["sections"]) == 3
    assert out["c"]["error"] is None and out["c"]["sections"] == []
    assert out["d"]["error"].startswith("XML parse error")


def test_pmcid_lowercase_prefix_normalized():
    xml = ("<article><front><article-meta>"
           "<article-id pub-id-type='pmcid'>pmc123</article-id>"
           "</article-meta></front></article>")
    assert parse_jats(xml)["pmcid"] == "PMC123"


def test_nested_section_title_found_recursively():
    # the reference's BeautifulSoup find('title') descends: a title
    # wrapped in an intermediate element still names the section
    xml = ("<article><body><sec><label><title>Wrapped Title</title>"
           "</label><p>Body text.</p></sec></body></article>")
    rec = parse_jats(xml)
    assert rec["error"] is None
    assert [s["section_path"] for s in rec["sections"]] == ["Wrapped Title"]
