"""WARC source + HTML text extraction: synthesized archives (plain
and member-per-record gzip), record/HTTP parsing, extraction known
answers, and the crawl -> text -> curation composition."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from trial_data_ingestion_spark.functions.html_text import (
    extract_text, html_to_text,
)
from trial_data_ingestion_spark.sources.warc import (
    iter_warc_records, read_warc,
)

PAGES = [
    ("http://example.org/a",
     "<html><head><title>Alpha &amp; Beta</title>"
     "<style>body{color:red}</style></head>"
     "<body><h1>Heading</h1><p>First paragraph with enough words to "
     "pass gates.</p><script>var x = 'never text';</script>"
     "<p>Second &lt;escaped&gt; paragraph.</p></body></html>"),
    ("http://example.org/b",
     "<html><body><div>plain page body text here</div></body></html>"),
]


def _warc_record(uri: str, html: str, rec_id: str) -> bytes:
    body = html.encode()
    http = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            b"\r\n" + body)
    hdr = (f"WARC/1.0\r\n"
           f"WARC-Type: response\r\n"
           f"WARC-Record-ID: <urn:uuid:{rec_id}>\r\n"
           f"WARC-Target-URI: {uri}\r\n"
           f"WARC-Date: 2026-08-14T00:00:00Z\r\n"
           f"Content-Type: application/http; msgtype=response\r\n"
           f"Content-Length: {len(http)}\r\n\r\n").encode()
    return hdr + http + b"\r\n\r\n"


def _warcinfo() -> bytes:
    body = b"software: test\r\n"
    hdr = (f"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
           f"WARC-Record-ID: <urn:uuid:info>\r\n"
           f"Content-Type: application/warc-fields\r\n"
           f"Content-Length: {len(body)}\r\n\r\n").encode()
    return hdr + body + b"\r\n\r\n"


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    plain = _warcinfo() + _warc_record(*PAGES[0], "r1")
    (d / "crawl-0.warc").write_bytes(plain)
    # member-per-record gzip (the Common Crawl convention)
    gz = (gzip.compress(_warcinfo())
          + gzip.compress(_warc_record(*PAGES[1], "r2")))
    (d / "crawl-1.warc.gz").write_bytes(gz)
    return str(d)


def test_iter_warc_records_walks_all():
    data = _warcinfo() + _warc_record(*PAGES[0], "rX")
    recs = list(iter_warc_records(data))
    assert [h.get("warc-type") for h, _ in recs] == \
        ["warcinfo", "response"]
    assert recs[1][1].startswith(b"HTTP/1.1 200")


def test_read_warc_parses_http_layer(spark, warc_dir):
    rows = {r["target_uri"]: r
            for r in read_warc(spark, warc_dir).collect()}
    assert set(rows) == {u for u, _ in PAGES}
    for (uri, html) in PAGES:
        r = rows[uri]
        assert r["warc_type"] == "response"
        assert r["http_status"] == 200
        assert r["http_content_type"].startswith("text/html")
        assert bytes(r["payload"]).decode() == html
    # warcinfo records were filtered by the default types=("response",)
    all_types = {r["warc_type"] for r in
                 read_warc(spark, warc_dir, types=None).collect()}
    assert all_types == {"warcinfo", "response"}


def test_extract_text_known_answer():
    title, text = extract_text(PAGES[0][1])
    assert title == "Alpha & Beta"
    lines = text.split("\n")
    assert "Heading" in lines
    assert "First paragraph with enough words to pass gates." in lines
    assert "Second <escaped> paragraph." in lines
    assert "never text" not in text and "color:red" not in text


def test_extract_text_hostile_input():
    assert extract_text("") == (None, "")
    assert extract_text(None) == (None, "")
    t, x = extract_text("<p>unclosed <b>bold &amp")
    assert "unclosed" in x


@pytest.mark.slow
def test_crawl_to_curation_composition(spark, warc_dir):
    """The headline web flow: WARC -> HTML -> text -> hygiene gate.
    The extracted pages flow through the SAME curation entry point as
    any other corpus."""
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, hygiene_gate,
    )
    pages = (read_warc(spark, warc_dir)
             .where((F.col("http_status") == 200)
                    & F.col("http_content_type").startswith("text/html")))
    docs = (html_to_text(pages, html_col="payload")
            .select(F.abs(F.xxhash64("target_uri")).alias("doc_id"),
                    "target_uri", "title", "text"))
    rows = docs.collect()
    assert len(rows) == 2
    gated = hygiene_gate(docs, CurationConfig(lid="native",
                                              min_tokens=4))
    kept = {r["target_uri"]: r for r in gated.collect()}
    assert "http://example.org/a" in kept
    assert kept["http://example.org/a"]["lang"] == "en"


def test_streaming_warc_matches_batch(spark, warc_dir, tmp_path):
    """The crawl-drop directory as a stream: availableNow over the
    same files must emit exactly the batch reader's rows (shared
    kernel, so anything else is a harness bug)."""
    from trial_data_ingestion_spark.sources.warc import read_warc_stream
    q = (read_warc_stream(spark, warc_dir, max_files_per_trigger=1)
         .selectExpr("target_uri", "http_status",
                     "CAST(payload AS STRING) AS body")
         .writeStream.format("memory").queryName("s_warc")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt_warc"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["target_uri"], r["http_status"], r["body"])
           for r in spark.sql("SELECT * FROM s_warc").collect()}
    want = {(r["target_uri"], r["http_status"],
             bytes(r["payload"]).decode())
            for r in read_warc(spark, warc_dir).collect()}
    assert got == want and len(got) == 2


_ARTICLE = """<html><head><title>T</title><style>.x{color:red}</style></head>
<body>
<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/faq">FAQ</a></nav>
<main>
<h2>Article heading</h2>
<p>This is the main body of the article with enough words to be a good
block of content for the extractor.</p>
<p>The second paragraph also has plenty of words and no links at all
inside of it, so it stays.</p>
<div><a href="/a">Related story one</a> <a href="/b">Related story two</a>
<a href="/c">Related story three with more words</a></div>
</main>
<footer>Copyright 2026 Example Corp all rights reserved worldwide</footer>
</body></html>"""


def test_extract_main_content_strips_boilerplate():
    from trial_data_ingestion_spark.functions.html_text import (
        extract_main_content,
    )
    text, kept, total, frac = extract_main_content(_ARTICLE)
    lines = text.split("\n")
    # heading is SHORT but promoted by the adjacent GOOD paragraph
    assert lines[0] == "Article heading"
    assert lines[1].startswith("This is the main body")
    assert lines[2].startswith("The second paragraph")
    assert kept == 3
    # nav (structural), related-links div (link density ~1), and footer
    # (structural, despite its word count) are all gone
    assert "Home" not in text and "Related" not in text
    assert "Copyright" not in text
    assert total > kept and 0.0 < frac < 1.0


def test_extract_main_content_isolated_short_drops():
    from trial_data_ingestion_spark.functions.html_text import (
        extract_main_content,
    )
    # a short fragment with no GOOD neighbor has nothing to inherit
    text, kept, total, frac = extract_main_content(
        "<p>Hi there</p><div><a href='/x'>click</a></div>")
    assert text == "" and kept == 0 and total == 2 and frac == 1.0
    assert extract_main_content("") == ("", 0, 0, 0.0)
    assert extract_main_content(None) == ("", 0, 0, 0.0)


def test_extract_main_content_stopword_gate():
    from trial_data_ingestion_spark.functions.html_text import (
        extract_main_content,
    )
    from trial_data_ingestion_spark.operators.textstats import STOPWORDS
    sw = frozenset(STOPWORDS["en"])
    html = ("<p>The cat sat in the hat with the mat and the rat.</p>"
            "<p>lorem zzz qqq xxx vvv kkk jjj www yyy nnn mmm ppp</p>")
    text, kept, total, _ = extract_main_content(
        html, min_stopword_density=0.25, stopwords=sw)
    assert kept == 1 and total == 2
    assert text.startswith("The cat sat")
    # gate off: both blocks pass
    text_all, kept_all, _, _ = extract_main_content(html)
    assert kept_all == 2 and "lorem" in text_all


def test_html_to_main_text_spark_kernel(spark):
    from trial_data_ingestion_spark.functions.html_text import (
        html_to_main_text,
    )
    df = spark.createDataFrame(
        [(1, _ARTICLE), (2, "<p>Hi</p>")], ["doc_id", "html"])
    out = {r["doc_id"]: r for r in
           html_to_main_text(df, stopword_lang="en").collect()}
    assert out[1]["kept_blocks"] == 3
    assert out[1]["main_text"].startswith("Article heading")
    assert out[1]["removed_char_frac"] > 0
    assert out[2]["main_text"] == "" and out[2]["total_blocks"] == 1
    # audit columns ride along with the originals
    assert set(out[1].asDict()) == {"doc_id", "html", "main_text",
                                    "kept_blocks", "total_blocks",
                                    "removed_char_frac"}


def test_main_content_vs_line_dedup_on_planted_boilerplate(spark):
    """The q64 composition strips shared nav/footer boilerplate with
    CORPUS-WIDE line dedup; main-content extraction removes the same
    boilerplate per document with NO corpus state — each doc's
    main_text is exactly its original text (structural nav/footer
    blocks die on the spot)."""
    from pyspark.sql import functions as F

    from trial_data_ingestion_spark.functions.html_text import (
        html_to_main_text,
    )

    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .limit(20))
    pages = docs.select(
        "doc_id", F.col("text").alias("orig"),
        F.concat(
            F.lit("<html><head><title>Doc x</title></head><body>"
                  "<nav>home | topics | about | contact</nav><p>"),
            F.col("text"),
            F.lit("</p><footer>corpus release archive footer"
                  "</footer></body></html>")).alias("html"))
    out = html_to_main_text(pages).collect()
    assert len(out) == 20
    for r in out:
        want = "\n".join(" ".join(l.split()) for l in
                         r["orig"].split("\n") if l.strip())
        assert r["main_text"] == " ".join(want.split("\n")) or \
            r["main_text"] == want
        assert "home | topics" not in r["main_text"]
        assert "archive footer" not in r["main_text"]


def test_extract_links_known_answers():
    from trial_data_ingestion_spark.functions.html_text import (
        extract_links,
    )
    html = """
    <html><body>
      <a href="/docs/intro">intro</a>
      <a href="https://other.org/page?x=1">abs</a>
      <a href="#frag">frag-only</a>
      <a href="mailto:a@b.c">mail</a>
      <a href="javascript:void(0)">js</a>
      <a href="/docs/intro">dup</a>
      <a>no href</a>
    </body></html>"""
    got = extract_links(html, base_url="https://example.com/start")
    assert got == ["https://example.com/docs/intro",
                   "https://other.org/page?x=1"]
    # no base: relative links pass through only if already http(s)
    assert extract_links(html) == ["https://other.org/page?x=1"]
    # hostile/truncated markup: no raise
    assert extract_links("<a href='x" ) == []


def test_extract_links_with_anchor_text(spark):
    from trial_data_ingestion_spark.functions.html_text import (
        extract_links, html_to_anchor_links,
    )
    html = ('<p><a href="https://a.com/x">Great <b>article</b>\n here</a>'
            '<a href="https://b.com/">  </a>'
            '<a href="#frag">skip</a>'
            '<a href="mailto:x@y.z">skip too</a>'
            '<a href="/rel">relative link</a>'
            '<a href="https://a.com/x">dup ignored</a></p>')
    pairs = extract_links(html, base_url="https://base.org/p/",
                          with_text=True)
    assert pairs == [("https://a.com/x", "Great article here"),
                     ("https://b.com/", ""),
                     ("https://base.org/rel", "relative link")]
    # plain mode unchanged
    assert extract_links(html, base_url="https://base.org/p/") == \
        [u for u, _ in pairs]
    # Spark kernel: struct array rides along, explodable
    df = spark.createDataFrame([(1, html, "https://base.org/p/")],
                               ["doc_id", "html", "url"])
    out = html_to_anchor_links(df).selectExpr(
        "doc_id", "inline(anchor_links)").collect()
    assert [(r["url"], r["anchor"]) for r in out] == pairs


@pytest.mark.slow
def test_html_links_to_domain_pagerank(spark):
    """The crawl loop end-to-end: html -> links -> registrable-domain
    edges -> pagerank.  The most-cited domain ranks first."""
    from pyspark.sql import functions as F

    from trial_data_ingestion_spark.functions.html_text import (
        html_to_links,
    )
    from trial_data_ingestion_spark.operators.graph import (
        domain_edges,
        pagerank,
    )
    pages = [
        ("https://a.com/1", '<a href="https://hub.org/x">h</a>'
                            '<a href="https://b.net/y">b</a>'),
        ("https://b.net/1", '<a href="https://hub.org/z">h</a>'),
        ("https://c.io/1",  '<a href="https://hub.org/w">h</a>'
                            '<a href="/self">rel</a>'),
    ]
    df = spark.createDataFrame(pages, "url string, html string")
    linked = html_to_links(df)
    got = {r["url"]: r["links"] for r in linked.collect()}
    assert got["https://c.io/1"] == ["https://hub.org/w",
                                     "https://c.io/self"]
    edges = domain_edges(
        linked.select("url", F.explode("links").alias("link")))
    ranks = {r["node"]: r["rank"]
             for r in pagerank(edges, num_iter=10).collect()}
    assert max(ranks, key=ranks.get) == "hub.org"
