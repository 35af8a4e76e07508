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
