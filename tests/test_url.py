"""URL normalization/domain extraction + per-domain caps: DuckDB
parity for the cap draw, known answers for the canonicalizer."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trial_data_ingestion_spark.functions.url import (
    host_of, normalize_url, registered_domain,
)
from trial_data_ingestion_spark.operators.sampling import cap_per_group

CASES = [
    ("HTTP://Example.COM:80/Path/?utm_source=x&q=1#frag",
     "http://example.com/Path/?q=1",
     "example.com", "example.com"),
    ("https://sub.shop.co.uk:443/a", "https://sub.shop.co.uk/a",
     "sub.shop.co.uk", "shop.co.uk"),
    ("example.org/", "http://example.org",
     "example.org", "example.org"),
    ("https://user:pw@www.data.example.com/x?gclid=abc",
     "https://user:pw@www.data.example.com/x",
     "www.data.example.com", "example.com"),
    ("http://192.168.0.1:8080/admin", "http://192.168.0.1:8080/admin",
     "192.168.0.1", "192.168.0.1"),
    ("https://a.b.com.au/p?fbclid=1&keep=2&utm_campaign=z",
     "https://a.b.com.au/p?keep=2", "a.b.com.au", "b.com.au"),
]


def test_url_known_answers(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    rows = df.select(
        "url", normalize_url(F.col("url")).alias("norm"),
        host_of(F.col("url")).alias("host"),
        registered_domain(F.col("url")).alias("dom")).collect()
    got = {r["url"]: (r["norm"], r["host"], r["dom"]) for r in rows}
    for url, norm, host, dom in CASES:
        assert got[url] == (norm, host, dom), url


def test_normalize_is_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, *_ in CASES], "url string")
    once = df.select(normalize_url(F.col("url")).alias("u"))
    twice = once.select(normalize_url(F.col("u")).alias("u"))
    assert [r["u"] for r in once.collect()] == \
        [r["u"] for r in twice.collect()]


def test_cap_per_group_matches_duckdb(spark, sf_dir):
    """The kept set is pure md5 arithmetic — DuckDB reproduces it
    row for row."""
    import duckdb
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = {(r["lang"], r["doc_id"]) for r in
           cap_per_group(docs, "lang", 7, "doc_id", seed="r5")
           .select("lang", "doc_id").collect()}
    want = set(duckdb.sql(f"""
        SELECT lang, doc_id FROM (
          SELECT lang, doc_id,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY CAST('0x' || substr(md5('r5|' ||
                     CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)
                     % 1000000, doc_id) AS rn
          FROM '{sf_dir}/documents.parquet') WHERE rn <= 7
    """).fetchall())
    assert got == want
    assert len(got) > 0


def test_cap_per_group_bounds_and_validation(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    capped = cap_per_group(docs, "lang", 3, "doc_id")
    per = capped.groupBy("lang").count().collect()
    assert all(r["count"] <= 3 for r in per)
    assert set(capped.columns) == set(docs.columns)
    with pytest.raises(ValueError):
        cap_per_group(docs, "lang", 0, "doc_id")
