"""Hostile-input hardening for the native text operators: the 100 TB
corpus will contain every kind of garbage, and a native expression that
throws kills the whole stage.  One DataFrame of nasty strings, bounds
asserted over all of them."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from trial_data_ingestion_spark.functions.text import html_multi_unescape
from trial_data_ingestion_spark.operators import textstats

NASTY = [
    "",                         # empty
    None,                       # null
    " \t\n\r  ",                # whitespace only
    "a",                        # single char
    "…—«»¡¿",                   # punctuation-ish unicode
    "🙂🙃🙂" * 50,               # emoji only
    "مرحبا بالعالم",            # RTL script
    "日本語のテキストです",        # CJK, no spaces
    "the " * 10_000,            # long repetitive english
    "\x00\x01\x02 control",     # control chars
    "word​word",           # zero-width space inside token
    "ß SS ß",                   # casefold edge
]


@pytest.fixture(scope="module")
def nasty_df(spark):
    return spark.createDataFrame([(i, s) for i, s in enumerate(NASTY)],
                                 "id long, text string")


def test_stats_never_throw_and_stay_bounded(nasty_df):
    rows = nasty_df.select(
        "id",
        textstats.token_count(F.col("text")).alias("ntok"),
        textstats.punct_ratio(F.col("text")).alias("pr"),
        textstats.stopword_ratio(F.col("text"), "en").alias("sr"),
        textstats.avg_token_length(F.col("text")).alias("atl"),
        textstats.quality_score(F.col("text")).alias("q"),
        textstats.detect_language(F.col("text")).alias("lang"),
    ).collect()
    langs = set(textstats.STOPWORDS) | {"und"}
    for r in rows:
        if r.ntok is None:      # null text -> null stats, never garbage
            continue
        assert r.ntok >= 0
        assert 0.0 <= r.pr <= 1.0, r
        assert 0.0 <= r.sr <= 1.0, r
        assert r.atl >= 0.0, r
        assert 0.0 <= r.q <= 1.0, r
        assert r.lang in langs, r


def test_fingerprint_stable_under_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "  hello world "), (3, "HELLO\nWORLD")],
        "id long, text string")
    fps = {r.fp for r in
           df.select(textstats.fingerprint(F.col("text")).alias("fp"))
             .collect()}
    assert len(fps) == 1


def test_html_multi_unescape_rounds(spark):
    cases = [
        ("&lt;b&gt;", "<b>"),                    # single-escaped
        ("&amp;lt;i&amp;gt;", "<i>"),            # double-escaped
        ("&amp;amp;lt;u&amp;amp;gt;", "<u>"),    # triple-escaped
        ("a &amp;&amp; b", "a && b"),
        ("no entities", "no entities"),
        ("&quot;q&quot; &#39;a&#39;", "\"q\" 'a'"),
    ]
    df = spark.createDataFrame(cases, "s string, want string")
    got = df.select(html_multi_unescape(F.col("s")).alias("u"),
                    "want").collect()
    for r in got:
        assert r.u == r.want, r
