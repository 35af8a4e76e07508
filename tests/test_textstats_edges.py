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


def test_redact_pii_known_answers(spark):
    rows = [
        (1, "mail me at jane.doe+x@lab.example.org today"),
        (2, "server at 192.168.0.1 answered"),
        (3, "call +1 (555) 123-4567 or 555-987-6543 now"),
        (4, "no pii here, just pi 3.14159"),
        (5, "a@b.co and 10.0.0.255 and 5551234567"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.t for r in df.select(
        "id", textstats.redact_pii(F.col("text")).alias("t")).collect()}
    assert got[1] == "mail me at [EMAIL] today"
    assert got[2] == "server at [IP] answered"
    assert got[3] == "call [PHONE] or [PHONE] now"
    assert got[4] == "no pii here, just pi 3.14159"
    assert got[5] == "[EMAIL] and [IP] and [PHONE]"


def test_repetition_signals_known_answers(spark):
    rows = [
        (1, "nav\nhome\nnav\nabout\nnav"),      # 'nav' repeats 3x
        (2, "a\nb\nc"),                          # all distinct
        (3, ""),                                 # empty
        (4, "buy now buy now buy now buy"),      # 'buy now' 2-gram x3
        (5, "one two three four"),               # all grams distinct
        (6, "w"),                                # fewer tokens than n
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r for r in df.select(
        "id",
        textstats.repeated_line_ratio(F.col("text")).alias("rl"),
        textstats.top_ngram_ratio(F.col("text"), 2).alias("tg"),
    ).collect()}
    assert got[1].rl == pytest.approx(2 / 5)   # 2 of 5 lines are dups
    assert got[2].rl == 0.0
    assert got[3].rl == 0.0 and got[3].tg == 0.0
    # grams of 4: [buy now, now buy, buy now, now buy, buy now, now buy]
    # -> 'buy now' 3 of 6
    assert got[4].tg == pytest.approx(3 / 6)
    assert got[5].tg == pytest.approx(1 / 3)   # 3 grams, all unique
    assert got[6].tg == 0.0


def test_subword_count_known_answers(spark):
    rows = [
        (1, "don't stop"),        # don | 't | stop = 3
        (2, "hello world"),       # 2
        (3, "abc123!?"),          # abc | 123 | !? = 3
        (4, ""),                  # 0
        (5, "  spaced   out  "),  # spaced | out = 2
        (6, "x-ray 2.5mm"),       # x | - | ray || 2 | . | 5 | mm = 7
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r.n for r in df.select(
        "id", textstats.subword_count(F.col("text")).alias("n")).collect()}
    assert got == {1: 3, 2: 2, 3: 3, 4: 0, 5: 2, 6: 7}


def test_subword_count_duckdb_parity(spark):
    from tests.conftest import SF_DIR_ORACLE
    from tests.oracle_harness import compare, run_oracle
    d = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    sdf = d.select(
        "doc_id",
        textstats.subword_count(F.col("text")).cast("long")
        .alias("n_subwords"))
    pat = textstats.BPE_ISH_RE.replace("'", "''")
    sql = f"""
SELECT doc_id,
       CAST(len(list_filter(regexp_extract_all(text,
            '{pat}'), x -> trim(x) <> '')) AS BIGINT)
         AS n_subwords
FROM documents
"""
    problems = compare(sdf, run_oracle(sql, SF_DIR_ORACLE))
    assert not problems, "; ".join(problems)


def test_pii_and_repetition_duckdb_parity(spark):
    """Same-harness parity check the driver would run if the corpus
    had headroom (it is at its 50-query budget): Spark vs DuckDB over
    the sf0.01 documents table, row-count + schema + value hash."""
    from tests.conftest import SF_DIR_ORACLE
    from tests.oracle_harness import compare, run_oracle

    d = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    sdf = d.select(
        "doc_id",
        textstats.redact_pii(F.col("text")).alias("clean"),
        F.round(textstats.repeated_line_ratio(F.col("text")), 6)
         .alias("rep_lines"),
        F.round(textstats.top_ngram_ratio(F.col("text"), 2), 6)
         .alias("top_gram"))
    toks = ("list_filter(string_split_regex(trim(lower(text)), '\\s+'),"
            " x -> x <> '')")
    lines = ("list_filter(list_transform(string_split(text, chr(10)),"
             " x -> trim(x)), x -> x <> '')")
    sql = f"""
WITH t AS (
  SELECT doc_id, text, {toks} AS w, {lines} AS lns FROM documents),
g AS (
  SELECT doc_id, text, lns,
         CASE WHEN len(w) >= 2 THEN list_transform(
              range(1, len(w)), i -> w[i] || ' ' || w[i+1])
              ELSE [] END AS grams
  FROM t)
SELECT doc_id,
  regexp_replace(regexp_replace(regexp_replace(text,
    '{textstats.EMAIL_RE}', '[EMAIL]', 'g'),
    '{textstats.IPV4_RE}', '[IP]', 'g'),
    '{textstats.PHONE_RE}', '[PHONE]', 'g') AS clean,
  round(CASE WHEN len(lns) > 0 THEN
        CAST(len(lns) - len(list_distinct(lns)) AS DOUBLE) / len(lns)
        ELSE 0.0 END, 6) AS rep_lines,
  round(CASE WHEN len(grams) > 0 THEN
        CAST(list_max(list_transform(list_distinct(grams),
             g2 -> len(list_filter(grams, x -> x = g2)))) AS DOUBLE)
          / len(grams)
        ELSE 0.0 END, 6) AS top_gram
FROM g
"""
    problems = compare(sdf, run_oracle(sql, SF_DIR_ORACLE))
    assert not problems, "; ".join(problems)


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
