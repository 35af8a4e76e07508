"""Unicode normalization: known answers, dedup-rescue behavior,
idempotence, null handling, and the Arrow-batched plan shape."""

from __future__ import annotations

import unicodedata

import pytest

from pyspark.sql import functions as F


CASES = [
    ("café", "café"),                  # combining acute -> NFC
    ("ｆｕｌｌｗｉｄｔｈ", "fullwidth"),       # full-width ASCII folds
    ("ﬁle", "file"),                         # fi ligature
    ("½", "1⁄2"),                            # vulgar fraction
    ("plain ascii stays", "plain ascii stays"),
]


def test_nfkc_known_answers(spark):
    from trial_data_ingestion_spark.functions.unicode_norm import (
        normalize_unicode,
    )
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(CASES)],
                               "i long, s string")
    got = {r["i"]: r["n"] for r in
           df.select("i", normalize_unicode(F.col("s")).alias("n"))
             .collect()}
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == unicodedata.normalize("NFKC", raw)
        assert got[i] == unicodedata.normalize("NFKC", want)


def test_normalization_rescues_exact_dedup(spark):
    """The hygiene motivation: NFC and NFD spellings of the same word
    must fingerprint identically after normalization (and don't
    before)."""
    from trial_data_ingestion_spark.functions.unicode_norm import (
        normalize_unicode,
    )
    from trial_data_ingestion_spark.operators.textstats import fingerprint
    rows = [(1, "café society"), (2, "café society")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    raw_fp = df.select(fingerprint(F.col("text")).alias("f")) \
        .distinct().count()
    norm_fp = (df.select(fingerprint(
        normalize_unicode(F.col("text"), "NFC")).alias("f"))
        .distinct().count())
    assert raw_fp == 2 and norm_fp == 1


def test_idempotent_nulls_and_forms(spark):
    from trial_data_ingestion_spark.functions.unicode_norm import (
        normalize_unicode,
    )
    df = spark.createDataFrame(
        [(1, "ﬁｒｓｔ é"), (2, None)], "i long, s string")
    once = df.select(normalize_unicode(F.col("s")).alias("n"))
    twice = once.select(normalize_unicode(F.col("n")).alias("n"))
    assert [r["n"] for r in once.collect()] == \
           [r["n"] for r in twice.collect()]
    assert once.where("n IS NULL").count() == 1
    with pytest.raises(ValueError):
        normalize_unicode(F.col("s"), "NFX")


def test_normalize_is_arrow_batched(spark):
    from trial_data_ingestion_spark.functions.unicode_norm import (
        normalize_unicode,
    )
    from tests.conftest import SF_DIR_ORACLE
    d = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    plan = (d.select(normalize_unicode(F.col("text")))
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
