"""Skew diagnostics: exact counts on a planted-hot-key fixture, salt
sizing, null-key handling, and composition with salted_join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from trial_data_ingestion_spark.operators.skew import key_skew_report


def _skewed(spark):
    # one hot key with 900 rows, 100 cold keys with 1 row each
    rows = [(f"k{i}", i) for i in range(100)]
    rows += [("hot", 1000 + i) for i in range(900)]
    return spark.createDataFrame(rows, "k string, v long")


def test_report_numbers_are_exact(spark):
    r = key_skew_report(_skewed(spark), "k", top_n=3)
    assert r.n_rows == 1000 and r.n_keys == 101
    assert r.max_key_rows == 900
    assert r.mean_key_rows == pytest.approx(1000 / 101, abs=1e-3)
    assert r.skew_factor == pytest.approx(900 * 101 / 1000, abs=1e-2)
    assert r.top_keys[0] == ("hot", 900)
    assert all(n == 1 for _, n in r.top_keys[1:])
    assert r.p50 == 1  # the median key is cold


def test_salt_recommendation(spark):
    r = key_skew_report(_skewed(spark), "k")
    assert r.recommended_salt(target_rows_per_task=100) == 9
    assert r.recommended_salt(target_rows_per_task=10_000) == 1
    with pytest.raises(ValueError):
        r.recommended_salt(0)


def test_null_keys_are_a_key(spark):
    df = spark.createDataFrame(
        [(None, 1), (None, 2), (None, 3), ("a", 4)],
        "k string, v long")
    r = key_skew_report(df, ["k"])
    assert r.n_keys == 2 and r.max_key_rows == 3
    assert r.top_keys[0] == (None, 3)


def test_validation(spark):
    with pytest.raises(ValueError, match="at least one key"):
        key_skew_report(_skewed(spark), [])
    empty = spark.createDataFrame([], "k string, v long")
    with pytest.raises(ValueError, match="empty input"):
        key_skew_report(empty, "k")


def test_report_drives_salted_join(spark):
    """The measured salt factor must reproduce the plain join exactly
    through salted_join (the q45 machinery)."""
    from trial_data_ingestion_spark.operators.joins import salted_join
    big = _skewed(spark)
    small = spark.createDataFrame(
        [("hot", "H")] + [(f"k{i}", f"S{i}") for i in range(100)],
        "k string, label string")
    salt = key_skew_report(big, "k").recommended_salt(100)
    got = salted_join(big, small, "k", salt=salt)
    want = big.join(small, "k")
    assert got.count() == want.count() == 1000
    assert (got.exceptAll(want).count() == 0
            and want.exceptAll(got).count() == 0)