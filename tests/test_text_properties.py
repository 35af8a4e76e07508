"""Property-style tests for the native text Column functions
(SURVEY.md §2.3): idempotence and invariants over a fixed-seed
adversarial corpus, evaluated in one Spark job per test."""

from __future__ import annotations

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
