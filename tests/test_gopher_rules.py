"""Gopher rule bundle: each rule violated in isolation by a crafted
doc (all others passing), threshold parameterization, real-corpus
sanity, and the zero-shuffle/no-Python plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR

# ~60 ordinary words: passes every rule
GOOD = ("the quick brown fox jumps over the lazy dog and then runs "
        "back to the barn where it sleeps with great comfort because "
        "that is what foxes have always done in stories that people "
        "tell to children at night before bed when the lights go out "
        "and the house becomes quiet and calm for everyone inside it "
        "until morning arrives again")


def _flags(spark, text, **kw):
    from trial_data_ingestion_spark.operators.gopher_rules import (
        GopherThresholds,
        gopher_report,
    )
    t = GopherThresholds(**kw) if kw else None
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return gopher_report(df, t=t).collect()[0]


RULES = ["word_count_ok", "mean_word_len_ok", "symbol_ratio_ok",
         "bullet_lines_ok", "ellipsis_lines_ok", "alpha_words_ok",
         "stopwords_ok"]


def _assert_only_fails(row, failing):
    for r in RULES:
        assert row[r] == (r != failing), (r, row[r], failing)
    assert row["gopher_passes"] is False


def test_good_doc_passes_everything(spark):
    row = _flags(spark, GOOD)
    assert all(row[r] for r in RULES) and row["gopher_passes"]


def test_word_count_rule(spark):
    _assert_only_fails(_flags(spark, "the boy and that dog have fun "
                                     "with all of it"),
                       "word_count_ok")


def test_mean_word_len_rule(spark):
    # 60 long pseudo-words + still has stopwords via lowercase 'the'?
    # no — keep stopwords present but words long on average
    words = ["the", "and", "that", "have", "with"] + \
            ["crystallographically"] * 55
    _assert_only_fails(_flags(spark, " ".join(words)),
                       "mean_word_len_ok")


def test_symbol_ratio_rule(spark):
    text = GOOD + " " + " ".join(["#tag"] * 9)
    _assert_only_fails(_flags(spark, text), "symbol_ratio_ok")


def test_bullet_lines_rule(spark):
    # every line bullet-led; words per line keep other rules green
    lines = [f"- {GOOD}" for _ in range(4)]
    _assert_only_fails(_flags(spark, "\n".join(lines)),
                       "bullet_lines_ok")


def test_ellipsis_lines_rule(spark):
    lines = [GOOD, GOOD + " ...", GOOD + " ..."]
    _assert_only_fails(_flags(spark, "\n".join(lines)),
                       "ellipsis_lines_ok")


def test_alpha_words_rule(spark):
    text = GOOD + " " + " ".join(["12345"] * 20)
    _assert_only_fails(_flags(spark, text), "alpha_words_ok")


def test_stopword_rule(spark):
    words = ["zebra", "quartz", "violet", "osprey", "lantern"] * 12
    _assert_only_fails(_flags(spark, " ".join(words)), "stopwords_ok")


def test_thresholds_are_parameters(spark):
    row = _flags(spark, "short little text with the dog", min_words=3)
    assert row["word_count_ok"] and row["gopher_passes"]


def test_real_corpus_sanity_and_plan(spark):
    from trial_data_ingestion_spark.operators.gopher_rules import (
        GopherThresholds,
        gopher_filter,
        gopher_report,
    )
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rep = gopher_report(docs)
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "EvalPython" not in plan
    n = docs.count()
    # stock thresholds correctly REJECT the synthetic keyword soup —
    # its only stopword is 'the' (a real filter finding, asserted)
    assert gopher_filter(docs).count() == 0
    # with that rule relaxed, the word-count rule is the live gate
    t = GopherThresholds(min_stopword_hits=1)
    kept = gopher_filter(docs, t=t).count()
    assert 0 < kept < n
    assert gopher_filter(docs, t=t).columns == docs.columns