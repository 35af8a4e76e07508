"""Trainable quality filter: learns a planted good/bad separation
from hygiene signals, generalizes to held-out docs, keeps the audit
trail, and the scoring plan stays JVM-side."""

from __future__ import annotations

import pytest

import random

from pyspark.sql import functions as F


def _corpus(n=300, seed=4):
    """Synthetic labeled corpus: 'good' docs are longer varied prose;
    'bad' docs are short, repetitive, or punctuation soup."""
    rng = random.Random(seed)
    words = ["data", "model", "training", "corpus", "quality", "the",
             "of", "and", "with", "signal", "filter", "sample",
             "document", "language", "measure", "distribution"]
    rows = []
    for i in range(n):
        good = i % 2 == 0
        if good:
            text = " ".join(rng.choice(words)
                            for _ in range(rng.randrange(80, 200)))
        else:
            kind = rng.random()
            if kind < 0.4:
                text = " ".join(rng.choice(words)
                                for _ in range(rng.randrange(2, 6)))
            elif kind < 0.7:
                line = " ".join(rng.choice(words) for _ in range(4))
                text = "\n".join([line] * rng.randrange(10, 20))
            else:
                text = "".join(rng.choice("!?#@$%^&*(){}[];:,.")
                               for _ in range(rng.randrange(60, 150)))
        rows.append((i, text, 1.0 if good else 0.0))
    return rows


def test_quality_filter_learns_and_generalizes(spark):
    from trial_data_ingestion_spark.operators.quality_filter import (
        apply_quality_filter, fit_quality_filter,
    )
    from trial_data_ingestion_spark.operators.textstats import (
        hygiene_report,
    )
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    rep = hygiene_report(df, lid="native").join(
        df.select("doc_id", "label"), "doc_id")
    train = rep.where("doc_id % 5 != 0")
    test = rep.where("doc_id % 5 = 0")
    model = fit_quality_filter(train)
    scored = apply_quality_filter(test, model)
    got = scored.select("doc_id", "keep", "keep_prob").collect()
    labels = {r[0]: r[2] for r in rows}
    acc = sum((r["keep"] == (labels[r["doc_id"]] == 1.0))
              for r in got) / len(got)
    assert acc >= 0.9, acc
    # audit trail: nothing dropped, probability present and bounded
    assert len(got) == test.count()
    assert all(0.0 <= r["keep_prob"] <= 1.0 for r in got)


@pytest.mark.slow
def test_fitted_models_carry_no_training_summary(spark):
    """Regression: the LR trainingSummary pins the SparkSession, and
    transform's prediction UDF captures the model — with the summary
    retained, task serialization dies on the session's
    ObservationManager (order-dependent: surfaced only in full-suite
    runs after Observation-using tests).  Both fit paths must return
    summary-free models."""
    from trial_data_ingestion_spark.operators.quality_filter import (
        fit_quality_filter, fit_text_quality_filter,
    )
    from trial_data_ingestion_spark.operators.textstats import (
        hygiene_report,
    )
    rows = _corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    rep = hygiene_report(df, lid="native").join(
        df.select("doc_id", "label"), "doc_id")
    for model in (fit_quality_filter(rep),
                  fit_text_quality_filter(df)):
        for st in model.stages:
            assert not getattr(st, "hasSummary", False), type(st)


def test_quality_filter_model_save_load_round_trip(spark, tmp_path):
    """The persistence contract the docstring claims: at 100 TB the
    artifact a sweep reuses is the saved model, not the fit.  Scores
    after save/PipelineModel.load must equal the in-memory model's."""
    from pyspark.ml import PipelineModel

    from trial_data_ingestion_spark.operators.quality_filter import (
        apply_quality_filter, fit_quality_filter,
    )
    from trial_data_ingestion_spark.operators.textstats import (
        hygiene_report,
    )
    rows = _corpus(n=120)
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    rep = hygiene_report(df, lid="native").join(
        df.select("doc_id", "label"), "doc_id")
    model = fit_quality_filter(rep)
    path = str(tmp_path / "quality_model")
    model.save(path)
    reloaded = PipelineModel.load(path)
    unlabeled = rep.drop("label")
    before = sorted((r["doc_id"], r["keep_prob"], r["keep"]) for r in
                    apply_quality_filter(unlabeled, model).collect())
    after = sorted((r["doc_id"], r["keep_prob"], r["keep"]) for r in
                   apply_quality_filter(unlabeled, reloaded).collect())
    assert before == after
    assert len(before) == 120


def test_quality_filter_scoring_stays_jvm_side(spark):
    from trial_data_ingestion_spark.operators.quality_filter import (
        apply_quality_filter, fit_quality_filter,
    )
    from trial_data_ingestion_spark.operators.textstats import (
        hygiene_report,
    )
    rows = _corpus(n=60)
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    rep = hygiene_report(df, lid="native").join(
        df.select("doc_id", "label"), "doc_id")
    model = fit_quality_filter(rep)
    plan = (apply_quality_filter(rep.drop("label"), model)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan     # no row-at-a-time Python


def _topical_corpus(n=300, seed=11):
    """Labeled corpus separable only by VOCABULARY: both classes are
    similar length/punctuation, so hygiene signals can't split them —
    only the hashed-n-gram text model can."""
    rng = random.Random(seed)
    good_words = ["experiment", "dataset", "analysis", "method",
                  "results", "model", "training", "evaluation",
                  "the", "we", "of", "and", "measure", "observe"]
    bad_words = ["winner", "click", "free", "casino", "jackpot",
                 "bonus", "prize", "claim", "the", "now", "of",
                 "and", "offer", "deal"]
    rows = []
    for i in range(n):
        good = i % 2 == 0
        vocab = good_words if good else bad_words
        text = " ".join(rng.choice(vocab)
                        for _ in range(rng.randrange(40, 80)))
        rows.append((i, text, 1.0 if good else 0.0))
    return rows


def test_text_quality_filter_learns_topical_junk(spark):
    """The fastText-recipe model separates spam-vocabulary docs that
    the signal-based filter cannot (lengths/punctuation identical)."""
    from trial_data_ingestion_spark.operators.quality_filter import (
        apply_text_quality_filter, fit_text_quality_filter,
    )
    rows = _topical_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    train = df.where("doc_id % 5 != 0")
    test = df.where("doc_id % 5 = 0")
    model = fit_text_quality_filter(train, n_features=1 << 12)
    got = apply_text_quality_filter(test.drop("label"), model) \
        .select("doc_id", "keep", "keep_prob").collect()
    labels = {r[0]: r[2] for r in rows}
    acc = sum((r["keep"] == (labels[r["doc_id"]] == 1.0))
              for r in got) / len(got)
    assert acc >= 0.95, acc
    assert len(got) == test.count()          # audit trail: no drops
    assert all(0.0 <= r["keep_prob"] <= 1.0 for r in got)
    # every original column survives, helper columns are cleaned up
    cols = apply_text_quality_filter(test.drop("label"), model).columns
    assert cols == ["doc_id", "text", "keep_prob", "keep"]


def test_text_quality_filter_save_load_and_jvm_plan(spark, tmp_path):
    from pyspark.ml import PipelineModel

    from trial_data_ingestion_spark.operators.quality_filter import (
        apply_text_quality_filter, fit_text_quality_filter,
    )
    rows = _topical_corpus(n=120)
    df = spark.createDataFrame(rows, "doc_id long, text string, label double")
    model = fit_text_quality_filter(df, n_features=1 << 12)
    path = str(tmp_path / "text_quality_model")
    model.save(path)
    reloaded = PipelineModel.load(path)
    unlabeled = df.drop("label")
    before = sorted((r["doc_id"], r["keep_prob"]) for r in
                    apply_text_quality_filter(unlabeled, model).collect())
    after = sorted((r["doc_id"], r["keep_prob"]) for r in
                   apply_text_quality_filter(unlabeled, reloaded).collect())
    assert before == after and len(before) == 120
    plan = (apply_text_quality_filter(unlabeled, reloaded)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan     # inference is JVM-side


def test_calibration_report_known_answers(spark):
    """Hand-built scored set with exact per-bin means: bin edges are
    [0,.1), ... [.9,1] (prob 1.0 clamps into the last bin), gap is
    |mean_prob - frac_positive|, ECE is the n-weighted mean."""
    from trial_data_ingestion_spark.operators.quality_filter import (
        calibration_report, expected_calibration_error,
    )
    import pytest
    rows = [
        # bin 0: two rows, mean_prob 0.05, none positive -> gap 0.05
        (0.04, 0.0), (0.06, 0.0),
        # bin 9: prob 1.0 clamps in; mean 0.95, all positive -> 0.05
        (0.90, 1.0), (1.00, 1.0),
        # bin 5: perfectly calibrated half-half
        (0.50, 1.0), (0.50, 0.0),
    ]
    df = spark.createDataFrame(rows, "keep_prob double, label double")
    rep = {r["bin"]: r for r in calibration_report(df).collect()}
    assert set(rep) == {0, 5, 9}
    assert rep[0]["n"] == 2 and rep[0]["gap"] == 0.05
    assert rep[0]["p_lo"] == 0.0
    assert rep[9]["n"] == 2 and rep[9]["mean_prob"] == 0.95
    assert rep[9]["frac_positive"] == 1.0 and rep[9]["gap"] == 0.05
    assert rep[5]["gap"] == 0.0
    ece = expected_calibration_error(df)
    assert abs(ece - (2 * 0.05 + 2 * 0.05 + 2 * 0.0) / 6) < 1e-9
    with pytest.raises(ValueError):
        calibration_report(df, n_bins=1)
    empty = spark.createDataFrame([], "keep_prob double, label double")
    assert expected_calibration_error(empty) == 0.0
