"""Trainable quality filter: learns a planted good/bad separation
from hygiene signals, generalizes to held-out docs, keeps the audit
trail, and the scoring plan stays JVM-side."""

from __future__ import annotations

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
