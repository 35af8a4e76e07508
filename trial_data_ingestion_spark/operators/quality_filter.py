"""Trainable quality filter: logistic regression over the hygiene
signals, MLlib-native.

North-star training-data-pipeline tier.  The heuristic
``textstats.quality_score`` is a fixed formula; production corpora
train a lightweight classifier on labeled good/bad examples instead
(the published recipe: GPT-3's LR-over-features quality filter,
CCNet's fasttext filter).  This operator is that step, Spark-first:
``pyspark.ml`` LogisticRegression over the numeric columns of
:func:`textstats.hygiene_report` (plus any caller-supplied signals),
so training is a distributed MLlib job and inference is JVM-side
model.transform — no Python in either hot path.

Scale (100 TB): fit on a labeled sample (thousands to millions of
rows — labels are the scarce resource, not compute); score the full
corpus with one narrow projection per document.  The model is a
coefficient vector; persist with ``model.save(path)`` /
``PipelineModel.load`` to reuse across sweeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: hygiene_report columns that are numeric model features
DEFAULT_FEATURES = ["quality", "n_tokens", "n_subwords", "n_chars",
                    "punct_ratio", "repeated_line_ratio",
                    "top_bigram_ratio"]


def _detach_training_summary(model):
    """Drop the fitted LogisticRegression's ``trainingSummary`` from a
    PipelineModel's stages (diagnostic-only; nothing here reads it).

    The summary object pins the live SparkSession, and ``transform``'s
    prediction UDF captures the whole model — so a retained summary
    drags the session (whose ``ObservationManager`` is not
    java-serializable in Spark 4.1) into every task closure.  The
    failure is order-dependent at the suite level, which is exactly
    why the field is stripped unconditionally at fit time rather than
    worked around in tests.  Best-effort via the JVM setter; a model
    loaded from disk never has a summary, so the save/load path is
    already clean."""
    try:
        stages = getattr(model, "stages", None) or [model]
        for st in stages:
            j = getattr(st, "_java_obj", None)
            if j is not None and getattr(st, "hasSummary", False):
                from pyspark import SparkContext

                empty = SparkContext._active_spark_context \
                    ._jvm.scala.Option.empty()
                j.setSummary(empty)
    except Exception:
        pass          # diagnostics field only — never fail a fit on it
    return model


def fit_quality_filter(labeled: DataFrame,
                       feature_cols: list[str] | None = None,
                       label_col: str = "label",
                       max_iter: int = 50):
    """Train on a labeled hygiene-report DataFrame (1.0 = keep,
    0.0 = drop).  Returns a fitted ``PipelineModel`` whose
    ``transform`` adds ``probability``/``prediction``."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    cols = feature_cols or DEFAULT_FEATURES
    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=cols, outputCol="__raw",
                        handleInvalid="keep"),
        StandardScaler(inputCol="__raw", outputCol="__features",
                       withMean=True, withStd=True),
        LogisticRegression(featuresCol="__features",
                           labelCol=label_col, maxIter=max_iter),
    ])
    casted = labeled.withColumn(label_col,
                                F.col(label_col).cast("double"))
    for c in cols:
        casted = casted.withColumn(c, F.col(c).cast("double"))
    return _detach_training_summary(pipe.fit(casted))


def fit_text_quality_filter(labeled: DataFrame,
                            text_col: str = "text",
                            label_col: str = "label",
                            n_features: int = 1 << 18,
                            use_bigrams: bool = True,
                            max_iter: int = 50):
    """Train a fastText-style BAG-OF-HASHED-NGRAMS classifier on raw
    text (the CCNet / GPT-3 / LLaMA data-filter recipe: the model sees
    the words themselves, not hand-built hygiene signals).  Pipeline is
    MLlib-native end to end — RegexTokenizer → word bigrams → HashingTF
    (hashing trick, no vocabulary shuffle) → LogisticRegression — so
    training is a distributed JVM job and inference is one JVM-side
    ``model.transform``; there is no Python and no fit-time vocabulary
    to broadcast at 100 TB.  Labels: 1.0 = keep, 0.0 = drop.

    Complements :func:`fit_quality_filter` (signal-based): the hashed
    n-gram model catches *topical* junk (spam vocabulary, boilerplate
    phrases) that length/punctuation signals cannot see."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import (HashingTF, NGram, RegexTokenizer,
                                    VectorAssembler)

    stages = [RegexTokenizer(inputCol=text_col, outputCol="__words",
                             pattern=r"[^\p{L}\p{N}]+", minTokenLength=1)]
    tf_cols = []
    stages.append(HashingTF(inputCol="__words", outputCol="__tf1",
                            numFeatures=n_features))
    tf_cols.append("__tf1")
    if use_bigrams:
        stages.append(NGram(n=2, inputCol="__words", outputCol="__bi"))
        stages.append(HashingTF(inputCol="__bi", outputCol="__tf2",
                                numFeatures=n_features))
        tf_cols.append("__tf2")
    if len(tf_cols) == 1:
        feat_col = tf_cols[0]
    else:
        feat_col = "__features"
        stages.append(VectorAssembler(inputCols=tf_cols,
                                      outputCol=feat_col))
    stages.append(LogisticRegression(featuresCol=feat_col,
                                     labelCol=label_col,
                                     maxIter=max_iter,
                                     regParam=1e-4))
    casted = labeled.withColumn(label_col,
                                F.col(label_col).cast("double"))
    return _detach_training_summary(Pipeline(stages=stages).fit(casted))


def apply_text_quality_filter(df: DataFrame, model,
                              threshold: float = 0.5,
                              keep_col: str = "keep",
                              prob_col: str = "keep_prob") -> DataFrame:
    """Score raw-text rows with a :func:`fit_text_quality_filter`
    model; adds ``keep_prob``/``keep`` and keeps every row (audit
    trail — chain ``.where(keep_col)`` to materialize)."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    prob = vector_to_array(F.col("probability")).getItem(1)
    drop = [c for c in ("__words", "__bi", "__tf1", "__tf2",
                        "__features", "rawPrediction", "probability",
                        "prediction") if c in scored.columns]
    return (scored
            .withColumn(prob_col, F.round(prob, 6))
            .withColumn(keep_col, F.col(prob_col) >= threshold)
            .drop(*drop))


def apply_quality_filter(df: DataFrame, model,
                         threshold: float = 0.5,
                         keep_col: str = "keep",
                         prob_col: str = "keep_prob") -> DataFrame:
    """Score a hygiene-report DataFrame and add ``keep_prob`` (P of
    the keep class) and boolean ``keep``.  Rows failing the threshold
    are FLAGGED, not dropped — corpus curation wants the audit trail;
    chain ``.where(keep_col)`` to materialize the filtered corpus."""
    from pyspark.ml.functions import vector_to_array

    cols = [f for f in model.stages[0].getInputCols()]
    casted = df
    for c in cols:
        casted = casted.withColumn(c, F.col(c).cast("double"))
    scored = model.transform(casted)
    prob = vector_to_array(F.col("probability")).getItem(1)
    return (scored
            .withColumn(prob_col, F.round(prob, 6))
            .withColumn(keep_col, F.col(prob_col) >= threshold)
            .drop("__raw", "__features", "rawPrediction",
                  "probability", "prediction"))


def calibration_report(scored: DataFrame,
                       prob_col: str = "keep_prob",
                       label_col: str = "label",
                       n_bins: int = 10) -> DataFrame:
    """Reliability table for a scored validation set: one row per
    probability bin — (bin, p_lo, n, mean_prob, frac_positive, gap) —
    the artifact that says whether "keep_prob 0.9" MEANS 90% keepable.
    A filter whose threshold is applied to miscalibrated scores
    silently shifts the corpus quality/volume trade-off, so release
    pipelines publish this next to the model (standard reliability-
    diagram binning; gap = |mean_prob - frac_positive| per bin).

    One narrow projection + one ``n_bins``-row aggregate — nothing
    corpus-scale.  Labels cast to double (1.0 = positive)."""
    if n_bins < 2:
        raise ValueError("n_bins must be >= 2")
    b = F.least(F.floor(F.col(prob_col) * n_bins).cast("int"),
                F.lit(n_bins - 1))
    return (scored
            .select(b.alias("bin"),
                    F.col(prob_col).alias("__p"),
                    F.col(label_col).cast("double").alias("__y"))
            .groupBy("bin")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.avg("__p"), 6).alias("mean_prob"),
                 F.round(F.avg("__y"), 6).alias("frac_positive"))
            .withColumn("p_lo", F.round(F.col("bin")
                                        / F.lit(float(n_bins)), 6))
            .withColumn("gap", F.round(F.abs(
                F.col("mean_prob") - F.col("frac_positive")), 6))
            .select("bin", "p_lo", "n", "mean_prob",
                    "frac_positive", "gap")
            .orderBy("bin"))


def expected_calibration_error(scored: DataFrame,
                               prob_col: str = "keep_prob",
                               label_col: str = "label",
                               n_bins: int = 10) -> float:
    """Scalar ECE: bin-weighted mean of the reliability gaps (the
    single number quoted from :func:`calibration_report`).  Driver-
    side float — the report is <= ``n_bins`` rows."""
    rows = calibration_report(scored, prob_col, label_col,
                              n_bins).collect()
    total = sum(r["n"] for r in rows)
    if total == 0:
        return 0.0
    return sum(r["n"] * r["gap"] for r in rows) / total
