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
    return pipe.fit(casted)


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
