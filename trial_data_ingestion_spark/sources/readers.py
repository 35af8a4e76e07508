"""File readers S1/S3/S4/S5 + v1 record normalization (SURVEY.md §2.1).

Each reader returns a lazy DataFrame with an explicit schema;
normalization/dedup are native expressions so Catalyst can prune and
push down around them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trial_data_ingestion_spark.functions.text import (
    coalesce_fields, normalize_doi,
)
from trial_data_ingestion_spark.operators.dedup import dedup_exact


def read_csv_input(spark: SparkSession, path: str) -> DataFrame:
    """S1 — CSV scan (doi_utils.py:50-60): require a ``doi`` column,
    inject null ``journal`` when absent, add ``doi_norm``, drop nulls,
    keep-first dedup on ``doi_norm`` (file order)."""
    df = spark.read.option("header", True).csv(path)
    if "doi" not in df.columns:
        raise ValueError("CSV must contain a 'doi' column.")
    if "journal" not in df.columns:
        df = df.withColumn("journal", F.lit(None).cast("string"))
    df = (df.withColumn("__ord", F.monotonically_increasing_id())
            .withColumn("doi_norm", normalize_doi(F.col("doi")))
            .where(F.col("doi_norm").isNotNull()))
    return dedup_exact(df, ["doi_norm"], order_col="__ord").drop("__ord")


def read_json_array(spark: SparkSession, path: str,
                    schema=None) -> DataFrame:
    """S3 — whole-file JSON array (a single dict becomes a singleton
    row, mirroring _load_fulltext's dict->list promotion)."""
    reader = spark.read.option("multiLine", True)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_jsonl(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """S4 — line-delimited JSON; blank lines are skipped by the source."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    """S5 — parquet scan (column pruning + predicate pushdown free)."""
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pruning/pushdown guarantees as
    parquet (Spark's built-in ORC v2 source); interchange format for
    Hive-era corpora."""
    return spark.read.orc(path)


def _avro_available(spark: SparkSession) -> bool:
    """The Avro DataSource lives in the separate ``spark-avro``
    module; probe Spark's own datasource registry (a bare
    ``Class.forName`` is not enough — stray avro-core jars make the
    class resolvable while the source stays unregistered)."""
    try:
        spark._jvm.org.apache.spark.sql.execution.datasources \
            .DataSource.lookupDataSource(
                "avro", spark._jsparkSession.sessionState().conf())
        return True
    except Exception:
        return False


def read_avro(spark: SparkSession, path: str) -> DataFrame:
    """Avro scan — row-oriented interchange (Kafka-era corpora).
    Requires the ``spark-avro`` module on the classpath; raises a
    clear error when absent rather than a Java stack trace."""
    if not _avro_available(spark):
        raise NotImplementedError(
            "Avro source requires the spark-avro module "
            "(org.apache.spark:spark-avro); it is not on this "
            "classpath. Use parquet/ORC, or add the package to "
            "spark.jars.packages.")
    return spark.read.format("avro").load(path)


def normalize_articles(df: DataFrame) -> DataFrame:
    """v1 record normalization (normalize.py:36-49): coalesce id/
    full_text aliases into the Article shape.  Missing source columns
    are treated as null."""
    def c(name: str):
        return F.col(name) if name in df.columns else F.lit(None).cast("string")

    return df.select(
        coalesce_fields(c("id"), c("pmcid"), c("pmid")).alias("id"),
        c("title").alias("title"),
        c("doi").alias("doi"),
        coalesce_fields(c("url"), c("link")).alias("url"),
        c("source").alias("source"),
        coalesce_fields(c("full_text"), c("text"), c("body"))
        .alias("full_text"),
    )


def read_input(spark: SparkSession, path: str) -> DataFrame:
    """Extension-dispatch reader (normalize.py:10-34 / doi_utils.py:50-64)."""
    lower = path.lower()
    if lower.endswith(".csv"):
        return read_csv_input(spark, path)
    if lower.endswith((".bib", ".bibtex")):
        from trial_data_ingestion_spark.sources.bibtex import read_bib
        return read_bib(spark, path)
    if lower.endswith(".json"):
        return read_json_array(spark, path)
    if lower.endswith((".jsonl", ".ndjson")):
        return read_jsonl(spark, path)
    if lower.endswith(".parquet"):
        return read_parquet(spark, path)
    raise ValueError(f"Unsupported input type: {path}")
