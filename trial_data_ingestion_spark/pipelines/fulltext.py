"""The flagship fulltext-enrichment pipeline (SURVEY.md §3.1),
rebuilt as one lazy Spark DAG.

Reference: ``preprocessing/fulltext_enricher.py:105-249`` — eager
pandas stages + driver thread pools.  Here:

    input -> P1 normalize -> P4/P5 dedup -> J4 resume anti-join
          -> S6 idconv (mapInPandas connector)
          -> J1 left join -> S7 efetch+parse (mapInPandas connector)
          -> J2 left join -> P6 min-length gate
          -> records + failures side-output + A1 summary

Catalyst orders the relational stages; the two connector barriers are
the only Python round-trips, and every filter/projection happens
before them (§4.3 pre-UDF pruning).  The failure taxonomy matches the
reference exactly ("idconv: no PMCID", "PMC fetch failed (batched
only)", "abstract_only" — fulltext_enricher.py:199,212,222); the
single-item fallback ladder (S8/S9) is skipped by default, mirroring
``skip_pmc_single_fallback=True`` (fulltext_enricher.py:117) — pass
``single_fallback=True`` to enable EFetch -> OAI-PMH -> EuropePMC
retries for batch misses (pmc.py:156-209,14-58).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trial_data_ingestion_spark.functions.text import (
    body_length, normalize_doi,
)
from trial_data_ingestion_spark.operators.dedup import dedup_exact
from trial_data_ingestion_spark.sources.http_connector import (
    EFETCH_BATCH, IDCONV_BATCH, map_efetch, map_idconv,
)

MIN_FULLTEXT_CHARS = 200  # fulltext_enricher.py:116


def prepare_input(df: DataFrame) -> DataFrame:
    """Normalize/dedup the input worklist (fulltext_enricher.py:120-129):
    default-journal injection (P7), doi_norm (P1), null-drop (P4),
    keep-first dedup (P5) on an explicit order column."""
    if "journal" not in df.columns:
        df = df.withColumn("journal", F.lit(None).cast("string"))
    if "__ord" not in df.columns:
        df = df.withColumn("__ord", F.monotonically_increasing_id())
    if "doi_norm" not in df.columns:
        df = df.withColumn("doi_norm", normalize_doi(F.col("doi")))
    df = df.where(F.col("doi_norm").isNotNull())
    return dedup_exact(df, ["doi_norm"], order_col="__ord")


def run_fulltext(input_df: DataFrame,
                 fetcher_factory: Callable,
                 existing_df: Optional[DataFrame] = None,
                 min_fulltext_chars: int = MIN_FULLTEXT_CHARS,
                 idconv_batch: int = IDCONV_BATCH,
                 efetch_batch: int = EFETCH_BATCH,
                 single_fallback: bool = False,
                 require_fulltext: bool = True,
                 batch_workers: int | None = None) -> dict:
    """Build the pipeline; returns lazy ``records`` / ``failures``
    DataFrames plus the deduped worklist for summary counters.

    ``require_fulltext=False`` (the reference's
    ``--allow-abstract-only``, fulltext_enricher.py:115,211) skips the
    body-length gate entirely: parsed records with short-or-empty
    bodies are KEPT as records instead of failing ``abstract_only``.

    ``batch_workers`` (the reference's ``--batch-workers``,
    cli.py:17) bounds concurrent fetch tasks by repartitioning both
    connector worklists to that count — Spark's twin of the
    reference's thread-pool width (see
    :func:`http_connector.map_idconv`)."""
    prepared = prepare_input(input_df)

    worklist = prepared
    if existing_df is not None and "doi_norm" in existing_df.columns:
        worklist = prepared.join(
            F.broadcast(existing_df.select("doi_norm").distinct()),
            "doi_norm", "left_anti")

    idmap = map_idconv(worklist, fetcher_factory, batch_size=idconv_batch,
                       single_fallback=single_fallback,
                       num_partitions=batch_workers)
    with_ids = worklist.join(idmap, "doi_norm", "left")

    parsed = map_efetch(
        with_ids.where(F.col("pmcid").isNotNull()).select("pmcid"),
        fetcher_factory, batch_size=efetch_batch,
        single_fallback=single_fallback,
        num_partitions=batch_workers)
    assembled = with_ids.join(
        parsed.withColumnsRenamed({"fetch_error": "parse_error"}),
        "pmcid", "left")

    blen = body_length(F.col("sections"))
    status = (
        F.when(F.col("pmcid").isNull(),
               F.coalesce(F.col("fetch_error"), F.lit("idconv: no PMCID")))
         .when(F.col("title").isNull(),
               F.coalesce(F.col("parse_error"),
                          F.lit("PMC fetch failed (batched only)")))
    )
    if require_fulltext:
        status = status.when(blen < min_fulltext_chars,
                             F.lit("abstract_only"))
    status = status.otherwise(F.lit(None))
    classified = assembled.withColumn("__reason", status)

    # P14 canonical record (fulltext_enricher.py:70-80)
    records = (classified.where(F.col("__reason").isNull())
               .select(F.col("doi"),
                       F.col("title"),
                       F.nullif(F.trim(F.coalesce(F.col("journal"),
                                                  F.lit(""))), F.lit(""))
                        .alias("journal"),
                       F.lit("pmc").alias("source"),
                       F.col("pmcid"),
                       F.col("sections"),
                       F.col("abstract")))
    failures = (classified.where(F.col("__reason").isNotNull())
                .select("doi", "journal",
                        F.col("__reason").alias("reason")))
    return {"records": records, "failures": failures,
            "worklist": worklist, "input_unique": prepared}


def summarize(result: dict) -> dict:
    """A1 — run-summary counters (fulltext_enricher.py:234-249).
    Triggers execution; call after persisting records/failures."""
    input_unique = result["input_unique"].count()
    worklist = result["worklist"].count()
    appended = result["records"].count()
    failures = result["failures"].count()
    return {
        "input_unique_doi": input_unique,
        "appended": appended,
        "skipped_existing": input_unique - worklist,
        "failures": failures,
    }
