"""Benchmark decontamination: flag/remove training documents that
overlap an evaluation set by token n-grams.

North-star training-data-pipeline tier (BASELINE.json).  The
reference repo has no decontamination; the semantics here follow the
published recipe used by the GPT-3 appendix-C / Llama data cards:
normalize both sides, build token n-grams, and mark a training doc
contaminated when it shares >= ``min_matches`` distinct n-grams with
any benchmark document (n=8..13 typical; lower n = stricter).

Scale design (100 TB corpus, MB-scale benchmark):
  * The benchmark side is SMALL by construction — a distinct-gram
    table of every eval set worth protecting is a few million rows.
    It is therefore the BROADCAST side of one codegen'd hash join;
    the corpus never shuffles by gram.
  * The corpus side explodes grams (narrow), inner-joins the
    broadcast (only matching grams survive — typically a vanishing
    fraction), and aggregates per doc with map-side partial combine.
    Per-doc totals ride along from a pre-explode ``size()`` so the
    only wide operation is the final small join of (doc, matches)
    back onto (doc, total).
  * Everything is native Column expressions (split/sequence/
    transform/md5) — no Python in the plan; the DuckDB oracle
    reproduces grams byte-for-byte (pytest parity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trial_data_ingestion_spark.session import ensure_parallelism


def _norm_tokens(text: Column) -> Column:
    """Lowercased whitespace tokens of punctuation-stripped text —
    the standard decontamination normalization (case/punct variance
    must not hide an overlap)."""
    cleaned = F.regexp_replace(F.lower(text), r"[^a-z0-9]+", " ")
    return F.filter(F.split(F.trim(cleaned), r" +"), lambda t: t != "")


def token_ngrams(text: Column, n: int = 8) -> Column:
    """Array of space-joined token n-grams (non-distinct; callers
    needing set semantics apply array_distinct).  Docs with fewer
    than ``n`` tokens yield an empty array — they cannot be matched,
    mirroring the published recipes which skip short eval items."""
    toks = _norm_tokens(text)
    count = F.size(toks) - (n - 1)
    return F.when(
        count >= 1,
        F.transform(F.sequence(F.lit(1), F.greatest(count, F.lit(1))),
                    lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    ).otherwise(F.array().cast("array<string>"))


def benchmark_gram_table(bench: DataFrame, text_col: str = "text",
                         n: int = 8) -> DataFrame:
    """Distinct n-gram table of the evaluation set: one column ``g``.
    Small enough to broadcast (distinct grams of an eval suite are
    O(benchmark tokens)); persist it once per benchmark release and
    reuse across corpus sweeps."""
    return (bench
            .select(F.explode(token_ngrams(F.col(text_col), n))
                    .alias("g"))
            .distinct())


def contamination_report(corpus: DataFrame, bench_grams: DataFrame,
                         id_col: str = "doc_id",
                         text_col: str = "text",
                         n: int = 8,
                         min_matches: int = 1) -> DataFrame:
    """Per-document contamination report:
    (id, total_grams, matched_grams, contamination_ratio,
    is_contaminated).

    ``matched_grams`` counts DISTINCT overlapping n-grams — repeated
    boilerplate matching one benchmark gram many times is one signal,
    not many."""
    # repartition the pre-explosion (id, text) rows: a single-file
    # scan would otherwise run the gram HOF + explode in ONE task
    # (same discipline as the minhash shingle explode)
    grams = ensure_parallelism(corpus.select(id_col, text_col)).select(
        F.col(id_col),
        token_ngrams(F.col(text_col), n).alias("__grams"))
    totals = grams.select(
        id_col, F.size("__grams").alias("total_grams"))
    matched = _matched_grams(grams, bench_grams, id_col)
    return (totals
            .join(matched, id_col, "left")
            .withColumn("matched_grams",
                        F.coalesce("matched_grams", F.lit(0)))
            .withColumn(
                "contamination_ratio",
                F.when(F.col("total_grams") > 0,
                       F.col("matched_grams").cast("double")
                       / F.col("total_grams")).otherwise(F.lit(0.0)))
            .withColumn("is_contaminated",
                        F.col("matched_grams") >= min_matches))


def _matched_grams(grams: DataFrame, bench_grams: DataFrame,
                   id_col: str) -> DataFrame:
    """(id, matched_grams): distinct overlapping n-grams per doc.
    ``array_distinct`` BEFORE the explode dedups narrowly per row, so
    the aggregate is a plain count — one exchange on ``id_col``
    instead of a two-level count-distinct shuffle."""
    return (grams
            .select(id_col,
                    F.explode(F.array_distinct("__grams")).alias("g"))
            .join(F.broadcast(bench_grams), "g")
            .groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("matched_grams")))


def decontaminate(corpus: DataFrame, bench: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  bench_text_col: str = "text",
                  n: int = 8, min_matches: int = 1,
                  flag_from: DataFrame | None = None) -> DataFrame:
    """Corpus minus contaminated docs (original columns preserved).
    One broadcast join + one per-doc aggregate + one left-anti join —
    no corpus-side gram shuffle at any size.

    Deliberately does NOT route through :func:`contamination_report`:
    the removal decision needs only the matched-gram counts, and the
    report's total/ratio branch would add a third full evaluation of
    the (possibly expensive) upstream corpus plan when composed in a
    pipeline (pipelines.curation plan-census test pins this).

    ``flag_from``: compute the contamination flags from THIS frame's
    (id, text) instead of ``corpus``.  Sound whenever every corpus id
    appears in ``flag_from`` with the same text — extra flagged ids
    are no-ops in the anti-join.  pipelines.curation passes the RAW
    document scan here so the flag subtree skips the expensive
    hygiene/dedup chain the corpus side carries (measured 2x on
    b05_curate)."""
    bg = benchmark_gram_table(bench, bench_text_col, n)
    src = corpus if flag_from is None else flag_from
    grams = ensure_parallelism(src.select(id_col, text_col)).select(
        F.col(id_col),
        token_ngrams(F.col(text_col), n).alias("__grams"))
    flagged = (_matched_grams(grams, bg, id_col)
               .where(F.col("matched_grams") >= min_matches)
               .select(id_col))
    return corpus.join(flagged, id_col, "left_anti")
