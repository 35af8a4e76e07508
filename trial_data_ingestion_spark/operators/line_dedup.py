"""Corpus-wide exact line deduplication: every duplicated line is
removed from all but its first occurrence.

Training-data-pipeline tier.  Web and document corpora repeat whole
lines verbatim across pages — navigation bars, cookie banners,
footers, quoted headers — and the C4 / RefinedWeb line of cleaning
pipelines removes repeated lines corpus-wide rather than per page.
This is the line-granularity sibling of
``substring_dedup.remove_repeated_substrings`` (which works on token
runs inside the line structure) and shares its shape:

  1. explode lines with positions (narrow);
  2. only *eligible* lines (trimmed length >= ``min_chars``) enter
     the keyed stage — blank lines and trivial short lines ("1.",
     "---") never shuffle at all and are always kept;
  3. per line key: corpus-first occurrence = lexicographic min of
     ``struct(doc, pos)``, computed with map-side partial
     aggregation (no per-line window sort, so a footer repeated a
     hundred million times cannot skew one task), kept only where
     the count exceeds one;
  4. every later occurrence joins back as a per-doc drop list; the
     rewrite is a native higher-order ``filter`` over the split
     array — documents with no duplicated lines pass through
     byte-identical and never reassemble.

Semantics: lines are the ``\\n``-separated segments of ``text_col``,
compared byte-exactly (leading/trailing whitespace distinguishes
keys; eligibility alone uses the trimmed length).  The kept lines
are re-joined with ``\\n`` preserving original order and any blank
segments, so a doc that loses no lines is byte-identical and one
that loses some keeps every other byte.

Scale notes (100 TB):
  * ``hash_lines=True`` (default) folds each eligible line to
    ``xxhash64`` before the shuffle — 8 bytes of shuffle width per
    occurrence instead of the line text.  A 64-bit collision merges
    two distinct lines (dropping a non-duplicated one) with
    probability ~#lines^2 / 2^65; set ``hash_lines=False`` for the
    exact-string variant (the DuckDB parity test runs both).
  * step 3 is skew-proof by partial aggregation; the join in step 4
    probes with AQE skew splitting enabled.
  * the drop-list rejoining each doc carries only duplicated
    positions — tiny against the corpus — on the doc key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trial_data_ingestion_spark.session import ensure_parallelism


def duplicated_line_occurrences(df: DataFrame, id_col: str = "doc_id",
                                text_col: str = "text",
                                min_chars: int = 10,
                                hash_lines: bool = True) -> DataFrame:
    """(doc, pos) of every eligible line occurrence that is NOT the
    corpus-wide first occurrence of its line — what ``line_dedup``
    drops.  pos is the 0-based line index within the document."""
    occ = (ensure_parallelism(df.select(id_col, text_col))
           .select(F.col(id_col).alias("doc"),
                   F.posexplode(F.split(text_col, "\n", -1))
                    .alias("pos", "line"))
           .where(F.length(F.trim("line")) >= min_chars))
    if hash_lines:
        occ = occ.withColumn("line", F.xxhash64("line"))
    firsts = (occ.groupBy("line")
              .agg(F.min(F.struct("doc", "pos")).alias("__first"),
                   F.count(F.lit(1)).alias("__cnt"))
              .where(F.col("__cnt") > 1)
              .select("line", "__first"))
    return (occ.join(firsts, "line")
            .where((F.col("doc") != F.col("__first.doc"))
                   | (F.col("pos") != F.col("__first.pos")))
            .select("doc", "pos"))


def line_dedup(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text", min_chars: int = 10,
               hash_lines: bool = True) -> DataFrame:
    """Rewrite ``text_col`` with corpus-duplicated lines removed
    (first occurrence kept), adding ``n_removed_lines``.  All other
    columns pass through; documents with no duplicated lines keep
    ``text_col`` byte-identical."""
    dups = duplicated_line_occurrences(df, id_col, text_col,
                                       min_chars, hash_lines)
    drops = (dups.groupBy(F.col("doc").alias(id_col))
             .agg(F.collect_list("pos").alias("__drop")))
    out = df.join(drops, id_col, "left")
    kept = F.filter(F.split(text_col, "\n", -1),
                    lambda l, i: ~F.array_contains("__drop", i))
    return (out.withColumn(
                "n_removed_lines",
                F.coalesce(F.size("__drop"), F.lit(0)).cast("long"))
            .withColumn(
                text_col,
                F.when(F.col("__drop").isNull(), F.col(text_col))
                 .otherwise(F.array_join(kept, "\n")))
            .drop("__drop"))
