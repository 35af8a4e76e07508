"""The Gopher / MassiveText quality-rule bundle (Rae et al. 2021,
arXiv:2112.11446 Appendix A) as native Column expressions — the
published heuristic filter set most large-scale text pipelines start
from, alongside the engine's own learned/statistical quality signals
(textstats.quality_score, quality_filter, ngram_lm).

Rules (document KEPT only if every enabled rule passes):

  * word count within [min_words, max_words]           (50..100,000)
  * mean word length within [3, 10] characters
  * symbol-to-word ratio (# or ...) <= 0.1
  * < 90% of lines may start with a bullet character
  * < 30% of lines may end with an ellipsis
  * >= 80% of words contain at least one alphabetic character
  * >= 2 distinct members of a small English stop-word set
    (the "is this running prose at all" check)

Every rule is a codegen'd expression over ONE projection (the
whitespace token array and the line array are each built once and
shared) — zero shuffles, zero Python, streaming-safe; composes with
``hygiene_report``'s signals in the same narrow sweep.  Thresholds
are parameters so per-corpus tuning (the paper tuned per source)
needs no code change.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")
_BULLETS = ("-", "*", "•", "‣", "◦")


@dataclass
class GopherThresholds:
    min_words: int = 50
    max_words: int = 100_000
    min_mean_word_len: float = 3.0
    max_mean_word_len: float = 10.0
    max_symbol_word_ratio: float = 0.1
    max_bullet_line_frac: float = 0.9
    max_ellipsis_line_frac: float = 0.3
    min_alpha_word_frac: float = 0.8
    min_stopword_hits: int = 2


def gopher_flags(text: Column,
                 t: GopherThresholds | None = None) -> Column:
    """Struct of per-rule pass booleans plus ``passes`` (the AND) —
    keep the struct for filter-reason analytics, or gate on
    ``.passes`` directly."""
    t = t or GopherThresholds()
    words = F.filter(F.split(F.trim(text), r"\s+"), lambda w: w != "")
    lines = F.split(text, "\n", -1)
    n_words = F.size(words)
    nz = F.greatest(n_words, F.lit(1))
    n_lines = F.greatest(F.size(lines), F.lit(1))
    mean_len = (F.aggregate(words, F.lit(0).cast("long"),
                            lambda acc, w: acc + F.length(w))
                / nz)
    symbols = (F.size(F.filter(words, lambda w: w.contains("#")))
               + F.size(F.filter(words,
                                 lambda w: w.contains("…")
                                 | w.contains("..."))))
    bullet = F.size(F.filter(
        lines, lambda l: F.trim(l).substr(1, 1).isin(*_BULLETS)))
    ellipsis = F.size(F.filter(
        lines, lambda l: F.trim(l).endswith("...")
        | F.trim(l).endswith("…")))
    alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    lw = F.transform(words, lambda w: F.lower(w))
    stop_hits = F.size(F.filter(
        F.array(*[F.lit(s) for s in STOPWORDS]),
        lambda s: F.array_contains(lw, s)))
    return F.struct(
        ((n_words >= t.min_words)
         & (n_words <= t.max_words)).alias("word_count_ok"),
        ((mean_len >= t.min_mean_word_len)
         & (mean_len <= t.max_mean_word_len)).alias("mean_word_len_ok"),
        (symbols / nz <= t.max_symbol_word_ratio)
        .alias("symbol_ratio_ok"),
        (bullet / n_lines < t.max_bullet_line_frac)
        .alias("bullet_lines_ok"),
        (ellipsis / n_lines < t.max_ellipsis_line_frac)
        .alias("ellipsis_lines_ok"),
        (alpha / nz >= t.min_alpha_word_frac).alias("alpha_words_ok"),
        (stop_hits >= t.min_stopword_hits).alias("stopwords_ok"),
    )


def gopher_report(df: DataFrame, text_col: str = "text",
                  t: GopherThresholds | None = None) -> DataFrame:
    """``df`` plus one boolean column per rule and ``gopher_passes``
    (their AND) — one narrow projection."""
    flags = gopher_flags(F.col(text_col), t)
    out = df.withColumn("__g", flags)
    names = ["word_count_ok", "mean_word_len_ok", "symbol_ratio_ok",
             "bullet_lines_ok", "ellipsis_lines_ok", "alpha_words_ok",
             "stopwords_ok"]
    for nm in names:
        out = out.withColumn(nm, F.col(f"__g.{nm}"))
    passes = F.lit(True)
    for nm in names:
        passes = passes & F.col(nm)
    return out.withColumn("gopher_passes", passes).drop("__g")


def gopher_filter(df: DataFrame, text_col: str = "text",
                  t: GopherThresholds | None = None) -> DataFrame:
    """Rows passing every rule; the flag columns are not kept (use
    :func:`gopher_report` for the per-rule breakdown)."""
    rep = gopher_report(df, text_col, t)
    return rep.where(F.col("gopher_passes")).select(*df.columns)
