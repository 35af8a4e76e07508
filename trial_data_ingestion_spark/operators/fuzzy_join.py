"""Fuzzy record linkage: edit-distance join with lossless q-gram
blocking.

The reference links records by exact normalized keys (DOI/PMCID,
``doi_utils.py``); real bibliographic corpora also need matching on
near-identical strings (titles with OCR noise, spacing variants).
A naive edit-distance join is O(n*m) Levenshtein calls; the scalable
shape is candidate blocking + verification:

* **q-gram pigeonhole blocking** — ``d`` edits destroy at most
  ``d*q`` of a string's ``len - q + 1`` q-grams, so two strings
  within distance ``d`` MUST share a q-gram whenever
  ``len >= (d + 1) * q``.  Blocking on "any shared q-gram" is
  therefore LOSSLESS for strings at or above that length: explode
  distinct q-grams (codegen'd substring/explode, same machinery as
  ``dedup.shingle_table``), equi-join, distinct pairs.
* **short-string fallback** — strings below the pigeonhole length
  are joined within a +-d length window instead (they are a bounded
  sliver of title-like data; the window join is tiny).
* **verify** — a length-difference prefilter (|len_a - len_b| <= d
  is necessary for distance <= d), then ONE native
  ``F.levenshtein`` per surviving candidate pair.

The blocking is exactness-preserving end to end — the parity test
checks the output equals DuckDB's full nested-loop
``levenshtein() <= d`` over the same inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _grams(df: DataFrame, id_col: str, text_col: str, q: int,
           side: str) -> DataFrame:
    """Distinct (id, gram) rows; codegen explode, no Python."""
    t = F.col(text_col)
    return (df.select(F.col(id_col).alias(f"{side}_id"),
                      t.alias("__t"))
              .where(F.length("__t") >= q)
              .select(f"{side}_id",
                      F.explode(F.sequence(
                          F.lit(1), F.length("__t") - F.lit(q - 1)))
                      .alias("__i"), "__t")
              .select(f"{side}_id",
                      F.col("__t").substr(F.col("__i"), F.lit(q))
                      .alias("gram"))
              .distinct())


def fuzzy_join_pairs(left: DataFrame, right: DataFrame,
                     left_id: str, left_col: str,
                     right_id: str, right_col: str,
                     max_distance: int = 2, q: int = 3) -> DataFrame:
    """(left_id, right_id, distance) for every cross pair within
    ``max_distance`` Levenshtein edits — lossless blocking, exact
    verification (see module docstring).

    Scale shape: the gram join shuffles (id, gram) pairs — O(total
    string length), never O(n*m); hot grams behave like hot shingles
    in the dedup tier (pre-normalize aggressively, raise ``q``, or
    prefilter stopword-only grams for adversarial corpora)."""
    d = max_distance
    min_len = (d + 1) * q
    lt = left.select(F.col(left_id).alias("l_id"),
                     F.col(left_col).alias("l_t"))
    rt = right.select(F.col(right_id).alias("r_id"),
                      F.col(right_col).alias("r_t"))

    lg = _grams(left.where(F.length(left_col) >= min_len),
                left_id, left_col, q, "l")
    rg = _grams(right.where(F.length(right_col) >= min_len),
                right_id, right_col, q, "r")
    long_cands = lg.join(rg, "gram").select("l_id", "r_id").distinct()

    # short sliver: +-d length-window block (either side short — the
    # pigeonhole guarantee needs BOTH strings to be long enough)
    ls = lt.where(F.length("l_t") < min_len + d) \
           .select("l_id", F.length("l_t").alias("l_len"))
    rs_all = rt.select("r_id", F.length("r_t").alias("r_len"))
    short_a = ls.join(rs_all,
                      F.abs(F.col("l_len") - F.col("r_len")) <= d)
    rs = rt.where(F.length("r_t") < min_len + d) \
           .select("r_id", F.length("r_t").alias("r_len"))
    ls_all = lt.select("l_id", F.length("l_t").alias("l_len"))
    short_b = ls_all.join(rs,
                          F.abs(F.col("l_len") - F.col("r_len")) <= d)
    short_cands = (short_a.select("l_id", "r_id")
                   .unionByName(short_b.select("l_id", "r_id"))
                   .distinct())

    cands = long_cands.unionByName(short_cands).distinct()
    return (cands
            .join(lt, "l_id").join(rt, "r_id")
            .where(F.abs(F.length("l_t") - F.length("r_t")) <= d)
            .withColumn("distance", F.levenshtein("l_t", "r_t"))
            .where(F.col("distance") <= d)
            .select(F.col("l_id").alias(left_id),
                    F.col("r_id").alias(right_id), "distance"))
