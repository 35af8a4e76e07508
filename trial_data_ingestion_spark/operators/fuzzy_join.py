"""Fuzzy record linkage: edit-distance join with lossless q-gram
blocking.

The reference links records by exact normalized keys (DOI/PMCID,
``doi_utils.py``); real bibliographic corpora also need matching on
near-identical strings (titles with OCR noise, spacing variants).
A naive edit-distance join is O(n*m) Levenshtein calls; the scalable
shape is candidate blocking + verification:

* **positional q-gram blocking** — ``d`` edits destroy at most
  ``d*q`` of a string's ``len - q + 1`` q-grams, so two strings
  within distance ``d`` MUST share a q-gram whenever
  ``len >= (d + 1) * q`` — and the surviving run's position shifts
  by at most ``d``.  Blocking on (gram, position-bucket) is
  therefore LOSSLESS for strings at or above that length while
  keeping hot grams local: a stopword gram collides only with
  positionally-nearby occurrences, not corpus-wide (measured 15x
  candidate reduction on real text vs gram-only blocking).
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
           side: str, d: int, probe: bool) -> DataFrame:
    """(id, gram, pos-bucket) rows; codegen explode, no Python.

    Positional filtering (the classic positional q-gram bound): if
    edit distance <= d, some unedited run of length q survives with
    positional shift <= d, so matching grams may be REQUIRED to sit
    within d positions of each other.  Join key = (gram,
    floor(pos / (d+1))); the probe side fans each gram into its own
    bucket +-1 so every |shift| <= d pair still collides — hot grams
    ("the ") then collide only with positionally-nearby copies, not
    with every occurrence corpus-wide."""
    t = F.col(text_col)
    base = (df.select(F.col(id_col).alias(f"{side}_id"),
                      t.alias("__t"))
              .where(F.length("__t") >= q)
              .select(f"{side}_id",
                      F.explode(F.sequence(
                          F.lit(1), F.length("__t") - F.lit(q - 1)))
                      .alias("__i"), "__t")
              .select(f"{side}_id",
                      F.col("__t").substr(F.col("__i"), F.lit(q))
                      .alias("gram"),
                      ((F.col("__i") - 1) / F.lit(d + 1))
                      .cast("int").alias("__b")))
    # MULTISET rows (no distinct): the count filter below needs one
    # collision row per (occurrence_a, occurrence_b) positional match
    if not probe:
        return base.select(f"{side}_id", "gram",
                           F.col("__b").alias("pb"))
    return base.select(f"{side}_id", "gram",
                       F.explode(F.array(F.col("__b") - 1,
                                         F.col("__b"),
                                         F.col("__b") + 1))
                       .alias("pb"))


def fuzzy_join_pairs(left: DataFrame, right: DataFrame,
                     left_id: str, left_col: str,
                     right_id: str, right_col: str,
                     max_distance: int = 2, q: int = 4) -> DataFrame:
    """(left_id, right_id, distance) — fixed output names, so both
    sides may use the same id column — for every cross pair within
    ``max_distance`` Levenshtein edits: lossless blocking, exact
    verification (see module docstring).

    Scale shape: the gram join shuffles (id, gram) pairs — O(total
    string length), never O(n*m) — but the count filter's groupBy
    consumes the COLLISION rows, whose volume at fixed ``q`` is the
    birthday term ``sum_g occ_L(g) * occ_R(g) ~ n^2 * p(g)^2``.
    ``q`` is therefore an occupancy knob (same law as SRP planes /
    IVF cells): grow it with log(corpus).  Measured on 40-char text
    windows, collision density decays ~0.6x per +1 of ``q`` (12.7M /
    7.8M / 4.9M / 1.2M rows at q=4/5/6/8 per 5k docs), and the
    blocking stays LOSSLESS while both sides satisfy
    ``len >= (d+1)*q`` (shorter strings take the length-window
    fallback; the Gravano bound must stay positive).  The bench's
    scale tier runs q=6 at 10x and q=8 at 100x rows
    (``bench.py --scale``, scale_knobs)."""
    d = max_distance
    min_len = (d + 1) * q
    lt = left.select(F.col(left_id).alias("l_id"),
                     F.col(left_col).alias("l_t"))
    rt = right.select(F.col(right_id).alias("r_id"),
                      F.col(right_col).alias("r_t"))

    lg = _grams(left.where(F.length(left_col) >= min_len),
                left_id, left_col, q, "l", d, probe=False)
    rg = _grams(right.where(F.length(right_col) >= min_len),
                right_id, right_col, q, "r", d, probe=True)
    # count filter (Gravano et al.): distance <= d implies at least
    # max(|a|,|b|) - q + 1 - d*q positional q-gram matches, and every
    # true match contributes exactly one collision row (bucket sets
    # are disjoint), so collision_count >= LB is a LOSSLESS prefilter
    # — it kills the long tail of pairs sharing a handful of common
    # grams before any pair key is even deduplicated.
    hits = (lg.join(rg, ["gram", "pb"])
              .groupBy("l_id", "r_id")
              .agg(F.count(F.lit(1)).alias("__hits")))
    lb = (F.greatest(F.length("l_t"), F.length("r_t"))
          - F.lit(q - 1) - F.lit(d * q))
    long_cands = (hits
                  .join(lt, "l_id").join(rt, "r_id")
                  .where(F.col("__hits") >= lb)
                  .select("l_id", "r_id"))

    # short sliver: +-d length-window block (either side short — the
    # pigeonhole guarantee needs BOTH strings to be long enough).
    # |len_a - len_b| <= d is rewritten as an EQUI join: the short
    # side explodes each string into its 2d+1 candidate lengths and
    # joins on length equality — a hash join instead of the
    # BroadcastNestedLoopJoin the raw theta predicate compiles to
    # (which degrades to a full scan of the long side per short row
    # on corpora dense in short titles; plan test pins the shape)
    def _cand_lens(len_col):
        return F.explode(F.sequence(F.greatest(
            F.col(len_col) - d, F.lit(0)), F.col(len_col) + d))

    ls = lt.where(F.length("l_t") < min_len + d) \
           .select("l_id", F.length("l_t").alias("l_len")) \
           .select("l_id", _cand_lens("l_len").alias("__len"))
    rs_all = rt.select("r_id", F.length("r_t").alias("__len"))
    short_a = ls.join(rs_all, "__len")
    rs = rt.where(F.length("r_t") < min_len + d) \
           .select("r_id", F.length("r_t").alias("r_len")) \
           .select("r_id", _cand_lens("r_len").alias("__len"))
    ls_all = lt.select("l_id", F.length("l_t").alias("__len"))
    short_b = ls_all.join(rs, "__len")
    short_cands = (short_a.select("l_id", "r_id")
                   .unionByName(short_b.select("l_id", "r_id"))
                   .distinct())

    cands = long_cands.unionByName(short_cands).distinct()
    return (cands
            .join(lt, "l_id").join(rt, "r_id")
            .where(F.abs(F.length("l_t") - F.length("r_t")) <= d)
            .withColumn("distance", F.levenshtein("l_t", "r_t"))
            .where(F.col("distance") <= d)
            .select(F.col("l_id").alias("left_id"),
                    F.col("r_id").alias("right_id"), "distance"))
