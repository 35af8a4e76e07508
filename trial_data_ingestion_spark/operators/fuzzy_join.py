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


#: rows sampled PER SIDE by ``q="auto"``'s length probe: a bounded
#: ``limit()`` reads a handful of parquet row groups — O(1) at any
#: corpus size — and 5k lengths pin a 5th percentile far tighter
#: than the dial needs (q only moves in integer steps).
_AUTO_Q_SAMPLE_ROWS = 5_000


def _auto_q(lt: DataFrame, rt: DataFrame, d: int) -> int:
    """Occupancy-derived gram length: the largest ``q`` that keeps
    (almost) every string on the gram path, from a bounded sample.

    Rationale (r12/r13, measured): collision volume decays ~0.6x per
    +1 of ``q`` while the blocking stays lossless, so the optimum is
    the largest ``q`` for which strings still satisfy the pigeonhole
    length ``len >= (d+1)*q`` WITH the window-sliver margin ``d`` —
    past that, the short-string fallback join absorbs the corpus and
    its length-block quadratic takes over (the measured q=10 cliff on
    40-char windows: 9.4 s vs 1.4-1.8 s at q=8/9).  Solving
    ``(d+1)*q + d <= L`` at a low length percentile gives
    ``q = (L_p5 - d) // (d + 1)``, clamped to [4, 16] (4 = the r5
    default, right for short-title corpora where the window join is
    tiny anyway; 16 caps gram width at hash-key size).  The probe is
    one bounded job; the choice affects ONLY performance — the output
    pair set is identical at every q (pinned by the q-sweep parity
    test and the q57 oracle)."""
    samp = (lt.select(F.length("l_t").alias("L"))
              .limit(_AUTO_Q_SAMPLE_ROWS)
              .unionByName(rt.select(F.length("r_t").alias("L"))
                             .limit(_AUTO_Q_SAMPLE_ROWS)))
    p5 = samp.agg(F.percentile_approx("L", 0.05).alias("p")) \
             .collect()[0]["p"]
    if p5 is None:
        return 4
    return max(4, min(16, int((int(p5) - d) // (d + 1))))


def fuzzy_join_pairs(left: DataFrame, right: DataFrame,
                     left_id: str, left_col: str,
                     right_id: str, right_col: str,
                     max_distance: int = 2,
                     q: int | str = "auto") -> DataFrame:
    """(left_id, right_id, distance) — fixed output names, so both
    sides may use the same id column — for every cross pair within
    ``max_distance`` Levenshtein edits: lossless blocking, exact
    verification (see module docstring).

    Scale shape: the gram join shuffles (id, gram) pairs — O(total
    string length), never O(n*m) — but the count filter's groupBy
    consumes the COLLISION rows, whose volume at fixed ``q`` is the
    birthday term ``sum_g occ_L(g) * occ_R(g) ~ n^2 * p(g)^2``.
    ``q`` is therefore an occupancy knob (same law as SRP planes /
    IVF cells).  ``q="auto"`` (default since r13) derives the dial
    from the data itself — see :func:`_auto_q`; the r12 bench had to
    pass the measured optimum (q=8 on 40-char windows, 3.9x faster
    than the old constant default 4) at every call site, which is
    the wrong place for a data-dependent knob.  The blocking is
    LOSSLESS at every ``q``: strings below ``(d+1)*q`` take the
    exact length-window fallback, so the output never changes —
    only the path split does."""
    d = max_distance
    lt = left.select(F.col(left_id).alias("l_id"),
                     F.col(left_col).alias("l_t"))
    rt = right.select(F.col(right_id).alias("r_id"),
                      F.col(right_col).alias("r_t"))
    if q == "auto":
        q = _auto_q(lt, rt, d)
    elif not isinstance(q, int) or isinstance(q, bool) or q < 1:
        raise ValueError(f"q must be a positive int or 'auto', "
                         f"got {q!r}")
    min_len = (d + 1) * q

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
