"""Time-series subsequence similarity search: z-normalized sliding-
window matching over per-key event series (the EDBT/ICDE distributed
time-series-similarity line: find where a query PATTERN occurs in any
series regardless of offset and scale).

Spark-first shape:

  * **series assembly** — one keyed shuffle: ``sort_array(collect_list
    (struct(ts, value)))`` per key builds each ordered series exactly
    once (event tables are long-and-narrow; per-key series are
    bounded by retention, not corpus size).
  * **scoring** — an Arrow-batched ``applyInPandas`` per series:
    z-normalized Euclidean distance of the query against every
    length-m window: O(n) rolling moments (cumulative sums for
    mean/std) plus one sliding dot product via np.convolve — O(n*m),
    cheaper than FFT-based MASS for the short patterns this targets;
    see matrix_profile's docstring for when to switch.  Per-series
    scoring is
    inherently sequential-in-m and vectorizes perfectly in numpy, the
    documented criterion for leaving Column expressions.
  * **top-k** — per-series candidate rows are tiny (k per key);
    global ranking is one ``orderBy . limit`` over k x n_keys rows.

Z-normalized distance is offset/scale invariant: a pattern at value
level 100 matches the same shape at level 3.  Flat windows (zero
variance) cannot be z-normalized and are reported at infinite
distance, never matched.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trial_data_ingestion_spark.session import keyed_parallelism


#: pattern length above which the FFT sliding dot product wins over
#: direct convolution (crossover measured on this container's numpy;
#: direct is cache-friendlier below it)
FFT_MIN_M = 128


def _sliding_dot(s: np.ndarray, q: np.ndarray,
                 use_fft: bool | None) -> np.ndarray:
    """sum_j s[i+j] * q[j] for every window start i.  ``use_fft``
    None = auto (FFT when m >= FFT_MIN_M): direct convolve is O(n*m),
    the FFT path O(N log N) — true MASS (Mueen et al.), the switch
    matrix_profile's docstring promises for large m."""
    n, m = len(s), len(q)
    if use_fft is None:
        use_fft = m >= FFT_MIN_M
    if not use_fft:
        return np.convolve(s, q[::-1], mode="valid")
    size = 1 << int(np.ceil(np.log2(n + m)))
    conv = np.fft.irfft(np.fft.rfft(s, size)
                        * np.fft.rfft(q[::-1], size), size)
    return conv[m - 1:n]


def znorm_distances(series: np.ndarray, query: np.ndarray,
                    use_fft: bool | None = None) -> np.ndarray:
    """Distance profile: z-normalized Euclidean distance between
    ``query`` (length m) and every length-m window of ``series``.
    Rolling sums give the moments in O(n); the sliding dot product is
    O(n*m) direct or O(N log N) via FFT (``use_fft`` None = auto by
    pattern length; both paths agree to ~1e-9 — the FFT's rounding is
    the usual float tail).  Windows with zero variance -> inf."""
    n, m = len(series), len(query)
    if n < m:
        return np.empty(0)
    q = (query - query.mean()) / (query.std() or 1.0)
    s = series.astype(np.float64)
    csum = np.concatenate(([0.0], np.cumsum(s)))
    csum2 = np.concatenate(([0.0], np.cumsum(s * s)))
    win_sum = csum[m:] - csum[:-m]
    win_sum2 = csum2[m:] - csum2[:-m]
    mu = win_sum / m
    var = win_sum2 / m - mu * mu
    sigma = np.sqrt(np.maximum(var, 0.0))
    # sliding dot product of s with q
    dot = _sliding_dot(s, q, use_fft)
    with np.errstate(divide="ignore", invalid="ignore"):
        # dist^2 = 2m(1 - (dot - m*mu*mean(q)) / (m*sigma*std(q)));
        # with q z-normalized: mean(q)=0, std(q)=1
        corr = dot / (m * sigma)
        d2 = 2.0 * m * (1.0 - corr)
    d = np.sqrt(np.maximum(d2, 0.0))
    d[sigma == 0.0] = np.inf
    return d


def subsequence_topk(events: DataFrame, query: list,
                     key_col: str = "user_id", ts_col: str = "ts",
                     value_col: str = "value",
                     k: int = 10,
                     per_series_k: int | None = None) -> DataFrame:
    """Global top-``k`` closest length-m subsequences to ``query``
    across every per-key series: (key, start_pos, start_ts, dist).
    ``per_series_k`` caps candidates per key before the global rank
    (default k — keeping k per series is always enough for a global
    top-k, and it bounds the ranked row count at k x n_keys).
    ``key_col`` must be integral (the output schema types it long);
    hash string keys to ``xxhash64`` first."""
    m = len(query)
    if m < 2:
        raise ValueError("query must have length >= 2")
    psk = per_series_k or k
    q = np.asarray(query, dtype=np.float64)

    def score(grp: pd.DataFrame) -> pd.DataFrame:
        # applyInPandas hands the WHOLE group (a key's rows can span
        # Arrow batches under mapInPandas — grouped-map is the only
        # per-series-complete contract)
        grp = grp.sort_values("__ts", kind="mergesort")
        vals = grp["__v"].to_numpy(dtype=np.float64)
        d = znorm_distances(vals, q)
        empty = pd.DataFrame({"key": pd.Series(dtype="int64"),
                              "start_pos": pd.Series(dtype="int64"),
                              "start_ts": pd.Series(dtype=grp["__ts"].dtype),
                              "dist": pd.Series(dtype="float64")})
        if len(d) == 0:
            return empty
        nk = min(psk, len(d))
        idx = np.argpartition(d, nk - 1)[:nk]
        idx = idx[np.isfinite(d[idx])]
        if len(idx) == 0:
            return empty
        ts = grp["__ts"].to_numpy()
        return pd.DataFrame({
            "key": grp["__key"].iloc[0],
            "start_pos": idx.astype("int64"),
            "start_ts": ts[idx],
            "dist": np.round(d[idx], 9)})

    # keyed_parallelism, not ensure_parallelism (r12): the grouped
    # kernel's OWN shuffle is what needs the fan-out — a round-robin
    # pre-shuffle still leaves groupBy's exchange AQE-coalesced by
    # bytes (measured: the scoring stage ran as 2 tasks on 32 cores;
    # pinning the keyed exchange cut b20 3.49 -> measured below),
    # while the keyed repartition IS the grouping exchange.
    src = keyed_parallelism(
        events.select(F.col(key_col).alias("__key"),
                      F.col(ts_col).alias("__ts"),
                      F.col(value_col).alias("__v")), "__key")
    ts_type = dict(src.dtypes)["__ts"]
    out = src.groupBy("__key").applyInPandas(
        score,
        f"key long, start_pos long, start_ts {ts_type}, dist double")
    return (out.orderBy(F.asc("dist"), F.asc("key"), F.asc("start_pos"))
            .limit(k)
            .select(F.col("key").alias(key_col), "start_pos",
                    F.col("start_ts").alias(ts_col), "dist"))


def matrix_profile(series: np.ndarray, m: int,
                   exclusion: int | None = None) -> tuple:
    """(profile, profile_index): for every length-``m`` window, the
    z-normalized distance to its nearest NON-TRIVIAL neighbor in the
    same series (the Matrix Profile of Yeh et al. 2016).  Trivial
    matches — windows overlapping the query window by more than
    ``exclusion`` (default m // 2) positions — are masked, else every
    window would match itself.  Cost: the inner distance profile is
    O(n*m) per call for short patterns and switches to true MASS
    (FFT, O(n log n) per call) automatically at m >= FFT_MIN_M, so
    the full profile is O(n^2 * m) / O(n^2 log n) respectively —
    fine for the retention-bounded per-series n that is this
    module's scale contract; size capacity plans accordingly."""
    n = len(series)
    w = n - m + 1
    if w < 2:
        return np.empty(0), np.empty(0, dtype=np.int64)
    excl = m // 2 if exclusion is None else exclusion
    prof = np.full(w, np.inf)
    pidx = np.full(w, -1, dtype=np.int64)
    s = np.asarray(series, dtype=np.float64)
    for i in range(w):
        d = znorm_distances(s, s[i:i + m])
        lo, hi = max(0, i - excl), min(w, i + excl + 1)
        d[lo:hi] = np.inf
        j = int(np.argmin(d))
        if np.isfinite(d[j]):
            prof[i], pidx[i] = d[j], j
    return prof, pidx


def series_motifs(events: DataFrame, m: int,
                  key_col: str = "user_id", ts_col: str = "ts",
                  value_col: str = "value",
                  k: int = 5, mode: str = "motif") -> DataFrame:
    """Per-key Matrix-Profile extremes, globally ranked:

    * ``mode="motif"`` — the k LOWEST profile entries (the most
      repeated shape in each series: its top motif pair), ranked by
      ascending distance.
    * ``mode="discord"`` — the k HIGHEST finite entries (the
      subsequence LEAST like anything else in its series — the
      classic anomaly/discord definition), descending.

    Output: (key, start_pos, neighbor_pos, start_ts, dist).  Same
    execution shape as :func:`subsequence_topk`: one keyed shuffle,
    the grouped Arrow kernel, tiny per-series candidate sets, one
    global rank."""
    if mode not in ("motif", "discord"):
        raise ValueError(f"mode must be motif|discord, got {mode!r}")
    if m < 2:
        raise ValueError("window length m must be >= 2")

    def score(grp: pd.DataFrame) -> pd.DataFrame:
        grp = grp.sort_values("__ts", kind="mergesort")
        vals = grp["__v"].to_numpy(dtype=np.float64)
        prof, pidx = matrix_profile(vals, m)
        empty = pd.DataFrame({"key": pd.Series(dtype="int64"),
                              "start_pos": pd.Series(dtype="int64"),
                              "neighbor_pos": pd.Series(dtype="int64"),
                              "start_ts": pd.Series(dtype=grp["__ts"].dtype),
                              "dist": pd.Series(dtype="float64")})
        fin = np.flatnonzero(np.isfinite(prof))
        if len(fin) == 0:
            return empty
        order = fin[np.argsort(prof[fin])]
        take = order[:k] if mode == "motif" else order[::-1][:k]
        ts = grp["__ts"].to_numpy()
        return pd.DataFrame({
            "key": grp["__key"].iloc[0],
            "start_pos": take.astype("int64"),
            "neighbor_pos": pidx[take].astype("int64"),
            "start_ts": ts[take],
            "dist": np.round(prof[take], 9)})

    # same keyed fan-out rationale as subsequence_topk above
    src = keyed_parallelism(
        events.select(F.col(key_col).alias("__key"),
                      F.col(ts_col).alias("__ts"),
                      F.col(value_col).alias("__v")), "__key")
    ts_type = dict(src.dtypes)["__ts"]
    out = src.groupBy("__key").applyInPandas(
        score, f"key long, start_pos long, neighbor_pos long, "
               f"start_ts {ts_type}, dist double")
    ranked = (out.orderBy(F.asc("dist"), F.asc("key"), F.asc("start_pos"))
              if mode == "motif" else
              out.orderBy(F.desc("dist"), F.asc("key"), F.asc("start_pos")))
    return (ranked.limit(k)
            .select(F.col("key").alias(key_col), "start_pos",
                    "neighbor_pos", F.col("start_ts").alias(ts_col),
                    "dist"))
