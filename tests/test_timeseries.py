"""Time-series subsequence search: z-normalized distance profile vs a
brute-force numpy reference, offset/scale invariance, planted-pattern
retrieval over the events fixture, flat-window exclusion."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pytest

from pyspark.sql import functions as F


def _brute(series, query):
    """O(n*m) reference: z-normalize every window explicitly."""
    n, m = len(series), len(query)
    q = (np.asarray(query) - np.mean(query)) / (np.std(query) or 1.0)
    out = []
    for i in range(n - m + 1):
        w = np.asarray(series[i:i + m], dtype=float)
        sd = w.std()
        if sd == 0:
            out.append(np.inf)
            continue
        wz = (w - w.mean()) / sd
        out.append(float(np.sqrt(((wz - q) ** 2).sum())))
    return np.array(out)


def test_distance_profile_matches_bruteforce():
    from trial_data_ingestion_spark.operators.timeseries import (
        znorm_distances,
    )
    rng = np.random.default_rng(5)
    s = rng.normal(size=300).cumsum()
    q = rng.normal(size=24)
    fast = znorm_distances(s, q)
    slow = _brute(s, q)
    assert fast.shape == slow.shape
    np.testing.assert_allclose(fast, slow, rtol=1e-8, atol=1e-8)
    # flat windows excluded
    s2 = np.concatenate([np.full(50, 7.0), rng.normal(size=50)])
    d2 = znorm_distances(s2, q)
    assert np.isinf(d2[:50 - len(q) + 1]).all()


def test_fft_sliding_dot_matches_direct():
    """The true-MASS FFT path (auto-selected at m >= FFT_MIN_M) must
    agree with direct convolution to float-tail precision, including
    at non-power-of-two sizes and with flat (inf) windows."""
    from trial_data_ingestion_spark.operators.timeseries import (
        FFT_MIN_M, znorm_distances,
    )
    rng = np.random.default_rng(11)
    s = rng.normal(size=1000).cumsum()
    for m in (24, FFT_MIN_M, 257):
        q = rng.normal(size=m)
        direct = znorm_distances(s, q, use_fft=False)
        fft = znorm_distances(s, q, use_fft=True)
        auto = znorm_distances(s, q)
        np.testing.assert_allclose(fft, direct, rtol=1e-7, atol=1e-7)
        np.testing.assert_allclose(auto, direct, rtol=1e-7, atol=1e-7)
    # flat windows are inf on both paths
    s2 = np.concatenate([np.full(300, 3.0), rng.normal(size=300)])
    q2 = rng.normal(size=FFT_MIN_M)
    d_fft = znorm_distances(s2, q2, use_fft=True)
    d_dir = znorm_distances(s2, q2, use_fft=False)
    assert np.isinf(d_fft[:300 - FFT_MIN_M + 1]).all()
    assert (np.isinf(d_fft) == np.isinf(d_dir)).all()


def test_subsequence_topk_finds_planted_pattern(spark):
    """A shared shape planted in three series at different offsets,
    levels, and scales is retrieved as the global top hits — and the
    returned (key, pos) pairs are exact."""
    from trial_data_ingestion_spark.operators.timeseries import (
        subsequence_topk,
    )
    rng = np.random.default_rng(11)
    pattern = np.sin(np.linspace(0, 3 * np.pi, 20))
    t0 = dt.datetime(2024, 1, 1)
    rows, planted = [], {}
    for key, (offset, level, scale) in enumerate(
            [(40, 0.0, 1.0), (120, 100.0, 5.0), (10, -3.0, 0.25)]):
        series = rng.normal(scale=3.0, size=200)
        series[offset:offset + 20] = level + scale * pattern
        planted[key] = offset
        for i, v in enumerate(series):
            rows.append((key, t0 + dt.timedelta(minutes=i), float(v)))
    # a decoy key with pure noise
    for i, v in enumerate(rng.normal(size=200)):
        rows.append((9, t0 + dt.timedelta(minutes=i), float(v)))
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double")
    got = subsequence_topk(df, [float(x) for x in pattern], k=3).collect()
    assert len(got) == 3
    hits = {(r["user_id"], r["start_pos"]) for r in got}
    assert hits == {(kk, planted[kk]) for kk in planted}
    assert all(r["dist"] < 1.0 for r in got)       # near-exact matches
    # timestamps point at the window start
    by_key = {r["user_id"]: r["ts"] for r in got}
    for kk, off in planted.items():
        assert by_key[kk] == t0 + dt.timedelta(minutes=off)


def test_subsequence_topk_on_events_fixture(spark):
    """Runs over the real events table end to end; results are
    deterministic and respect the global-k contract."""
    from tests.conftest import SF_DIR_ORACLE
    from trial_data_ingestion_spark.operators.timeseries import (
        subsequence_topk,
    )
    from trial_data_ingestion_spark.plans.library import _events
    ev = _events(spark, SF_DIR_ORACLE)
    query = [0.0, 1.0, 2.0, 1.0, 0.0, -1.0, -2.0, -1.0]
    a = subsequence_topk(ev, query, k=5).collect()
    b = subsequence_topk(ev, query, k=5).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    assert len(a) == 5
    ds = [r["dist"] for r in a]
    assert ds == sorted(ds)
    # every hit's distance beats any 6th candidate from a bigger k
    c = subsequence_topk(ev, query, k=8).collect()
    assert [tuple(r) for r in c[:5]] == [tuple(r) for r in a]


def test_subsequence_topk_rejects_short_query(spark):
    from trial_data_ingestion_spark.operators.timeseries import (
        subsequence_topk,
    )
    df = spark.createDataFrame([(0, dt.datetime(2024, 1, 1), 1.0)],
                               "user_id long, ts timestamp, value double")
    with pytest.raises(ValueError, match="length"):
        subsequence_topk(df, [1.0])


def test_matrix_profile_matches_bruteforce():
    """Profile + index vs an O(n^2 m) direct computation with the
    same exclusion zone."""
    from trial_data_ingestion_spark.operators.timeseries import (
        matrix_profile,
    )
    rng = np.random.default_rng(3)
    s = rng.normal(size=120).cumsum()
    m = 12
    prof, pidx = matrix_profile(s, m)
    w = len(s) - m + 1
    excl = m // 2
    ref = np.full(w, np.inf)
    ridx = np.full(w, -1)
    for i in range(w):
        d = _brute(s, s[i:i + m])
        d[max(0, i - excl):min(w, i + excl + 1)] = np.inf
        j = int(np.argmin(d))
        if np.isfinite(d[j]):
            ref[i], ridx[i] = d[j], j
    np.testing.assert_allclose(prof, ref, rtol=1e-7, atol=1e-7)
    assert (pidx == ridx).all()


def test_series_motifs_and_discords(spark):
    """A shape planted twice in one series is that series' top motif
    (the two window starts reference each other); a one-off spike is
    the top discord."""
    from trial_data_ingestion_spark.operators.timeseries import (
        series_motifs,
    )
    rng = np.random.default_rng(7)
    pattern = np.sin(np.linspace(0, 2 * np.pi, 16))
    series = rng.normal(scale=2.0, size=240)
    series[30:46] = 10 * pattern
    series[150:166] = 10 * pattern          # planted repeat
    t0 = dt.datetime(2024, 3, 1)
    rows = [(1, t0 + dt.timedelta(minutes=i), float(v))
            for i, v in enumerate(series)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, value double")
    top = series_motifs(df, m=16, k=1, mode="motif").collect()[0]
    assert {top["start_pos"], top["neighbor_pos"]} == {30, 150}
    assert top["dist"] < 0.5
    # discord mode reproduces the numpy profile's own descending rank
    from trial_data_ingestion_spark.operators.timeseries import (
        matrix_profile,
    )
    prof, _ = matrix_profile(series, 16)
    fin = np.flatnonzero(np.isfinite(prof))
    want = fin[np.argsort(prof[fin])][::-1][:3]
    disc = series_motifs(df, m=16, k=3, mode="discord").collect()
    assert [r["start_pos"] for r in disc] == [int(i) for i in want]
    assert disc[0]["dist"] >= disc[-1]["dist"]
    np.testing.assert_allclose(
        [r["dist"] for r in disc], np.round(prof[want], 9))


def test_series_motifs_mode_guard(spark):
    from trial_data_ingestion_spark.operators.timeseries import (
        series_motifs,
    )
    df = spark.createDataFrame([(0, dt.datetime(2024, 1, 1), 1.0)],
                               "user_id long, ts timestamp, value double")
    with pytest.raises(ValueError, match="motif"):
        series_motifs(df, m=8, mode="weird")


def test_grouped_kernel_exchange_is_pinned_full_width(spark):
    """r12 fan-out pin: the grouped Arrow kernel's exchange must be
    the explicit full-parallelism keyed repartition — AQE coalesces
    shuffles by BYTES and starved the compute-bound scoring stage (2
    tasks on a 32-core master before the fix).  Exactly ONE exchange
    on __key (the groupBy reuses the repartition's partitioning), at
    max(defaultParallelism, spark.sql.shuffle.partitions)."""
    import re

    from trial_data_ingestion_spark.operators.timeseries import (
        subsequence_topk,
    )
    from tests.conftest import SF_DIR_ORACLE
    from trial_data_ingestion_spark.plans.library import _events
    ev = _events(spark, SF_DIR_ORACLE)
    plan = subsequence_topk(ev, [0.0, 1.0, 0.0, -1.0], k=3) \
        ._jdf.queryExecution().executedPlan().toString()
    n = max(spark.sparkContext.defaultParallelism,
            int(spark.conf.get("spark.sql.shuffle.partitions")))
    keyed = re.findall(r"hashpartitioning\(__key#\d+L?, (\d+)\)", plan)
    assert keyed and all(int(x) == n for x in keyed), (n, keyed, plan[:800])
    assert plan.count("Exchange hashpartitioning(__key") == 1, plan[:800]
