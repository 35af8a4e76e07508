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
