"""Every bench HEADLINE entry must resolve to a callable — a graded
query, a bench-only extra, or a retired query kept for its timing
history.  Retiring a graded query without updating the bench series
broke `python bench.py` once (q02, round 5); this fails at test time
instead of at the driver's per-round bench run."""

from __future__ import annotations


def test_headline_names_all_resolve():
    import bench
    from trial_data_ingestion_spark.plans import QUERIES

    available = {**QUERIES, **bench._bench_extra()}
    missing = [n for n in bench.HEADLINE if n not in available]
    assert not missing, (
        f"bench HEADLINE entries with no callable: {missing} — "
        "retired queries must be re-exposed via _bench_extra")
    for name in bench.HEADLINE:
        assert callable(available[name]), name


def test_headline_has_no_duplicates():
    import bench
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
