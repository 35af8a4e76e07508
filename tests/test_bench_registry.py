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


def test_incomparable_entries_excluded_from_rolling_best():
    """b02's pre-r5 recorded time measured a Catalyst-pruned subset
    of the work (see bench.INCOMPARABLE_BEFORE); the rolling-best
    loader must not use it as a regression floor."""
    import bench
    best, rounds = bench._load_rolling_baseline()
    assert "BENCH_r04.json" in rounds          # r4 data still loads
    b02 = best.get("b02_decontam_report")
    # either no post-cutoff round exists yet (no floor at all) or the
    # floor comes from a post-r5 file — never the 0.253 r4 artifact
    assert b02 is None or b02 > 0.3


def test_loader_tolerates_parsed_null_round():
    """The driver's BENCH_r05.json has `"parsed": null` (its 2000-char
    tail capture truncated the bench's JSON line).  The loader must
    not crash on it, and must salvage the steady entries the tail
    still holds (r5's tail retains 22 of the 41)."""
    import bench
    best, rounds = bench._load_rolling_baseline()
    assert "BENCH_r05.json" in rounds
    # b09 only exists from r5 on, so its floor can only come from the
    # salvaged tail (or a later round that would never exceed it much)
    assert best.get("b09_incremental_dedup") is not None


def test_tail_recovery_fences_cold_values():
    """Recovery must stop at the steady_passes marker: cold-pass
    values (often 5-10x steady) after it would poison the floor."""
    import bench
    tail = ('ing_dups_blocked": 2.394, "q50_sliding_window": 0.433}, '
            '"steady_passes": 3, "cold_total_sec": 99.9, '
            '"queries_cold": {"q50_sliding_window": 9.433}, "sf": 0.1}')
    got = bench._recover_from_tail(tail)
    # the front-truncated key is dropped; cold values excluded
    assert got == {"q50_sliding_window": 0.433}
    # no marker -> refuse to guess rather than mix steady and cold
    assert bench._recover_from_tail('"q01_pricing_summary": 1.0}') == {}
    assert bench._recover_from_tail("") == {}


def test_scale_entries_resolve():
    """Every SCALE_ENTRIES name must be runnable (graded or bench
    extra) — the scale tier reuses the same callables."""
    import bench
    from trial_data_ingestion_spark.plans import QUERIES

    available = {**QUERIES, **bench._bench_extra()}
    missing = [n for n in bench.SCALE_ENTRIES if n not in available]
    assert not missing


def test_scale_record_gates():
    """The committed BENCH_SCALE.json (produced by `bench.py --scale`
    per tier) must cover every configured tier's entry list and show
    near-linear scaling: wall(Fx) <= gate x wall(1x) per entry, with
    gate = 1.2x linear.  A quadratic or skew cliff reads as ~F^2
    here — this is the measured backing for the README's 100 TB
    design-review claims."""
    import json
    import os

    import bench
    path = os.path.join(os.path.dirname(os.path.abspath(bench.__file__)),
                        "BENCH_SCALE.json")
    assert os.path.exists(path), (
        "BENCH_SCALE.json missing — run `python bench.py --scale` "
        "and commit the record")
    with open(path) as f:
        rec = json.load(f)
    for factor, (names, gate) in bench.SCALE_TIERS.items():
        tier = rec["tiers"].get(str(factor))
        assert tier, (f"tier {factor}x missing — run "
                      f"SPARK_GRAFT_SCALE_FACTOR={factor} "
                      "python bench.py --scale")
        assert tier["factor"] == factor
        assert tier["gate_ratio"] == gate
        assert set(names) <= set(tier["entries"]), (
            f"tier {factor}x record is missing entries — regenerate")
        over = {n: e["ratio"] for n, e in tier["entries"].items()
                if e["ratio"] > gate}
        assert not over, f"tier {factor}x over the scale gate: {over}"
    assert rec["pass"] is True
