"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ...}

Each query is fully materialized via a count over the result (no
driver-side collect of payload rows).  Queries span the engine's
main physical shapes: scan+agg, shuffle join, window, Arrow-UDF
chunking, LSH dedup, vector top-k.

Measurement protocol (round 3): one cold pass (whole-stage-codegen
compilation + JVM JIT — one-time on a long-lived cluster), then
STEADY_PASSES steady passes; the reported steady time is the
per-query MEDIAN, so a single GC pause or scheduler hiccup can't
masquerade as a plan regression (round 2's 1.2-1.8x single-pass
drift on sub-second queries was exactly that noise).

Regression gates, applied against the round-1 baseline read from
BENCH_r01.json (one source of truth, no transcribed constants):
  * per-query: median > 2x its r1 time (and above a jitter floor);
  * common-query TOTAL: sum of medians over the baseline's queries
    > 1.3x the r1 total — catches broad slow drift that stays under
    the per-query gate.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

HEADLINE = [
    "q01_pricing_summary",
    "q02_revenue_by_segment",
    "q05_top_orders_per_customer",
    "q12_running_window",
    "q14_doc_stats_by_source",
    "q17_chunk_fixed",
    "q19_minhash_dedup",
    "q20_knn_cosine",
    "q21_text_analysis",
    "q22_sessionize",
    "q28_ngram_jaccard",
    "q31_ivf_topk",
    "q33_window_analytics",
    "q35_top_revenue_orders",
    "q37_brand_supplier_share",
    "q41_percentiles",
    # added in round 2 (not in the r1 baseline):
    "q48_embedding_dups_blocked",   # SRP-blocked near-dup scale path
    "q50_sliding_window",           # 1h/15min sliding window agg
]

STEADY_PASSES = 3
REGRESSION_FACTOR = 2.0
# floor below which jitter dominates and a 2x ratio is meaningless
REGRESSION_MIN_SEC = 0.4
TOTAL_REGRESSION_FACTOR = 1.3

# Declared, expected baseline deltas (not regressions): q19 runs ~35%
# over r1 because near-dup removal became cluster-correct (iterative
# connected components replaced the one-hop drop) in round 2.


def _load_r1_baseline() -> dict[str, float]:
    """Per-query steady seconds from BENCH_r01.json (sf0.1, local[32]).
    The driver wraps the bench's JSON line under a 'parsed' key."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_r01.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        return {}
    doc = doc.get("parsed", doc)
    queries = doc.get("queries", {})
    return {k: float(v) for k, v in queries.items()}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from trial_data_ingestion_spark.plans import QUERIES
    from trial_data_ingestion_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JIT/IO warm-up on a cheap query so steady-state numbers are
    # representative of a long-lived cluster.
    QUERIES["q01_pricing_summary"](spark, sf_dir).count()

    cold: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        cold[name] = round(time.perf_counter() - t0, 3)

    samples: dict[str, list[float]] = {n: [] for n in HEADLINE}
    for _ in range(STEADY_PASSES):
        for name in HEADLINE:
            t0 = time.perf_counter()
            QUERIES[name](spark, sf_dir).count()
            samples[name].append(time.perf_counter() - t0)
    steady = {n: round(statistics.median(s), 3)
              for n, s in samples.items()}

    baseline = _load_r1_baseline()
    regressions: dict = {}
    total_regression: dict = {}
    if sf_dir.rstrip("/").endswith("sf0.1") and baseline:
        for name, base in baseline.items():
            now = steady.get(name)
            if now is None:
                continue
            if now > max(base * REGRESSION_FACTOR, REGRESSION_MIN_SEC):
                regressions[name] = {"r1_sec": base, "now_sec": now,
                                     "factor": round(now / base, 2)}
        for name, r in regressions.items():
            print(f"REGRESSION {name}: {r['r1_sec']}s -> {r['now_sec']}s "
                  f"({r['factor']}x > {REGRESSION_FACTOR}x gate)",
                  file=sys.stderr)

        common = [n for n in baseline if n in steady]
        base_total = sum(baseline[n] for n in common)
        now_total = sum(steady[n] for n in common)
        if base_total > 0 and now_total > base_total * TOTAL_REGRESSION_FACTOR:
            total_regression = {
                "common_queries": len(common),
                "r1_total_sec": round(base_total, 3),
                "now_total_sec": round(now_total, 3),
                "factor": round(now_total / base_total, 2),
            }
            print(f"TOTAL REGRESSION over {len(common)} common queries: "
                  f"{base_total:.2f}s -> {now_total:.2f}s "
                  f"({total_regression['factor']}x > "
                  f"{TOTAL_REGRESSION_FACTOR}x gate)", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline-query steady-state wall time "
                  f"(median of {STEADY_PASSES}), local[" +
                  os.environ.get("SPARK_GRAFT_CPUS", "32") + "]",
        "value": round(sum(steady.values()), 3),
        "unit": "sec",
        "queries": steady,
        "steady_passes": STEADY_PASSES,
        "cold_total_sec": round(sum(cold.values()), 3),
        "queries_cold": cold,
        "regressions_vs_r1": regressions,
        "total_regression_vs_r1": total_regression,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
