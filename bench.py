"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {...}, "sf": ...}

Each query is fully materialized via a count over the result (no
driver-side collect of payload rows).  Queries span the engine's
main physical shapes: scan+agg, shuffle join, window, Arrow-UDF
chunking, LSH dedup, vector top-k.
"""

from __future__ import annotations

import json
import os
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
]


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

    # Two passes per query: pass 1 pays whole-stage-codegen compilation
    # and JVM JIT (one-time on a long-lived cluster), pass 2 is the
    # steady-state cost that scales with data.  Headline value =
    # steady-state; cold total reported alongside.
    cold: dict[str, float] = {}
    steady: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        cold[name] = round(time.perf_counter() - t0, 3)
    for name in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        steady[name] = round(time.perf_counter() - t0, 3)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline-query steady-state wall time, local[" +
                  os.environ.get("SPARK_GRAFT_CPUS", "32") + "]",
        "value": round(sum(steady.values()), 3),
        "unit": "sec",
        "queries": steady,
        "cold_total_sec": round(sum(cold.values()), 3),
        "queries_cold": cold,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
