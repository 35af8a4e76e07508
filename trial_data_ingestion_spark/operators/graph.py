"""Distributed PageRank over an edge list — link-authority scores
for crawl curation (rank registrable domains, weight or cap sources
by authority; the role Common-Crawl-derived pipelines give their
domain-rank lists).

Spark-native power iteration (the standard formulation, Page et al.
1999; no GraphX/graphframes dependency — plain DataFrame joins):

  rank'(v) = (1-d)/N + d * (sum_{u->v} rank(u)/outdeg(u)
                            + dangling_mass/N)

Each iteration is ONE keyed shuffle: edges pre-joined with
out-degrees ONCE up front (that product is loop-invariant and
localCheckpointed), then per round a join with the current ranks on
``src`` and a sum by ``dst``.  Dangling mass (nodes with no
out-links) and N are two scalar aggregates; ranks localCheckpoint
each round to truncate lineage — the same iterative-loop hygiene as
dedup's label propagation.

Scale notes (100 TB of crawl):
  * state per round is one (node, rank) row per node — tiny next to
    the edge list; the edge list itself never changes and is scanned
    once per iteration with the SAME partitioning (the join key is
    stable, so AQE reuses the exchange layout).
  * hub nodes (a domain linked by millions) are a groupBy-sum on
    ``dst`` — partial aggregation absorbs the skew; there is no
    per-node collect anywhere.
  * iterations converge geometrically (damping^k); 10-20 rounds is
    the standard operating range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, damping: float = 0.85,
             num_iter: int = 15, src: str = "src",
             dst: str = "dst") -> DataFrame:
    """(node, rank) over the directed edge list; ranks sum to ~1.
    Duplicate edges count once (the classic unweighted formulation);
    self-loops participate like any edge."""
    e = (edges.select(F.col(src).alias("src"),
                      F.col(dst).alias("dst"))
         .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
         .distinct())
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint())
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # loop-invariant: every edge with its source's out-degree
    e_deg = e.join(out_deg, "src").localCheckpoint()
    ranks = nodes.withColumn("rank", F.lit(1.0 / n)).localCheckpoint()
    base = (1.0 - damping) / n
    for _ in range(num_iter):
        dangling = (ranks.join(out_deg,
                               ranks["node"] == out_deg["src"],
                               "left_anti")
                    .agg(F.sum("rank")).collect()[0][0]) or 0.0
        contrib = (e_deg.join(ranks, e_deg["src"] == ranks["node"])
                   .select(F.col("dst").alias("node"),
                           (F.col("rank") / F.col("deg"))
                           .alias("c"))
                   .groupBy("node").agg(F.sum("c").alias("c")))
        ranks = (nodes.join(contrib, "node", "left")
                 .select("node",
                         (F.lit(base)
                          + F.lit(damping)
                          * (F.coalesce(F.col("c"), F.lit(0.0))
                             + F.lit(dangling / n)))
                         .alias("rank"))
                 .localCheckpoint())
    return ranks


def domain_edges(df: DataFrame, src_url: str = "url",
                 dst_url: str = "link") -> DataFrame:
    """(src, dst) registrable-domain edges from page->link URL pairs,
    self-links dropped — feed straight into :func:`pagerank` to rank
    domains by cross-domain link authority."""
    from trial_data_ingestion_spark.functions.url import (
        registered_domain,
    )
    return (df.select(
                registered_domain(F.col(src_url)).alias("src"),
                registered_domain(F.col(dst_url)).alias("dst"))
            .where(F.col("src").isNotNull() & F.col("dst").isNotNull()
                   & (F.col("src") != F.col("dst"))))
