"""Retrieval training-data construction and evaluation over the
top-k contract.

Training-data-pipeline tier (north-star; the reference stops at
embedding attachment).  Dense-retriever training (DPR, ANCE,
contrastive fine-tunes) consumes exactly two artifacts this module
builds from any of the engine's top-k searchers (``topk_bruteforce``
/ ``topk_lsh`` / ``topk_ivf`` / the PQ paths — anything emitting
``(query_id, neighbor_id, score, rank)``):

  * **hard negatives** — the top-ranked retrieved docs that are NOT
    gold positives for the query (the model's current confusions);
  * **recall@k** — the per-query fraction of gold positives found in
    the top k, the standard gauge of an ANN index or embedding model
    before it feeds training.

Scale notes (100 TB): both operators touch only the RETRIEVED table
(queries x k rows — orders of magnitude smaller than the corpus) and
the gold-pair table.  Joins are keyed on (query, doc); the per-query
windows run over <= k rows each.  Nothing here rescans the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def mine_hard_negatives(retrieved: DataFrame, positives: DataFrame,
                        num_negatives: int = 8,
                        query_id_col: str = "query_id",
                        neighbor_col: str = "neighbor_id") -> DataFrame:
    """Top-ranked retrieved non-positives per query: anti-join the
    gold pairs, re-rank the survivors by their ORIGINAL retrieval
    rank, keep ``num_negatives`` — the DPR/ANCE hard-negative recipe.
    Output: (query_id, neighbor_id, score, neg_rank).

    A query whose entire top-k is gold yields no rows (nothing to
    confuse with); mine with a larger k upstream if that happens at
    rate."""
    gold = positives.select(query_id_col, neighbor_col).distinct()
    negs = retrieved.join(gold, [query_id_col, neighbor_col],
                          "left_anti")
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("rank").asc(), F.col(neighbor_col).asc())
    return (negs.withColumn("neg_rank", F.row_number().over(w))
            .where(F.col("neg_rank") <= num_negatives)
            .select(query_id_col, neighbor_col, "score", "neg_rank"))


def retrieval_mrr(retrieved: DataFrame, positives: DataFrame,
                  query_id_col: str = "query_id",
                  neighbor_col: str = "neighbor_id") -> DataFrame:
    """Macro mean reciprocal rank: per query, 1/rank of the FIRST
    gold hit in the retrieved list (0 when no gold was retrieved —
    gold-side left join, same visibility rule as the recall report).
    One row: (mrr, n_queries)."""
    gold = positives.select(query_id_col, neighbor_col).distinct()
    first_hit = (retrieved.join(gold, [query_id_col, neighbor_col])
                 .groupBy(query_id_col)
                 .agg(F.min("rank").alias("__r")))
    per_q = (gold.select(query_id_col).distinct()
             .join(first_hit, query_id_col, "left")
             .select(F.coalesce(1.0 / F.col("__r"), F.lit(0.0))
                     .alias("__rr")))
    return per_q.agg(F.avg("__rr").alias("mrr"),
                     F.count(F.lit(1)).alias("n_queries"))


def retrieval_recall_report(retrieved: DataFrame, positives: DataFrame,
                            ks: tuple = (1, 5, 10),
                            query_id_col: str = "query_id",
                            neighbor_col: str = "neighbor_id") -> DataFrame:
    """Macro-averaged capped recall@k: per query,
    ``|gold in top k| / min(k, |gold|)``, averaged over every query
    that HAS gold pairs (a query with no retrieved rows scores 0 —
    left join from the gold side, so index misses are visible, not
    silently dropped).  Output: one row per k —
    (k, recall, n_queries).

    One keyed join + one per-query aggregate; the k-row report
    assembles driver-free via explode over the literal ``ks``."""
    if not ks:
        raise ValueError("ks must be non-empty")
    gold = positives.select(query_id_col, neighbor_col).distinct()
    n_pos = gold.groupBy(query_id_col).agg(
        F.count(F.lit(1)).alias("__n_pos"))
    hits = (retrieved.join(gold, [query_id_col, neighbor_col])
            .groupBy(query_id_col)
            .agg(*[F.sum(F.when(F.col("rank") <= k, 1).otherwise(0))
                   .alias(f"__h{k}") for k in ks]))
    per_q = n_pos.join(hits, query_id_col, "left")
    rows = per_q.select(
        query_id_col, "__n_pos",
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("k"),
                     F.coalesce(F.col(f"__h{k}"), F.lit(0))
                      .alias("__hits"))
            for k in ks])).alias("__e"))
    return (rows.select(
                F.col("__e.k").alias("k"),
                (F.col("__e.__hits")
                 / F.least(F.col("__n_pos"),
                           F.col("__e.k").cast("long"))).alias("__r"))
            .groupBy("k")
            .agg(F.avg("__r").alias("recall"),
                 F.count(F.lit(1)).alias("n_queries"))
            .orderBy("k"))
