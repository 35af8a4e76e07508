"""Hard-negative mining + recall@k over the top-k contract: unit
semantics on a hand-built retrieved table, then end-to-end through
topk_bruteforce on planted geometry."""

from __future__ import annotations

import pytest

from trial_data_ingestion_spark.operators.retrieval import (
    mine_hard_negatives,
    retrieval_recall_report,
)


@pytest.fixture(scope="module")
def retrieved(spark):
    # q1 top-5: gold docs at ranks 1 and 4; q2 top-3: no gold in list
    rows = [("q1", 10, 0.95, 1), ("q1", 11, 0.90, 2),
            ("q1", 12, 0.85, 3), ("q1", 13, 0.80, 4),
            ("q1", 14, 0.75, 5),
            ("q2", 20, 0.99, 1), ("q2", 21, 0.98, 2),
            ("q2", 22, 0.97, 3)]
    return spark.createDataFrame(
        rows, "query_id string, neighbor_id long, score double, rank int")


@pytest.fixture(scope="module")
def positives(spark):
    # q1 gold {10, 13, 99 (never retrieved)}; q2 gold {77}; q3 gold
    # {5} but q3 was never queried -> scores 0 at every k
    return spark.createDataFrame(
        [("q1", 10), ("q1", 13), ("q1", 99), ("q2", 77), ("q3", 5)],
        "query_id string, neighbor_id long")


def test_mine_hard_negatives_known_answer(retrieved, positives):
    negs = mine_hard_negatives(retrieved, positives, num_negatives=2)
    got = {(r["query_id"], r["neighbor_id"], r["neg_rank"])
           for r in negs.collect()}
    # q1: non-gold in rank order = 11, 12, 14 -> keep (11,1), (12,2)
    # q2: nothing gold retrieved -> negatives are 20, 21
    assert got == {("q1", 11, 1), ("q1", 12, 2),
                   ("q2", 20, 1), ("q2", 21, 2)}
    # scores ride along
    scores = {r["neighbor_id"]: r["score"] for r in negs.collect()}
    assert scores[11] == 0.90 and scores[20] == 0.99


def test_mine_hard_negatives_all_gold_topk(spark, positives):
    solid = spark.createDataFrame(
        [("q1", 10, 1.0, 1), ("q1", 13, 0.9, 2)],
        "query_id string, neighbor_id long, score double, rank int")
    assert mine_hard_negatives(solid, positives).count() == 0


def test_recall_report_known_answer(retrieved, positives):
    rep = {r["k"]: r for r in
           retrieval_recall_report(retrieved, positives,
                                   ks=(1, 3, 5)).collect()}
    # capped recall per query:
    # q1 (3 gold): k=1 -> 1/1; k=3 -> 1/3; k=5 -> 2/3
    # q2 (1 gold): 0 at every k
    # q3 (1 gold, never retrieved): 0 at every k
    assert rep[1]["recall"] == pytest.approx((1.0 + 0 + 0) / 3)
    assert rep[3]["recall"] == pytest.approx((1 / 3 + 0 + 0) / 3)
    assert rep[5]["recall"] == pytest.approx((2 / 3 + 0 + 0) / 3)
    assert all(r["n_queries"] == 3 for r in rep.values())
    with pytest.raises(ValueError):
        retrieval_recall_report(retrieved, positives, ks=())


def test_mrr_known_answer(retrieved, positives):
    from trial_data_ingestion_spark.operators.retrieval import (
        retrieval_mrr,
    )
    row = retrieval_mrr(retrieved, positives).collect()[0]
    # q1 first gold at rank 1 -> 1.0; q2 no gold retrieved -> 0;
    # q3 never queried -> 0; macro over 3 queries
    assert row["mrr"] == pytest.approx((1.0 + 0.0 + 0.0) / 3)
    assert row["n_queries"] == 3


def test_end_to_end_with_bruteforce_topk(spark):
    """Planted geometry: each query's gold doc is its exact nearest
    neighbor, the decoy its second — mining must return the decoy
    first and recall@1 must be 1.0."""
    from trial_data_ingestion_spark.operators.similarity import (
        topk_bruteforce,
    )
    docs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 1.0]),
         (4, [0.1, 0.9])],
        ["vec_id", "embedding"])
    queries = spark.createDataFrame(
        [(100, [1.0, 0.05]), (200, [0.05, 1.0])],
        ["query_id", "query_vec"])
    gold = spark.createDataFrame([(100, 1), (200, 3)],
                                 "query_id long, neighbor_id long")
    got = topk_bruteforce(docs, queries, k=3, dim=2)
    rep = {r["k"]: r["recall"] for r in
           retrieval_recall_report(got, gold, ks=(1, 3)).collect()}
    assert rep[1] == 1.0 and rep[3] == 1.0
    negs = {r["query_id"]: r["neighbor_id"] for r in
            mine_hard_negatives(got, gold, num_negatives=1).collect()}
    assert negs == {100: 2, 200: 4}
