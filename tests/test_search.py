"""BM25 search tests: independent-implementation parity, bucket-twin
equality, persisted-index partition pruning, deterministic ties."""

from __future__ import annotations

import math

import pytest
import re
from collections import Counter

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _py_bm25(texts: dict, query: list, k1=1.2, b=0.75):
    """Independent reference BM25 (same normalization contract)."""
    tok = {d: [t for t in re.sub(r"[^a-z0-9]+", " ", s.lower()).split()
               if t] for d, s in texts.items()}
    n = len(tok)
    avgdl = sum(len(v) for v in tok.values()) / n
    scores = {}
    for term in sorted(set(query)):
        df = sum(1 for v in tok.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
        for d, v in tok.items():
            tf = Counter(v)[term]
            if not tf:
                continue
            dl = len(v)
            scores[d] = scores.get(d, 0.0) + idf * (
                tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dl / avgdl))
    return {d: round(s, 6) for d, s in scores.items()}


def test_bm25_matches_independent_reference(spark):
    from trial_data_ingestion_spark.operators.search import bm25_topk
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    query = "hash join spill partition"
    got = bm25_topk(docs, query, k=15).collect()
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    ref = _py_bm25(texts, query.split())
    ref_top = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    assert [(r["doc_id"], r["score"]) for r in got] == ref_top


def test_bm25_bucket_twin_matches_spark(spark):
    from trial_data_ingestion_spark.operators.search import (
        _bucket_of, bm25_postings,
    )
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .limit(50).select("doc_id", "text"))
    post = bm25_postings(docs).select("term", "term_bucket").distinct()
    for r in post.collect():
        assert _bucket_of(r["term"], 64) == r["term_bucket"], r["term"]


def test_bm25_persisted_postings_prune_partitions(spark, tmp_path):
    """The index pattern: postings persisted partitionBy(term_bucket),
    a search over the persisted table scans only the query terms'
    buckets (PartitionFilters), never the full index."""
    from trial_data_ingestion_spark.operators.search import (
        _bucket_of, bm25_postings, bm25_search, bm25_stats,
    )
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    post = bm25_postings(docs)
    n_docs, avgdl = bm25_stats(post)
    path = str(tmp_path / "postings")
    post.write.partitionBy("term_bucket").mode("overwrite").parquet(path)
    persisted = spark.read.parquet(path)
    terms = ["hash", "join"]
    out = bm25_search(persisted, terms, n_docs, avgdl, k=5)
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    plan = out._jdf.queryExecution().explainString(jmode)
    buckets = sorted({_bucket_of(t, 64) for t in terms})
    assert re.search(
        r"PartitionFilters: \[term_bucket#\d+ IN \(%s\)\]"
        % ",".join(map(str, buckets)), plan), plan[:500]
    assert "In(term, [hash,join])" in plan   # row-group pushdown too
    # and the result equals the unpersisted search
    direct = bm25_search(post, terms, n_docs, avgdl, k=5)
    assert [tuple(r) for r in out.collect()] == \
           [tuple(r) for r in direct.collect()]


def test_bm25_deterministic_tiebreak(spark):
    from trial_data_ingestion_spark.operators.search import bm25_topk
    rows = [(1, "alpha beta"), (2, "alpha beta"), (3, "alpha beta"),
            (4, "gamma delta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [r["doc_id"] for r in
           bm25_topk(docs, "alpha", k=3).collect()]
    assert got == [1, 2, 3]   # equal scores -> ascending doc_id


def test_bm25_empty_query_raises(spark):
    from trial_data_ingestion_spark.operators.search import bm25_search
    import pytest as _pytest
    with _pytest.raises(ValueError):
        bm25_search(None, [], 1, 1.0)


def test_rrf_fuse_known_answer(spark):
    """Hand-computed RRF over two 3-doc rankings (rrf_k=60)."""
    from trial_data_ingestion_spark.operators.search import rrf_fuse
    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)],
                              "doc_id long, rank int")
    b = spark.createDataFrame([(3, 1), (1, 2), (4, 3)],
                              "doc_id long, rank int")
    got = {r["doc_id"]: (round(r["rrf_score"], 9), r["lists_hit"],
                         r["rank"])
           for r in rrf_fuse([a, b], k=10).collect()}
    exp_scores = {1: 1 / 61 + 1 / 62, 3: 1 / 63 + 1 / 61,
                  2: 1 / 62, 4: 1 / 63}
    order = sorted(exp_scores, key=lambda d: (-exp_scores[d], d))
    want = {d: (round(exp_scores[d], 9), 2 if d in (1, 3) else 1,
                order.index(d) + 1)
            for d in exp_scores}
    assert got == want


def test_rrf_fuse_rejects_empty(spark):
    from trial_data_ingestion_spark.operators.search import rrf_fuse
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_hybrid_topk_unions_both_modalities(spark, sf_dir):
    """A doc ranked #1 lexically and a doc ranked #1 by vector must
    both fuse into the hybrid top-k, and two-list hits outrank
    single-list hits at equal positions."""
    from trial_data_ingestion_spark.operators.search import (
        bm25_topk, hybrid_topk,
    )
    from trial_data_ingestion_spark.operators.similarity import (
        topk_bruteforce,
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qtext = "data systems measurement"
    qvec = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]

    fused = hybrid_topk(docs, emb, qtext, list(qvec), dim=64, k=10)
    rows = fused.collect()
    ids = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert len(ids) == 10 and len(set(ids)) == 10

    lex_top = bm25_topk(docs, qtext, k=30).collect()[0]["doc_id"]
    q = spark.createDataFrame([("q0", list(qvec))],
                              "query_id string, query_vec array<float>")
    vec_top = [r["neighbor_id"] for r in
               topk_bruteforce(emb, q, id_col="vec_id", k=30, dim=64,
                               exclude_self=False).collect()
               if r["rank"] == 1][0]
    assert lex_top in ids and vec_top in ids

    # determinism
    again = [r["doc_id"] for r in
             sorted(hybrid_topk(docs, emb, qtext, list(qvec), dim=64,
                                k=10).collect(),
                    key=lambda r: r["rank"])]
    assert again == ids
