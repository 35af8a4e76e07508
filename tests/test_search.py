"""BM25 search tests: independent-implementation parity, bucket-twin
equality, persisted-index partition pruning, deterministic ties."""

from __future__ import annotations

import math
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
