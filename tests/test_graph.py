"""PageRank: parity with a numpy power-iteration reference on known
graphs (incl. dangling nodes and hubs), rank-mass conservation,
determinism, domain-edge extraction, and the loop's plan hygiene."""

from __future__ import annotations

import numpy as np

from pyspark.sql import functions as F


def _np_pagerank(edges, damping, iters):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    ix = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {v: 0 for v in nodes}
    for u, _ in set(edges):
        out[u] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nxt = np.full(n, (1.0 - damping) / n)
        dangling = sum(r[ix[v]] for v in nodes if out[v] == 0)
        nxt += damping * dangling / n
        for u, v in set(edges):
            nxt[ix[v]] += damping * r[ix[u]] / out[u]
        r = nxt
    return {v: r[ix[v]] for v in nodes}


def _run(spark, edges, damping=0.85, iters=15):
    from trial_data_ingestion_spark.operators.graph import pagerank
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r["node"]: r["rank"]
           for r in pagerank(df, damping, iters).collect()}
    want = _np_pagerank(edges, damping, iters)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-6
    return got


def test_pagerank_simple_cycle(spark):
    got = _run(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    # symmetric cycle: equal ranks
    assert abs(got["a"] - got["b"]) < 1e-12


def test_pagerank_hub_and_dangling(spark):
    # c is the hub everyone cites; with d -> c, d still has the
    # lowest rank and the dangling-mass path is covered by the
    # numpy reference agreeing
    edges = [("a", "c"), ("b", "c"), ("a", "d"), ("b", "d"), ("d", "c")]
    got = _run(spark, edges)
    assert got["c"] == max(got.values())


def test_pagerank_duplicate_edges_count_once(spark):
    base = [("a", "b"), ("b", "a"), ("a", "c")]
    got1 = _run(spark, base)
    got2 = _run(spark, base + [("a", "b")] * 3)   # dup edges
    for v in got1:
        assert abs(got1[v] - got2[v]) < 1e-12


def test_pagerank_larger_random_graph(spark):
    rng = np.random.default_rng(3)
    nodes = [f"n{i}" for i in range(40)]
    edges = list({(nodes[rng.integers(40)], nodes[rng.integers(40)])
                  for _ in range(150)})
    edges = [(u, v) for u, v in edges if u != v]
    _run(spark, edges, damping=0.85, iters=20)


def test_domain_edges(spark):
    from trial_data_ingestion_spark.operators.graph import (
        domain_edges,
        pagerank,
    )
    rows = [
        ("https://blog.example.com/post", "https://docs.python.org/3/"),
        ("https://example.com/a", "https://www.example.com/b"),  # self
        ("https://news.site.org/x", "https://example.com/a"),
        ("https://news.site.org/y", None),
    ]
    df = spark.createDataFrame(rows, "url string, link string")
    got = {(r["src"], r["dst"]) for r in domain_edges(df).collect()}
    assert got == {("example.com", "python.org"),
                   ("site.org", "example.com")}
    ranks = {r["node"]: r["rank"] for r in pagerank(
        domain_edges(df), num_iter=10).collect()}
    assert set(ranks) == {"example.com", "python.org", "site.org"}


def test_pagerank_no_python_in_plan(spark):
    from trial_data_ingestion_spark.operators.graph import pagerank
    df = spark.createDataFrame([("a", "b"), ("b", "a")],
                               "src string, dst string")
    out = pagerank(df, num_iter=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
