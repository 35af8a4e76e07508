"""Bigram LM quality filter: exact parity with an independent python
reference, discrimination between in-domain and junk text, <unk>/
unseen handling, and the no-Python broadcast plan."""

from __future__ import annotations

import math
import random
import re


def _py_fit_score(train_texts, score_texts, vocab_size, k):
    """Independent reference implementation (same normalization)."""
    def toks(s):
        return ["<s>"] + [t for t in
                          re.sub(r"[^a-z0-9]+", " ", s.lower()).split()
                          if t]

    from collections import Counter
    bg_all = Counter()
    for s in train_texts:
        t = toks(s)
        for a, b in zip(t, t[1:]):
            bg_all[(a, b)] += 1
    w2_counts = Counter()
    for (a, b), c in bg_all.items():
        w2_counts[b] += c
    top = sorted(w2_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    vocab = {w for w, _ in top[:vocab_size]} | {"<s>", "<unk>"}

    def m(w):
        return w if w in vocab else "<unk>"

    bg, uni = Counter(), Counter()
    for s in train_texts:
        t = [m(w) for w in toks(s)]
        for a, b in zip(t, t[1:]):
            bg[(a, b)] += 1
            uni[a] += 1
    v = len(vocab)
    out = {}
    for i, s in enumerate(score_texts):
        t = [m(w) for w in toks(s)]
        if len(t) < 2:
            continue
        nll = [-math.log((bg.get((a, b), 0) + k) / (uni.get(a, 0) + k * v))
               for a, b in zip(t, t[1:])]
        out[i] = (len(nll), round(math.exp(sum(nll) / len(nll)), 4))
    return out


def test_perplexity_matches_python_reference(spark):
    from trial_data_ingestion_spark.operators.ngram_lm import (
        fit_ngram_lm, score_perplexity,
    )
    rng = random.Random(11)
    words = ["data", "spark", "model", "the", "of", "pipeline",
             "join", "scan", "filter", "table"]
    train = [" ".join(rng.choice(words) for _ in range(40))
             for _ in range(30)]
    score = [" ".join(rng.choice(words) for _ in range(25))
             for _ in range(8)] + ["zz qq totally unseen words here"]
    tdf = spark.createDataFrame([(t,) for t in train], "text string")
    sdf = spark.createDataFrame(list(enumerate(score)),
                                "doc_id long, text string")
    model = fit_ngram_lm(tdf, vocab_size=8, add_k=0.1)
    got = {r["doc_id"]: (r["n_bigrams"], r["perplexity"]) for r in
           score_perplexity(sdf, model).collect()}
    want = _py_fit_score(train, score, vocab_size=8, k=0.1)
    assert got == want


def test_perplexity_discriminates_in_domain_text(spark):
    from trial_data_ingestion_spark.operators.ngram_lm import (
        fit_ngram_lm, score_perplexity,
    )
    rng = random.Random(3)
    # train on text with strong bigram structure (fixed phrases)
    phrases = ["the data pipeline", "spark executes the plan",
               "a hash join shuffles rows", "the optimizer prunes scans"]
    train = [" . ".join(rng.choice(phrases) for _ in range(12))
             for _ in range(40)]
    tdf = spark.createDataFrame([(t,) for t in train], "text string")
    model = fit_ngram_lm(tdf, vocab_size=100, add_k=0.1)
    in_domain = " . ".join(rng.choice(phrases) for _ in range(10))
    shuffled = in_domain.split()
    rng.shuffle(shuffled)
    sdf = spark.createDataFrame(
        [(1, in_domain), (2, " ".join(shuffled))],
        "doc_id long, text string")
    got = {r["doc_id"]: r["perplexity"] for r in
           score_perplexity(sdf, model).collect()}
    # same tokens, destroyed order: perplexity must rise sharply
    assert got[1] * 2 < got[2], got


def test_scoring_plan_is_native_and_broadcast(spark):
    from trial_data_ingestion_spark.operators.ngram_lm import (
        fit_ngram_lm, score_perplexity,
    )
    from tests.conftest import SF_DIR_ORACLE
    docs = (spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
            .select("doc_id", "text").limit(100))
    model = fit_ngram_lm(docs, vocab_size=500)
    out = score_perplexity(docs, model)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "PythonUDF" not in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
