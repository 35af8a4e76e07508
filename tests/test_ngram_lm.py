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


def test_perplexity_buckets_global_thirds(spark):
    """Global head/middle/tail: equal-mass thirds by perplexity, and
    the bucket boundaries agree with an exact python quantile split
    (ties aside — the fixture has distinct perplexities)."""
    from trial_data_ingestion_spark.operators.ngram_lm import (
        perplexity_buckets,
    )
    rows = [(i, float(100 + 7 * i)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, perplexity double")
    got = {r["doc_id"]: r["ppl_bucket"]
           for r in perplexity_buckets(df).collect()}
    ppl = dict(rows)
    cut1 = sorted(p for _, p in rows)[29]
    cut2 = sorted(p for _, p in rows)[59]
    for d, p in ppl.items():
        want = "head" if p <= cut1 else ("middle" if p <= cut2 else "tail")
        assert got[d] == want, (d, p, got[d], want)
    counts = {}
    for b in got.values():
        counts[b] = counts.get(b, 0) + 1
    assert counts == {"head": 30, "middle": 30, "tail": 30}


def test_perplexity_buckets_per_language(spark):
    """CCNet semantics: cut points are computed WITHIN each language,
    so a language whose perplexities are globally high still gets its
    own head third."""
    from trial_data_ingestion_spark.operators.ngram_lm import (
        perplexity_buckets,
    )
    rows = ([(i, "en", float(10 + i)) for i in range(30)]
            + [(100 + i, "de", float(1000 + i)) for i in range(30)])
    df = spark.createDataFrame(
        rows, "doc_id long, lang string, perplexity double")
    got = perplexity_buckets(df, by="lang").collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault((r["lang"], r["ppl_bucket"]), []).append(
            r["perplexity"])
    # every language has a 10-doc head third despite the global skew
    assert len(by_lang[("en", "head")]) == 10
    assert len(by_lang[("de", "head")]) == 10
    assert max(by_lang[("de", "head")]) < min(by_lang[("de", "middle")])
    assert max(by_lang[("en", "middle")]) < min(by_lang[("en", "tail")])
    # threshold table joins broadcast; corpus is not shuffled
    plan = (perplexity_buckets(df, by="lang")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_perplexity_buckets_end_to_end_with_lm(spark):
    """Compose fit -> score -> bucket: in-domain text lands in an
    earlier bucket than shuffled-vocabulary noise."""
    from trial_data_ingestion_spark.operators.ngram_lm import (
        fit_ngram_lm, perplexity_buckets, score_perplexity,
    )
    rng = random.Random(3)
    words = ["the", "model", "learns", "from", "clean", "data",
             "and", "text", "quality", "matters"]
    ref = spark.createDataFrame(
        [(i, " ".join(rng.choice(words) for _ in range(30)))
         for i in range(40)], "doc_id long, text string")
    lm = fit_ngram_lm(ref, vocab_size=100)
    sents = ["the model learns from clean data and text",
             "quality matters and the model learns from data",
             "zq xv qq jjk wpp zzt yyb nnm ooq ppr",
             "vvx zzk qqj wwp ttz bby mmn qqo rrp aal"]
    cand = spark.createDataFrame(
        list(enumerate(sents)), "doc_id long, text string")
    out = perplexity_buckets(
        score_perplexity(cand, lm), labels=("head", "tail"))
    got = {r["doc_id"]: r["ppl_bucket"] for r in out.collect()}
    assert got[0] == "head" and got[1] == "head"
    assert got[2] == "tail" and got[3] == "tail"
