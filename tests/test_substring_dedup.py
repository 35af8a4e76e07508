"""Exact repeated-substring removal: known answers (cross-doc,
within-doc, overlap fusion), first-occurrence preservation, an
independent python reference over real corpus data, hash/string path
agreement, and the skew-proof plan shape."""

from __future__ import annotations

import re

from tests.conftest import SF_DIR


def _py_remove(texts: dict, n: int) -> dict:
    """Independent reference: same semantics, plain python."""
    toks = {d: t.split() for d, t in texts.items()}
    first = {}
    marked = {d: set() for d in texts}
    for d in sorted(toks):                       # (doc, pos) order
        tk = toks[d]
        for i in range(len(tk) - n + 1):
            g = " ".join(tk[i:i + n])
            if g in first:
                marked[d].add(i)
            else:
                first[g] = (d, i)
    out = {}
    for d, tk in toks.items():
        drop = {j for i in marked[d] for j in range(i, i + n)}
        kept = [t for j, t in enumerate(tk) if j not in drop]
        out[d] = (" ".join(kept) if marked[d] else texts[d],
                  len(tk) - len(kept))
    return out


def test_substring_dedup_known_answers(spark):
    from trial_data_ingestion_spark.operators.substring_dedup import (
        remove_repeated_substrings,
    )
    boiler = "this license text is repeated verbatim in every file"
    # context around the boilerplate differs on EVERY side token, so
    # the duplicated region is exactly the 9 boiler tokens (shared
    # neighbors would legitimately extend the duplicated run)
    rows = [
        (1, f"unique alpha prose here : {boiler} ; tail one"),
        (2, f"different beta content entirely , {boiler} ! coda two"),
        (3, "short doc"),
        (4, "completely original text with no duplication at all ok"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["text"], r["n_removed_tokens"]) for r in
           remove_repeated_substrings(df, "doc_id", "text",
                                      n=9).collect()}
    # doc 1 (first occurrence) keeps the boilerplate byte-identically
    assert out[1] == (rows[0][1], 0)
    # doc 2 loses exactly the 9-token duplicated run
    assert boiler not in out[2][0]
    assert out[2][0] == "different beta content entirely , ! coda two"
    assert out[2][1] == 9
    # untouched docs pass through byte-identical
    assert out[3] == ("short doc", 0)
    assert out[4] == (rows[3][1], 0)


def test_substring_dedup_within_doc_and_overlap_fusion(spark):
    from trial_data_ingestion_spark.operators.substring_dedup import (
        remove_repeated_substrings,
    )
    run = "one two three four five"
    # the duplicated run appears twice INSIDE one doc, back to back —
    # overlapping duplicate grams must fuse into one removed region
    text = f"head {run} {run} {run} tail"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = remove_repeated_substrings(df, "doc_id", "text", n=5) \
        .collect()[0]
    assert r["text"].startswith("head one two three four five")
    assert r["text"].endswith("tail")
    assert r["n_removed_tokens"] == 10          # two later copies gone
    assert r["text"].count("one") == 1


def test_substring_dedup_matches_reference_on_corpus(spark):
    """Real-data cross-check: sf0.001 documents with a small n (the
    synthetic corpus repeats 5-gram phrases across docs), hashed and
    exact gram paths both equal to the independent reference."""
    from trial_data_ingestion_spark.operators.substring_dedup import (
        remove_repeated_substrings,
    )
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    # normalize whitespace so the reference's split/join round-trips
    texts = {r["doc_id"]: re.sub(r"\s+", " ", r["text"]).strip()
             for r in docs.collect()}
    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")
    want = _py_remove(texts, n=5)
    for hash_grams in (True, False):
        got = {r["doc_id"]: (r["text"], r["n_removed_tokens"])
               for r in remove_repeated_substrings(
                   df, "doc_id", "text", n=5,
                   hash_grams=hash_grams).collect()}
        assert got == want, f"hash_grams={hash_grams}"
    # the corpus really exercised the operator
    assert sum(v[1] for v in want.values()) > 0


def test_substring_dedup_plan_is_skew_proof_and_native(spark):
    """No window over the gram key (partial-agg min/count instead —
    a million-fold duplicated gram must not sort in one task), no
    Python in the plan, and the gram explode is parallelized."""
    from trial_data_ingestion_spark.operators.substring_dedup import (
        remove_repeated_substrings,
    )
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    out = remove_repeated_substrings(docs, "doc_id", "text", n=20)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "EvalPython" not in plan
    assert "partial_min" in plan or "partial_first" in plan or \
        "HashAggregate" in plan
    assert "RoundRobinPartitioning" in plan      # ensure_parallelism
