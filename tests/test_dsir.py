"""DSIR importance resampling: numpy-twin exactness, ranking
behavior, deterministic Gumbel selection, and plan shape."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

from trial_data_ingestion_spark.operators.dsir import (
    DEFAULT_BUCKETS, dsir_select, fit_dsir, hashed_grams,
    score_importance,
)

TARGET = [
    (1, "the reaction of sodium and chlorine yields salt"),
    (2, "acid and base titration measures molar concentration"),
    (3, "the molar mass of the compound determines the yield"),
]
RAW = [
    (10, "the reaction yields salt and the acid measures base"),
    (11, "football scores and league tables for the weekend"),
    (12, "molar concentration of the acid in the titration"),
    (13, "celebrity gossip and red carpet fashion highlights"),
    (14, "compound yield improves when the reaction is heated"),
    (15, "stock markets rally as tech shares jump sharply"),
]
CHEM_IDS = {10, 12, 14}


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _twin_grams(text: str, n_buckets: int) -> list[int]:
    toks = [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split()
            if t]
    grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % n_buckets
            for g in grams]


def _twin_weights(target, raw, docs, n_buckets, a=1.0):
    """Pure-python DSIR: per-bucket smoothed log ratio, per-doc sum."""
    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for _, t in target:
        for b in _twin_grams(t, n_buckets):
            ct[b] = ct.get(b, 0) + 1
    for _, t in raw:
        for b in _twin_grams(t, n_buckets):
            cr[b] = cr.get(b, 0) + 1
    nt, nr = sum(ct.values()), sum(cr.values())
    out = {}
    for i, t in docs:
        bs = _twin_grams(t, n_buckets)
        if not bs:
            continue
        w = sum(math.log((ct.get(b, 0) + a) / (nt + a * n_buckets))
                - math.log((cr.get(b, 0) + a) / (nr + a * n_buckets))
                for b in bs)
        out[i] = (len(bs), w)
    return out


def test_log_weight_matches_python_twin(spark):
    n_buckets = 97  # small space to force collisions on purpose
    model = fit_dsir(_docs(spark, TARGET), _docs(spark, RAW),
                     n_buckets=n_buckets)
    got = {r.doc_id: (r.n_grams, r.log_weight)
           for r in score_importance(
               _docs(spark, RAW), model).collect()}
    want = _twin_weights(TARGET, RAW, RAW, n_buckets)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], f"doc {i} gram count"
        assert got[i][1] == pytest.approx(want[i][1], abs=1e-5), \
            f"doc {i} log weight"


def test_target_like_docs_outrank_noise(spark):
    model = fit_dsir(_docs(spark, TARGET), _docs(spark, RAW),
                     n_buckets=DEFAULT_BUCKETS)
    rows = score_importance(_docs(spark, RAW), model).collect()
    norm = {r.doc_id: r.log_weight / r.n_grams for r in rows}
    chem = [norm[i] for i in CHEM_IDS]
    noise = [v for i, v in norm.items() if i not in CHEM_IDS]
    assert min(chem) > max(noise), (
        f"chemistry-like docs should outrank noise: {norm}")


def test_select_is_deterministic_and_seeded(spark):
    model = fit_dsir(_docs(spark, TARGET), _docs(spark, RAW))
    a = [r.doc_id for r in
         dsir_select(_docs(spark, RAW), model, k=3, seed="s0").collect()]
    b = [r.doc_id for r in
         dsir_select(_docs(spark, RAW), model, k=3, seed="s0").collect()]
    assert a == b and len(a) == 3
    # high-weight docs should dominate the draw even with noise
    assert set(a) & CHEM_IDS
    c = [r.doc_id for r in
         dsir_select(_docs(spark, RAW), model, k=3, seed="s1").collect()]
    assert len(c) == 3  # independent draw; membership may differ


def test_select_key_is_score_plus_twin_gumbel(spark):
    """gumbel_key must equal (normalized) log weight + the md5-derived
    Gumbel noise, recomputed independently here — pins both the
    normalization switch and the content-stable noise derivation."""
    model = fit_dsir(_docs(spark, TARGET), _docs(spark, RAW))
    scored = {r.doc_id: r for r in
              score_importance(_docs(spark, RAW), model).collect()}

    def twin_gumbel(doc_id, seed):
        h = hashlib.md5(f"{seed}|{doc_id}".encode()).hexdigest()
        u = (int(h[:15], 16) + 1.0) / ((1 << 60) + 2)
        return -math.log(-math.log(u))

    for norm in (True, False):
        rows = dsir_select(_docs(spark, RAW), model, k=len(RAW),
                           seed="sX", length_normalize=norm).collect()
        assert len(rows) == len(RAW)
        for r in rows:
            base = (scored[r.doc_id].log_weight
                    / scored[r.doc_id].n_grams if norm
                    else scored[r.doc_id].log_weight)
            assert r.gumbel_key == pytest.approx(
                base + twin_gumbel(r.doc_id, "sX"), abs=1e-6)
        assert rows == sorted(rows, key=lambda r: -r.gumbel_key)


def test_fit_validation(spark):
    with pytest.raises(ValueError, match="smoothing"):
        fit_dsir(_docs(spark, TARGET), _docs(spark, RAW), smoothing=0)
    with pytest.raises(ValueError, match="empty gram stream"):
        fit_dsir(_docs(spark, [(1, "???")]), _docs(spark, RAW))
    model = fit_dsir(_docs(spark, TARGET), _docs(spark, RAW))
    with pytest.raises(ValueError, match="k must be"):
        dsir_select(_docs(spark, RAW), model, k=0)


def test_score_plan_broadcasts_model_and_select_avoids_full_sort(spark):
    """The model join must broadcast (it is <= n_buckets rows) and
    the k-selection must compile to TakeOrderedAndProject, not a
    global Sort exchange."""
    model = fit_dsir(_docs(spark, TARGET), _docs(spark, RAW))
    scored = score_importance(_docs(spark, RAW), model)
    plan = scored._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    # the model is a driver-local count table since r13 (the fused
    # single-aggregate fit), so the WHOLE scoring plan must be
    # join-light: the model attaches as a broadcast of a local
    # relation, never a shuffled join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "InMemoryTableScan" not in plan   # no cached fit subtree
    sel = dsir_select(_docs(spark, RAW), model, k=3)
    splan = sel._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "TakeOrderedAndProject" in splan


def test_greedy_select_is_exact_topk(spark):
    """gumbel=False must return exactly the k best normalized scores
    (ties by id), with gumbel_key == the score itself."""
    model = fit_dsir(_docs(spark, TARGET), _docs(spark, RAW))
    scored = {r.doc_id: r.log_weight / r.n_grams
              for r in score_importance(_docs(spark, RAW),
                                        model).collect()}
    rows = dsir_select(_docs(spark, RAW), model, k=3,
                       gumbel=False).collect()
    got = [r.doc_id for r in rows]
    want = [i for i, _ in sorted(scored.items(),
                                 key=lambda kv: (-kv[1], kv[0]))][:3]
    assert got == want
    for r in rows:
        assert r.gumbel_key == pytest.approx(scored[r.doc_id], abs=1e-9)
