"""End-to-end curation pipeline: gates drop the planted junk, dedup
keeps one copy per fingerprint, decontamination removes the planted
benchmark copy, splits partition the survivors, and the whole chain
is deterministic."""

from __future__ import annotations

import pytest

import random

from pyspark.sql import functions as F


def _rows():
    rng = random.Random(21)
    words = ["the", "training", "corpus", "holds", "varied", "useful",
             "prose", "about", "data", "systems", "and", "careful",
             "measurement", "of", "quality", "signals"]
    rows = []
    for i in range(60):   # good docs
        rows.append((i, " ".join(rng.choice(words)
                                 for _ in range(rng.randrange(60, 140)))))
    rows.append((100, "too short"))                       # min_tokens gate
    line = "nav bar item repeated forever"
    rows.append((101, "\n".join([line] * 30)))            # repetition gate
    rows.append((102, rows[0][1]))                        # exact duplicate
    rows.append((103, "zz qq xx " * 30))                  # lang gate -> und
    return rows


@pytest.mark.slow
def test_curate_tolerates_signal_name_collisions(spark):
    """documents.parquet itself carries a `lang` column; curate must
    drop the input's copy and attach its own signals without producing
    ambiguous duplicate names (round-4 advice finding)."""
    from tests.conftest import SF_DIR_ORACLE
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate,
    )
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    assert "lang" in docs.columns            # the collision exists
    out = curate(docs, config=CurationConfig(lid="native"))
    assert out.columns.count("lang") == 1
    # downstream selects on the attached signal must resolve
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert langs and langs <= {"en", "es", "fr", "de", "it", "pt"}
    assert out.count() > 0


def test_curate_composed_plan_census(spark):
    """The end-to-end plan a user actually runs, pinned at the wide-op
    level: 1 fingerprint-dedup exchange + 1 matched-gram aggregate
    exchange + 1 benchmark-gram distinct exchange, 2 broadcasts (gram
    table, flagged ids), and NOTHING else wide — no sort-merge join,
    no cartesian, no corpus-side gram shuffle.  The expensive
    hygiene/dedup subtree is evaluated ONCE: contamination flags come
    from the raw scan (decontaminate's flag_from — identical
    fingerprints imply identical grams, so flagging the superset is
    exact), and the report's totals branch is not composed at all."""
    import re

    from tests.conftest import SF_DIR_ORACLE
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate,
    )
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    bench = docs.where(F.col("doc_id") % 97 == 3).select("doc_id", "text")
    out = curate(docs, benchmark=bench,
                 config=CurationConfig(lid="native"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    census = {op: len(re.findall(op, plan)) for op in (
        "Exchange hashpartitioning", "BroadcastExchange",
        "SortMergeJoin", "CartesianProduct", "BatchEvalPython")}
    assert census == {"Exchange hashpartitioning": 3,
                      "BroadcastExchange": 2,
                      "SortMergeJoin": 0,
                      "CartesianProduct": 0,
                      "BatchEvalPython": 0}, (census, plan[:2000])
    # corpus parquet scanned twice (hygiene chain + raw flag chain)
    # + benchmark once
    assert len(re.findall(r"FileScan parquet", plan)) == 3


@pytest.mark.slow
def test_curate_with_substring_dedup_stage(spark):
    """The optional within-corpus substring stage: boilerplate shared
    across surviving docs is removed from all but its first
    occurrence, doc counts are unchanged (it rewrites, not drops),
    and decontamination correctly grams the REWRITTEN text (flags
    cannot come from the raw scan once text changed)."""
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate,
    )
    rows = _rows()
    boiler = ("the training corpus holds varied useful prose about "
              "data systems and careful measurement")   # 14 tokens
    rows = [(i, (t + " . " + boiler) if 10 <= i < 20 else t)
            for i, t in rows]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = CurationConfig(lid="native", substring_dedup_ngram=14)
    out = curate(docs, config=cfg).collect()
    carriers = [r for r in out if 10 <= r["doc_id"] < 20]
    assert len(carriers) == 10
    with_boiler = [r for r in carriers if boiler in r["text"]]
    assert len(with_boiler) == 1                 # first occurrence only
    assert min(r["doc_id"] for r in carriers) == \
        with_boiler[0]["doc_id"]
    # every later carrier loses at least the 14 boiler tokens (shared
    # neighbors like the " . " separator legitimately extend the run)
    assert all(r["n_removed_tokens"] >= 14 for r in carriers
               if r["doc_id"] != with_boiler[0]["doc_id"])


@pytest.mark.slow
def test_curate_end_to_end(spark):
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate,
    )
    rows = _rows()
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(0, rows[5][1])],
                                  "doc_id long, text string")
    out = curate(docs, benchmark=bench,
                 config=CurationConfig(lid="native"))
    got = out.collect()
    ids = sorted(r["doc_id"] for r in got)
    # junk gone
    assert not {100, 101, 103} & set(ids)
    # duplicate family (0, 102): exactly one survivor, the min id —
    # and doc 5 (the planted benchmark item) decontaminated away
    assert 0 in ids and 102 not in ids and 5 not in ids
    # 60 good docs, minus the decontaminated benchmark copy (doc 5);
    # the duplicate pair (0, 102) contributes its min id only
    assert len(ids) == 59
    # every survivor has lang/quality/split attached
    for r in got:
        assert r["lang"] == "en"
        assert r["split"] in {"train", "val", "test"}
        assert r["quality"] >= 0.3
    # splits are a partition with dominant train share
    counts = {s: 0 for s in ("train", "val", "test")}
    for r in got:
        counts[r["split"]] += 1
    assert counts["train"] > counts["val"] + counts["test"]
    # determinism end to end
    again = sorted(r["doc_id"] for r in
                   curate(docs, benchmark=bench,
                          config=CurationConfig(lid="native")).collect())
    assert again == ids


@pytest.mark.slow
def test_curate_redact_pii_stage(spark):
    """redact_pii=True: placeholders in every surviving text, the
    raw values gone, and two docs differing ONLY in the redacted
    value collapse to one exact dupe (redaction runs before
    fingerprinting).  The audit sees the same text: survivor ids
    stay identical to curate()'s."""
    from pyspark.sql import functions as F

    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate, rejection_audit,
    )
    base = ("please contact our support team about the renewal at {} "
            "before the end of the quarter thanks")
    rows = [(0, base.format("alice@corp.io")),
            (1, base.format("bob@other.org")),      # dupe of 0 post-redact
            (2, "a completely different well formed document about "
                "spark shuffle partitioning and broadcast joins")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = CurationConfig(lid="native", redact_pii=True)
    out = curate(docs, config=cfg).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [0, 2]          # 1 became an exact dupe of 0
    texts = {r["doc_id"]: r["text"] for r in out}
    assert "[EMAIL]" in texts[0] and "alice" not in texts[0]
    # off by default: both email docs survive, raw text intact
    off = curate(docs, config=CurationConfig(lid="native")).collect()
    assert sorted(r["doc_id"] for r in off) == [0, 1, 2]
    assert "alice@corp.io" in {r["doc_id"]: r["text"]
                               for r in off}[0]
    # audit parity under the redact config
    audit = rejection_audit(docs, config=cfg)
    survivors = sorted(r["doc_id"] for r in
                       audit.where(F.col("reason").isNull()).collect())
    assert survivors == ids
    reasons = {r["doc_id"]: r["reason"] for r in audit.collect()}
    assert reasons[1] == "exact_dup"


def test_curate_leakage_safe_split(spark):
    """dup_pairs: confirmed near-dup families (too different for the
    exact-fingerprint dedup) land in ONE split; docs outside any pair
    keep exactly the default assignment."""
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate,
    )
    base = ("a perfectly ordinary well formed document about spark "
            "broadcast joins and shuffle partitions number {}")
    docs = spark.createDataFrame(
        [(i, base.format(i)) for i in range(40)],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(3, 17), (17, 29), (8, 31)],
                                  ["doc_a", "doc_b"])
    cfg = CurationConfig(lid="native")
    got = {r["doc_id"]: r["split"] for r in
           curate(docs, config=cfg, dup_pairs=pairs).collect()}
    assert got[3] == got[17] == got[29]
    assert got[8] == got[31]
    plain = {r["doc_id"]: r["split"] for r in
             curate(docs, config=cfg).collect()}
    assert set(got) == set(plain)          # split never drops rows
    paired = {3, 17, 29, 8, 31}
    for i in set(plain) - paired:
        assert got[i] == plain[i]


@pytest.mark.slow
def test_curate_incremental_matches_full(spark, tmp_path):
    """curate(A ∪ B) must equal curate(A) ∪ curate_incremental(B)
    row-for-row when batch ids sort after corpus ids: the delta path
    is a pure optimization, not a different policy."""
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate, curate_incremental,
    )
    rows = _rows()
    # make B contain: fresh docs, a dup of an A doc, an in-batch dup
    b_rows = [(200, "completely new prose about systems and signals "
               * 8),
              (201, rows[1][1]),            # dup of A's doc 1
              (202, "another genuinely new document with plenty of "
               "words to pass every hygiene gate in the pipeline "
               * 6),
              (203, "another genuinely new document with plenty of "
               "words to pass every hygiene gate in the pipeline "
               * 6)]                        # in-batch dup of 202
    cfg = CurationConfig(lid="native")
    a = spark.createDataFrame(rows, "doc_id long, text string")
    b = spark.createDataFrame(b_rows, "doc_id long, text string")
    benchmark = spark.createDataFrame(
        [(0, rows[2][1])], "bench_id long, text string")

    full = curate(a.unionByName(b), benchmark=benchmark, config=cfg)
    curated_a_path = str(tmp_path / "curated_a")
    curate(a, benchmark=benchmark, config=cfg).write.parquet(
        curated_a_path)
    curated_a = spark.read.parquet(curated_a_path)
    inc = curate_incremental(b, curated_a, benchmark=benchmark,
                             config=cfg)

    full_ids = {r["doc_id"]: r["split"] for r in
                full.select("doc_id", "split").collect()}
    a_ids = {r["doc_id"]: r["split"] for r in
             curated_a.select("doc_id", "split").collect()}
    inc_ids = {r["doc_id"]: r["split"] for r in
               inc.select("doc_id", "split").collect()}
    assert {**a_ids, **inc_ids} == full_ids
    assert set(inc_ids) & set(a_ids) == set()
    # the delta really filtered: dup-of-corpus and in-batch dup gone
    assert 201 not in inc_ids and 203 not in inc_ids
    assert 200 in inc_ids and 202 in inc_ids


def test_curate_incremental_is_idempotent(spark, tmp_path):
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate, curate_incremental,
    )
    cfg = CurationConfig(lid="native")
    a = spark.createDataFrame(_rows(), "doc_id long, text string")
    path = str(tmp_path / "curated")
    curate(a, config=cfg).write.parquet(path)
    curated = spark.read.parquet(path)
    again = curate_incremental(a, curated, config=cfg)
    assert again.count() == 0


def test_curate_incremental_rejects_substring_dedup(spark):
    import pytest
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate_incremental,
    )
    cfg = CurationConfig(substring_dedup_ngram=50)
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="corpus-global"):
        curate_incremental(df, df, config=cfg)


def test_curate_with_line_dedup_stage(spark):
    """The optional corpus-wide line-dedup stage: a banner line shared
    across surviving multi-line docs survives exactly once corpus-wide,
    doc counts are unchanged (rewrite, not drop), short separator
    lines are untouched, and the n_removed_lines bookkeeping column
    does not leak into the curated schema."""
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate,
    )
    rows = _rows()
    banner = "subscribe to our newsletter for updates"
    rows = [(i, (banner + "\n---\n" + t) if 10 <= i < 20 else t)
            for i, t in rows]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = CurationConfig(lid="native", line_dedup_min_chars=10)
    out = curate(docs, config=cfg).collect()
    assert "n_removed_lines" not in out[0].asDict()
    carriers = [r for r in out if 10 <= r["doc_id"] < 20]
    assert len(carriers) == 10
    with_banner = [r for r in carriers if banner in r["text"]]
    assert len(with_banner) == 1                 # first occurrence only
    assert min(r["doc_id"] for r in carriers) == \
        with_banner[0]["doc_id"]
    # the short separator line is below min_chars: kept everywhere
    assert all("---" in r["text"] for r in carriers)


def test_curate_incremental_rejects_line_dedup(spark):
    import pytest
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate_incremental,
    )
    cfg = CurationConfig(line_dedup_min_chars=10)
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="line_dedup_incremental"):
        curate_incremental(df, df, config=cfg)


def test_curate_with_gopher_stage(spark):
    """gopher=True composes with the hygiene gate as one narrow
    filter chain: a 30-word doc passes hygiene (min_tokens=8) but
    fails the Gopher word-count floor; the prose docs pass both."""
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate,
    )
    rows = _rows()
    short_prose = " ".join(["the", "training", "and", "of", "data"]
                           * 6)                       # 30 words
    rows.append((104, short_prose))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base = {r["doc_id"] for r in
            curate(docs, config=CurationConfig(lid="native")).collect()}
    assert 104 in base                    # hygiene alone keeps it
    gophered = {r["doc_id"] for r in
                curate(docs, config=CurationConfig(
                    lid="native", gopher=True)).collect()}
    assert 104 not in gophered
    assert gophered                       # prose docs survive
    assert gophered < base


def test_curate_dsir_selection_stage(spark):
    """With a dsir_target and keep_frac, curate() keeps the
    target-likest slice of the CLEAN corpus: output is a subset of
    the no-DSIR run, sized by the quantile threshold, carrying
    dsir_score, and every kept score clears every dropped score's
    threshold side."""
    from tests.conftest import SF_DIR_ORACLE

    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate,
    )
    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    target = docs.where("doc_id % 17 = 3").select("text")

    base_cfg = CurationConfig()
    base = curate(docs, config=base_cfg)
    base_ids = {r.doc_id for r in base.select("doc_id").collect()}

    cfg = CurationConfig(dsir_keep_frac=0.5)
    out = curate(docs, config=cfg, dsir_target=target)
    rows = out.select("doc_id", "dsir_score").collect()
    kept = {r.doc_id for r in rows}
    assert kept <= base_ids
    # quantile threshold: half the clean corpus within approx error
    assert abs(len(kept) - len(base_ids) / 2) <= 0.05 * len(base_ids)
    # the stage is deterministic and the split column still attaches
    rerun = curate(docs, config=cfg, dsir_target=target)
    assert {r.doc_id for r in rerun.select("doc_id").collect()} == kept
    assert "split" in out.columns
    # no target / no frac -> stage off, no score column
    assert "dsir_score" not in base.columns
    off = curate(docs, config=base_cfg, dsir_target=target)
    assert "dsir_score" not in off.columns

    import pytest as _pt
    with _pt.raises(ValueError, match="dsir_keep_frac"):
        curate(docs, config=CurationConfig(dsir_keep_frac=1.5),
               dsir_target=target)


def test_curate_with_url_filter_stage(spark):
    """The optional URL pre-filter: blocklisted-domain and
    keyword-scored docs never reach the hygiene gate, allowlisted
    domains override, and the stage drops the helper columns so the
    output schema matches the un-staged pipeline plus passthroughs."""
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate,
    )
    rows = _rows()
    urls = {100: "https://example.com/a", 101: "https://example.com/b",
            102: "https://example.com/c", 103: "https://example.com/d"}
    wrows = []
    for i, t in rows:
        if i == 0:
            u = "https://spamsite.org/page"            # blocklisted
        elif i == 1:
            u = "https://www.xxxcasino.net/win"        # keyword host hit
        elif i == 2:
            u = "https://sexhealth-example.org/advice"  # allowlisted
        else:
            u = urls.get(i, f"https://ok-{i}.example.com/doc")
        wrows.append((i, t, u))
    docs = spark.createDataFrame(wrows, "doc_id long, text string, url string")
    cfg = CurationConfig(lid="native", url_col="url")
    out = curate(docs, config=cfg,
                 url_blocklist=["spamsite.org"],
                 url_allowlist=["sexhealth-example.org"]).collect()
    ids = {r["doc_id"] for r in out}
    assert 0 not in ids and 1 not in ids           # blocked
    assert 2 in ids                                # allowlist override
    assert 3 in ids                                # untouched good doc
    cols = {c for r in out[:1] for c in r.asDict()}
    assert "url" in cols and "url_keep" not in cols


@pytest.mark.slow
def test_curate_with_trained_quality_model_stage(spark):
    """A fitted fastText-recipe classifier slots into curate(): spam-
    vocabulary docs that pass every hygiene gate are dropped by the
    model, and the keep probability survives as model_quality."""
    from trial_data_ingestion_spark.operators.quality_filter import (
        fit_text_quality_filter,
    )
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate,
    )
    rng = random.Random(9)
    good_words = ["careful", "analysis", "of", "training", "data",
                  "the", "systems", "measure", "quality", "signals"]
    bad_words = ["click", "free", "casino", "winner", "prize", "the",
                 "now", "claim", "bonus", "offer"]
    labeled = [(i, " ".join(rng.choice(good_words if i % 2 == 0
                                       else bad_words)
                            for _ in range(60)),
                1.0 if i % 2 == 0 else 0.0) for i in range(200)]
    model = fit_text_quality_filter(spark.createDataFrame(
        labeled, "doc_id long, text string, label double"),
        n_features=1 << 12)       # small hash space keeps the test fast
    rows = _rows()   # all "good" vocabulary
    spam = [(200 + j, " ".join(rng.choice(bad_words) for _ in range(80)))
            for j in range(5)]
    docs = spark.createDataFrame(rows + spam,
                                 "doc_id long, text string")
    cfg = CurationConfig(lid="native")
    base = {r["doc_id"] for r in curate(docs, config=cfg).collect()}
    assert {200, 201, 202, 203, 204} <= base   # hygiene alone keeps spam
    out = curate(docs, config=cfg, quality_model=model).collect()
    ids = {r["doc_id"] for r in out}
    assert ids & {200, 201, 202, 203, 204} == set()   # model drops it
    assert len(ids) >= 50                              # good docs survive
    assert all(r["model_quality"] >= 0.5 for r in out)


def test_curate_incremental_url_and_model_parity(spark, tmp_path):
    """The per-row stages are incremental-safe: curating a delta with
    url filter + quality model equals the same stages in the full
    pipeline restricted to the delta's fresh fingerprints."""
    from trial_data_ingestion_spark.operators.quality_filter import (
        fit_text_quality_filter,
    )
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate, curate_incremental,
    )
    rng = random.Random(13)
    vocab = ["useful", "prose", "about", "data", "and", "signals",
             "the", "of", "systems", "measurement"]
    mk = lambda i: (i, " ".join(rng.choice(vocab) for _ in range(60)),
                    f"https://www.site-{i % 7}-example.com/p{i}")
    first = [mk(i) for i in range(40)]
    delta = [mk(100 + i) for i in range(20)]
    labeled = [(i, t, 1.0) for i, t, _ in first[:20]] + \
              [(900 + j, "click free casino winner prize now " * 10, 0.0)
               for j in range(20)]
    model = fit_text_quality_filter(spark.createDataFrame(
        labeled, "doc_id long, text string, label double"),
        n_features=1 << 12)
    cfg = CurationConfig(lid="native", url_col="url")
    sch = "doc_id long, text string, url string"
    blocked = ["site-3-example.com"]
    cur0 = curate(spark.createDataFrame(first, sch), config=cfg,
                  url_blocklist=blocked, quality_model=model)
    inc = curate_incremental(
        spark.createDataFrame(delta, sch), cur0, config=cfg,
        url_blocklist=blocked, quality_model=model)
    full = curate(spark.createDataFrame(first + delta, sch), config=cfg,
                  url_blocklist=blocked, quality_model=model)
    inc_rows = sorted((r["doc_id"], r["split"]) for r in inc.collect())
    full_delta = sorted((r["doc_id"], r["split"])
                        for r in full.collect() if r["doc_id"] >= 100)
    assert inc_rows == full_delta and inc_rows
    # the blocklisted domain is absent everywhere
    assert all(d % 7 != 3 for d, _ in inc_rows)


def test_curate_with_perplexity_gate(spark):
    """CCNet stage: a reference LM fitted on good prose pushes
    shuffled-junk docs into the tail bucket and curate(ppl_lm=...)
    drops them; kept rows carry perplexity + ppl_bucket."""
    from trial_data_ingestion_spark.operators.ngram_lm import fit_ngram_lm
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate,
    )
    rows = _rows()   # 60 good docs + planted junk
    # junk that PASSES the hygiene gates but is LM-implausible:
    # English stopwords in scrambled order with rare fillers
    rng = random.Random(7)
    noise_words = ["of", "the", "and", "yonder", "whilst", "thee",
                   "forsooth", "anon", "betwixt", "hither"]
    junk = [(300 + j, " ".join(rng.choice(noise_words)
                               for _ in range(100))) for j in range(6)]
    docs = spark.createDataFrame(rows + junk, "doc_id long, text string")
    lm = fit_ngram_lm(
        spark.createDataFrame(rows[:60], "doc_id long, text string"),
        vocab_size=500)
    cfg = CurationConfig(lid="native",
                         ppl_keep_buckets=("head", "middle"))
    base = {r["doc_id"] for r in curate(docs, config=cfg).collect()}
    assert {300 + j for j in range(6)} <= base      # hygiene keeps junk
    out = curate(docs, config=cfg, ppl_lm=lm).collect()
    ids = {r["doc_id"] for r in out}
    dropped_junk = {300 + j for j in range(6)} - ids
    assert len(dropped_junk) >= 5, dropped_junk     # tail bucket = junk
    assert sum(1 for i in ids if i < 60) >= 35      # good docs survive
    assert all(r["ppl_bucket"] in ("head", "middle") for r in out)
    assert all(r["perplexity"] is not None for r in out)


def test_curate_kitchen_sink_plan_census(spark):
    """Every per-row optional stage ON (url filter + gopher + line
    dedup + decontam): the composition must add only the wide ops its
    stages own — line dedup's 3 keyed exchanges (occurrence agg,
    first-occurrence agg, drop-list join) on top of the base DAG's 3,
    plus broadcast joins for the url lists and benchmark grams — and
    NOTHING quadratic, sort-merge, or Python.  Pins the 100 TB shape
    of the full pipeline a web-corpus user actually runs."""
    import re

    from tests.conftest import SF_DIR_ORACLE
    from trial_data_ingestion_spark.operators.gopher_rules import (
        GopherThresholds,
    )
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate,
    )
    docs = (spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
            .withColumn("url", F.concat(
                F.lit("https://s"), (F.col("doc_id") % 7).cast("string"),
                F.lit("-ex.com/p"), F.col("doc_id").cast("string"))))
    bench = docs.where(F.col("doc_id") % 97 == 3).select("doc_id", "text")
    cfg = CurationConfig(
        lid="native", url_col="url", line_dedup_min_chars=12,
        gopher=GopherThresholds(min_words=10, min_stopword_hits=1))
    out = curate(docs, benchmark=bench, config=cfg,
                 url_blocklist=["s3-ex.com"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    census = {op: len(re.findall(op, plan)) for op in (
        "Exchange hashpartitioning", "BroadcastExchange",
        "SortMergeJoin", "CartesianProduct", "BatchEvalPython")}
    assert census["SortMergeJoin"] == 0, census
    assert census["CartesianProduct"] == 0, census
    assert census["BatchEvalPython"] == 0, census
    assert census["Exchange hashpartitioning"] <= 12, census
    assert census["BroadcastExchange"] <= 6, census
    # and the pipeline still yields data with every stage on
    n = out.count()
    assert n > 0
    # the blocklisted domain is gone
    assert out.where("url like '%s3-ex.com%'").count() == 0


@pytest.mark.slow
def test_curate_scrub_policy(spark):
    """decontam_policy='scrub': the contaminated doc SURVIVES with
    its benchmark-matching run rewritten away (n_scrubbed_tokens
    attached); 'drop' removes it; the audit refuses the scrub policy
    (nothing is rejected, so there is no reason to attribute)."""
    import pytest

    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate, rejection_audit,
    )
    rows = _rows()
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(0, rows[5][1])],
                                  "doc_id long, text string")
    dropped = {r["doc_id"] for r in
               curate(docs, benchmark=bench,
                      config=CurationConfig(lid="native")).collect()}
    assert 5 not in dropped
    scrub_cfg = CurationConfig(lid="native", decontam_policy="scrub")
    out = {r["doc_id"]: r for r in
           curate(docs, benchmark=bench, config=scrub_cfg).collect()}
    assert 5 in out                     # kept, not dropped
    assert out[5]["n_scrubbed_tokens"] > 0
    assert out[5]["text"] != rows[5][1]     # the quoted run is gone
    # a clean doc is untouched and reports zero scrubbed tokens
    assert out[7]["n_scrubbed_tokens"] == 0
    assert dropped | {5} == set(out)        # only doc 5 differs
    with pytest.raises(ValueError, match="drop"):
        rejection_audit(docs, benchmark=bench, config=scrub_cfg)
    with pytest.raises(ValueError, match="drop|scrub"):
        curate(docs, benchmark=bench,
               config=CurationConfig(lid="native",
                                     decontam_policy="weird"))
    # incremental delta under scrub == the full run's rows for those
    # ids (scrubbing is per-doc, no corpus-wide state to diverge on)
    from trial_data_ingestion_spark.pipelines.curation import (
        curate_incremental,
    )
    first = [(i, t) for i, t in rows if i < 30]
    delta = [(i, t) for i, t in rows if i >= 30]
    existing = curate(spark.createDataFrame(first,
                                            "doc_id long, text string"),
                      benchmark=bench, config=scrub_cfg)
    inc = curate_incremental(
        spark.createDataFrame(delta, "doc_id long, text string"),
        existing, benchmark=bench, config=scrub_cfg)
    inc_rows = sorted((r["doc_id"], r["text"], r["split"])
                      for r in inc.collect())
    full_delta = sorted((r["doc_id"], r["text"], r["split"])
                        for r in out.values() if r["doc_id"] >= 30)
    assert inc_rows == full_delta and inc_rows


def test_curate_observation_metrics(spark):
    """metrics={} fills named Observations whose values ride the
    FIRST action — free counters (CollectMetrics on the existing
    plan, zero extra jobs), consistent with the planted junk: input
    conserves, gates drop the junk, dedup drops the twin, output
    matches the materialized count.  Works with the line-dedup
    config too (its self-joins re-reference the upstream subtree —
    the observe points must not double-fire or error)."""
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate,
    )
    rows = _rows()   # 60 good + 100/101/103 junk + 102 exact dup
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(0, rows[5][1])],
                                  "doc_id long, text string")
    m: dict = {}
    out = curate(docs, benchmark=bench,
                 config=CurationConfig(lid="native"), metrics=m)
    n_out = out.count()
    vals = {k: v.get["rows"] for k, v in m.items()}
    assert vals["input"] == len(rows)
    assert vals["post_gates"] == len(rows) - 3      # 100/101/103 gated
    assert vals["post_dedup"] == vals["post_gates"] - 1   # 102 deduped
    assert vals["output"] == n_out == vals["post_dedup"] - 1  # doc 5
    # line-dedup config: subtree re-referenced by its self-joins
    m2: dict = {}
    out2 = curate(docs, benchmark=bench,
                  config=CurationConfig(lid="native",
                                        line_dedup_min_chars=12),
                  metrics=m2)
    n2 = out2.count()
    v2 = {k: v.get["rows"] for k, v in m2.items()}
    assert v2["input"] == len(rows)
    assert v2["post_gates"] == len(rows) - 3
    assert v2["output"] == n2
    # no metrics dict -> identical plan to before (no CollectMetrics)
    plain = curate(docs, benchmark=bench,
                   config=CurationConfig(lid="native"))
    assert "CollectMetrics" not in \
        plain._jdf.queryExecution().executedPlan().toString()


def test_rejection_audit_kitchen_sink_plan_census(spark):
    """The b22 bench plan (curation_funnel over the kitchen-sink
    config), pinned at the wide-op level like curate()'s: the audit
    adds id-set joins for the corpus-dependent stages but every one
    of them must broadcast — no sort-merge join, no cartesian, no
    nested-loop, no Python anywhere in the audit's 100 TB shape."""
    import re

    from tests.conftest import SF_DIR_ORACLE
    from trial_data_ingestion_spark.operators.gopher_rules import (
        GopherThresholds,
    )
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curation_funnel,
    )
    docs = (spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
            .withColumn("url", F.concat(
                F.lit("https://s"), (F.col("doc_id") % 7).cast("string"),
                F.lit("-ex.com/p"), F.col("doc_id").cast("string"))))
    bench = docs.where(F.col("doc_id") % 97 == 3).select("doc_id", "text")
    cfg = CurationConfig(
        lid="native", url_col="url", line_dedup_min_chars=12,
        gopher=GopherThresholds(min_words=10, min_stopword_hits=1))
    out = curation_funnel(docs, benchmark=bench, config=cfg,
                          url_blocklist=["s3-ex.com"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    census = {op: len(re.findall(op, plan)) for op in (
        "Exchange hashpartitioning", "BroadcastExchange",
        "SortMergeJoin", "CartesianProduct", "BatchEvalPython",
        "BroadcastNestedLoopJoin")}
    assert census["SortMergeJoin"] == 0, census
    assert census["CartesianProduct"] == 0, census
    assert census["BroadcastNestedLoopJoin"] == 0, census
    assert census["BatchEvalPython"] == 0, census
    # line-dedup rewrite (3) + fingerprint window + funnel rollup +
    # decontam gram aggregates; a regression to a corpus-side
    # re-shuffle per stage would blow past this
    assert census["Exchange hashpartitioning"] <= 9, census
    assert census["BroadcastExchange"] <= 4, census


def test_rejection_audit_matches_curate_and_first_wins(spark):
    """The audit's survivor set (reason NULL) is identical to
    curate()'s output ids, every input doc gets exactly one row, and
    each planted junk doc carries the expected first-wins reason."""
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate, rejection_audit,
    )
    rows = _rows()
    # fails lang AND min_tokens -> first-wins says lang
    rows.append((104, "zz qq"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(0, rows[5][1])],
                                  "doc_id long, text string")
    cfg = CurationConfig(lid="native")
    audit = rejection_audit(docs, benchmark=bench, config=cfg)
    got = {r["doc_id"]: r["reason"] for r in audit.collect()}
    assert len(got) == len(rows)
    survivors = {i for i, r in got.items() if r is None}
    curated = {r["doc_id"] for r in
               curate(docs, benchmark=bench, config=cfg).collect()}
    assert survivors == curated
    assert got[100] == "min_tokens"
    assert got[101] == "repetition"
    assert got[102] == "exact_dup"
    assert got[103] == "lang"
    assert got[104] == "lang"          # first-wins over min_tokens
    assert got[5] == "decontam"


def test_rejection_audit_kitchen_sink_parity(spark):
    """Parity with every per-row optional stage ON (url filter +
    gopher + line dedup + decontam) on the real oracle corpus: the
    corpus-dependent stages (keep-first dedup, rewrite-aware
    decontam) must see the same populations the real run sees."""
    from tests.conftest import SF_DIR_ORACLE
    from trial_data_ingestion_spark.operators.gopher_rules import (
        GopherThresholds,
    )
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate, rejection_audit,
    )
    docs = (spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
            .withColumn("url", F.concat(
                F.lit("https://s"), (F.col("doc_id") % 7).cast("string"),
                F.lit("-ex.com/p"), F.col("doc_id").cast("string"))))
    bench = docs.where(F.col("doc_id") % 97 == 3).select("doc_id", "text")
    cfg = CurationConfig(
        lid="native", url_col="url", line_dedup_min_chars=12,
        gopher=GopherThresholds(min_words=10, min_stopword_hits=1))
    kw = dict(benchmark=bench, config=cfg, url_blocklist=["s3-ex.com"])
    audit = rejection_audit(docs, **kw)
    survivors = {r["doc_id"] for r in
                 audit.where("reason is null").collect()}
    curated = {r["doc_id"] for r in
               curate(docs, **kw).select("doc_id").collect()}
    assert survivors == curated
    reasons = {r["reason"] for r in
               audit.where("reason is not null").collect()}
    assert "url:blocked_domain" in reasons


def test_rejection_audit_model_stages_parity(spark):
    """Parity with the corpus-statistic stages ON: perplexity-bucket
    cuts and the DSIR keep-quantile are computed over the same
    reaching population as in curate(), so survivors still match."""
    from trial_data_ingestion_spark.operators.ngram_lm import fit_ngram_lm
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate, rejection_audit,
    )
    rows = _rows()
    rng = random.Random(7)
    noise_words = ["of", "the", "and", "yonder", "whilst", "thee",
                   "forsooth", "anon", "betwixt", "hither"]
    junk = [(300 + j, " ".join(rng.choice(noise_words)
                               for _ in range(100))) for j in range(6)]
    docs = spark.createDataFrame(rows + junk, "doc_id long, text string")
    lm = fit_ngram_lm(
        spark.createDataFrame(rows[:60], "doc_id long, text string"),
        vocab_size=500)
    target = docs.where("doc_id % 5 = 1").select("text")
    cfg = CurationConfig(lid="native", dsir_keep_frac=0.6)
    kw = dict(config=cfg, ppl_lm=lm, dsir_target=target)
    audit = rejection_audit(docs, **kw)
    survivors = {r["doc_id"] for r in
                 audit.where("reason is null").collect()}
    curated = {r["doc_id"] for r in
               curate(docs, **kw).select("doc_id").collect()}
    assert survivors == curated
    reasons = {r["reason"] for r in audit.collect()}
    assert "perplexity" in reasons and "dsir" in reasons


@pytest.mark.slow
def test_rejection_audit_unscored_docs_are_not_survivors(spark):
    """ADVICE round 5: a doc whose text normalizes to ZERO scoreable
    tokens (all punctuation/symbols) is silently dropped by curate()'s
    inner joins at the perplexity and DSIR stages — the audit must
    flag it at that stage, not report it as a survivor.  Gates are
    opened wide so the punctuation doc genuinely reaches the model
    stages."""
    from trial_data_ingestion_spark.operators.ngram_lm import fit_ngram_lm
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate, rejection_audit,
    )
    rows = [(i, t) for i, t in _rows() if i < 60]
    punct = (200, "!!! ??? ... ;;; ::: --- %%% &&& @@@ ###")
    docs = spark.createDataFrame(rows + [punct],
                                 "doc_id long, text string")
    lm = fit_ngram_lm(spark.createDataFrame(
        rows, "doc_id long, text string"), vocab_size=500)
    cfg = CurationConfig(
        lid="native", languages=("en", "und"), min_quality=0.0,
        max_repeated_line_ratio=1.0, min_tokens=1,
        ppl_keep_buckets=("head", "middle", "tail"))
    kw = dict(config=cfg, ppl_lm=lm)
    audit = {r["doc_id"]: r["reason"] for r in
             rejection_audit(docs, **kw).collect()}
    curated = {r["doc_id"] for r in
               curate(docs, **kw).select("doc_id").collect()}
    # keeping EVERY bucket means the only possible ppl rejection is
    # "couldn't be scored at all" — exactly the inner-join drop
    assert 200 not in curated
    assert audit[200] == "perplexity"
    assert {i for i, r in audit.items() if r is None} == curated

    # same convention at the DSIR stage
    cfg2 = CurationConfig(
        lid="native", languages=("en", "und"), min_quality=0.0,
        max_repeated_line_ratio=1.0, min_tokens=1,
        dsir_keep_frac=1.0)
    target = docs.where("doc_id % 5 = 1").select("text")
    kw2 = dict(config=cfg2, dsir_target=target)
    audit2 = {r["doc_id"]: r["reason"] for r in
              rejection_audit(docs, **kw2).collect()}
    curated2 = {r["doc_id"] for r in
                curate(docs, **kw2).select("doc_id").collect()}
    assert 200 not in curated2
    assert audit2[200] == "dsir"
    assert {i for i, r in audit2.items() if r is None} == curated2


def test_curation_funnel_shape(spark):
    """The funnel conserves the input count, lands in DAG order, and
    fractions sum to 1."""
    from trial_data_ingestion_spark.pipelines.curation import (
        _AUDIT_STAGES, CurationConfig, curation_funnel,
    )
    rows = _rows()
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = spark.createDataFrame([(0, rows[5][1])],
                                  "doc_id long, text string")
    out = curation_funnel(docs, benchmark=bench,
                          config=CurationConfig(lid="native")).collect()
    assert sum(r["n_docs"] for r in out) == len(rows)
    assert abs(sum(r["frac_of_input"] for r in out) - 1.0) < 1e-4
    stages = [r["stage"] for r in out]
    assert stages[-1] == "survived"
    order = {s: i for i, s in enumerate(_AUDIT_STAGES)}
    idx = [order[s.split(":")[0]] for s in stages[:-1]]
    assert idx == sorted(idx)


def test_rejection_audit_null_and_empty_text(spark):
    """NULL/empty text rows: curate() drops them at the hygiene
    where() (NULL predicates filter), and the audit must give them a
    REASON, not let NULL flags slip the when-chain and report a
    phantom survivor — even when 'und' is an allowed language so the
    lang gate can't catch them first."""
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig, curate, rejection_audit,
    )
    rows = _rows()[:10] + [(200, None), (201, ""), (202, "   ")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cfg = CurationConfig(lid="native",
                         languages=("en", "und"))
    audit = rejection_audit(docs, config=cfg)
    got = {r["doc_id"]: r["reason"] for r in audit.collect()}
    assert got[200] == "min_tokens"
    assert got[201] == "min_tokens"
    assert got[202] == "min_tokens"
    survivors = {i for i, r in got.items() if r is None}
    curated = {r["doc_id"] for r in
               curate(docs, config=cfg).collect()}
    assert survivors == curated
