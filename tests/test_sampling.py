"""Deterministic-sampling tests: DuckDB hash parity, partition-layout
invariance, rate accuracy, stratified rates, fixed-n draws, and the
no-shuffle plan shape."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "lang", "n_chars"))


def test_hash_sample_matches_duckdb(spark):
    from trial_data_ingestion_spark.operators.sampling import hash_sample
    got = sorted(r["doc_id"] for r in
                 hash_sample(_docs(spark), "doc_id", 0.2,
                             seed="abc").collect())
    con = duckdb.connect()
    ref = [r[0] for r in con.execute(f"""
        SELECT doc_id FROM '{SF_DIR}/documents.parquet'
        WHERE CAST('0x' || substr(md5('abc|' || CAST(doc_id AS VARCHAR)),
                   1, 15) AS BIGINT) % 1000000 < 200000
        ORDER BY doc_id
    """).fetchall()]
    assert got == ref and len(got) > 0


def test_hash_sample_invariant_to_partitioning(spark):
    from trial_data_ingestion_spark.operators.sampling import hash_sample
    d = _docs(spark)
    a = sorted(r["doc_id"] for r in
               hash_sample(d.repartition(13), "doc_id", 0.37).collect())
    b = sorted(r["doc_id"] for r in
               hash_sample(d.coalesce(1), "doc_id", 0.37).collect())
    assert a == b
    # rate lands near the target on ~1k docs
    total = d.count()
    assert abs(len(a) / total - 0.37) < 0.06


def test_split_by_hash_partitions_every_row_once(spark):
    from trial_data_ingestion_spark.operators.sampling import split_by_hash
    d = _docs(spark)
    out = split_by_hash(d, "doc_id",
                        {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == d.count()
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > 6 * max(counts["val"], counts["test"])
    with pytest.raises(ValueError):
        split_by_hash(d, "doc_id", {"a": 0.5, "b": 0.6})


def test_stratified_sample_rates(spark):
    from trial_data_ingestion_spark.operators.sampling import (
        stratified_sample,
    )
    d = _docs(spark)
    langs = {r["lang"] for r in d.select("lang").distinct().collect()}
    keep_all = sorted(langs)[0]
    out = stratified_sample(
        d, "lang", {keep_all: 1.0}, default_fraction=0.25,
        key_col="doc_id")
    base = {r["lang"]: r["n"] for r in
            d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert got[keep_all] == base[keep_all]          # 100% stratum intact
    for lang in langs - {keep_all}:
        assert got.get(lang, 0) < base[lang]        # downsampled
        assert abs(got.get(lang, 0) / base[lang] - 0.25) < 0.15


def test_stratified_sample_requires_distinct_row_key(spark):
    """key_col is mandatory and must not be the strata column: hashing
    the stratum value gives every row in it the same bucket, turning a
    0.25 rate into an all-or-nothing stratum keep."""
    from trial_data_ingestion_spark.operators.sampling import (
        stratified_sample,
    )
    d = _docs(spark)
    with pytest.raises(TypeError):
        stratified_sample(d, "lang", {"en": 0.5})          # no key_col
    with pytest.raises(ValueError):
        stratified_sample(d, "lang", {"en": 0.5}, key_col="")
    with pytest.raises(ValueError):
        stratified_sample(d, "lang", {"en": 0.5}, key_col="lang")


def test_sampling_operators_agree_on_bucket_edges(spark):
    """The same nominal fraction must admit the same bucket set in
    hash_sample and stratified_sample (0.3 * 1e6 = 299999.999... in
    doubles: truncation vs rounding differ at bucket 299999)."""
    from trial_data_ingestion_spark.operators.sampling import (
        hash_sample,
        stratified_sample,
    )
    d = _docs(spark)
    via_hash = sorted(r["doc_id"] for r in
                      hash_sample(d, "doc_id", 0.3).collect())
    langs = [r["lang"] for r in d.select("lang").distinct().collect()]
    via_strat = sorted(r["doc_id"] for r in stratified_sample(
        d, "lang", {lg: 0.3 for lg in langs}, key_col="doc_id")
        .collect())
    assert via_hash == via_strat


def test_stratified_fixed_n_counts_and_determinism(spark):
    from trial_data_ingestion_spark.operators.sampling import (
        stratified_fixed_n,
    )
    d = _docs(spark)
    out = stratified_fixed_n(d, "lang", 7, key_col="doc_id")
    counts = {r["lang"]: r["n"] for r in
              out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    base = {r["lang"]: r["n"] for r in
            d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in counts.items():
        assert n == min(7, base[lang])
    again = stratified_fixed_n(d.repartition(5), "lang", 7,
                               key_col="doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == \
           sorted(r["doc_id"] for r in again.collect())


def test_mixture_sample_hits_target_composition(spark):
    """Pretraining-mix construction: 3 sources with unequal targets;
    the scarcest-relative source (highest weight here, all sources
    equal-sized) must be kept at 100% and the others downsampled to
    the target ratio."""
    import pytest as _pytest

    from trial_data_ingestion_spark.operators.sampling import (
        mixture_sample,
    )
    d = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
         .select("doc_id", "source"))
    out = mixture_sample(d, "source",
                         {"src0": 0.5, "src1": 0.3, "src2": 0.2},
                         key_col="doc_id")
    counts = {r["source"]: r["n"] for r in
              out.groupBy("source").agg(F.count("*").alias("n"))
                 .collect()}
    base = {r["source"]: r["n"] for r in
            d.groupBy("source").agg(F.count("*").alias("n")).collect()}
    # equal-sized sources: src0 (highest weight) pins the scale at
    # count/0.5, so it keeps 100%; others keep weight/0.5 of it
    assert counts["src0"] == base["src0"]
    assert set(counts) == {"src0", "src1", "src2"}   # others dropped
    got_ratio1 = counts.get("src1", 0) / counts["src0"]
    got_ratio2 = counts.get("src2", 0) / counts["src0"]
    # small strata -> loose bands; determinism is the hard guarantee
    assert abs(got_ratio1 - 0.6) < 0.35
    assert abs(got_ratio2 - 0.4) < 0.35
    # deterministic under repartitioning
    again = mixture_sample(d.repartition(9), "source",
                           {"src0": 0.5, "src1": 0.3, "src2": 0.2},
                           key_col="doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == \
           sorted(r["doc_id"] for r in again.collect())
    with _pytest.raises(ValueError):
        mixture_sample(d, "source", {"nope": 1.0}, key_col="doc_id")


def test_mixture_sample_max_rows_caps_scale(spark):
    from trial_data_ingestion_spark.operators.sampling import (
        mixture_sample,
    )
    d = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
         .select("doc_id", "source"))
    out = mixture_sample(d, "source", {"src0": 0.5, "src1": 0.5},
                         key_col="doc_id", max_rows=20)
    n = out.count()
    assert n <= 35          # Bernoulli slack above the 20-row target
    assert n >= 8


def test_hash_sample_is_a_pure_pushed_filter(spark):
    """No shuffle, and the filter sits at the scan: the 100 TB shape."""
    from trial_data_ingestion_spark.operators.sampling import hash_sample
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = hash_sample(d, "doc_id", 0.1).select("doc_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Filter" in plan

@pytest.mark.slow
def test_mixture_with_epochs_upsamples_and_downsamples(spark):
    """Scarce source repeats (~2.5 epochs), abundant source
    downsamples, realized composition lands near the target, copies
    are tagged with a unique (key, epoch) pair, and membership is
    deterministic."""
    from trial_data_ingestion_spark.operators.sampling import (
        mixture_with_epochs,
    )
    rows = ([(f"w{i}", "web") for i in range(2000)]
            + [(f"k{i}", "wiki") for i in range(200)])
    df = spark.createDataFrame(rows, "doc_id string, source string")
    out = mixture_with_epochs(df, "source",
                              {"web": 0.5, "wiki": 0.5},
                              key_col="doc_id", total_rows=1000)
    got = out.groupBy("source").count().collect()
    by = {r["source"]: r["count"] for r in got}
    # targets: 500 web (frac 0.25), 500 wiki (2.5 epochs of 200)
    assert abs(by["web"] - 500) < 60, by
    assert abs(by["wiki"] - 500) < 60, by
    # every wiki doc appears at least twice (2 full epochs)
    wiki_counts = (out.where("source = 'wiki'")
                   .groupBy("doc_id").count().collect())
    assert all(r["count"] >= 2 for r in wiki_counts)
    assert max(r["count"] for r in wiki_counts) == 3
    # (key, epoch) unique -> safe shard-export key
    n = out.count()
    assert out.select("doc_id", "epoch").distinct().count() == n
    # deterministic
    again = mixture_with_epochs(df, "source", {"web": 0.5, "wiki": 0.5},
                                key_col="doc_id", total_rows=1000)
    a = sorted((r["doc_id"], r["epoch"]) for r in out.collect())
    b = sorted((r["doc_id"], r["epoch"]) for r in again.collect())
    assert a == b


def test_mixture_with_epochs_guards(spark):
    import pytest

    from trial_data_ingestion_spark.operators.sampling import (
        mixture_with_epochs,
    )
    df = spark.createDataFrame(
        [(f"d{i}", "tiny") for i in range(10)],
        "doc_id string, source string")
    with pytest.raises(ValueError, match="epochs"):
        mixture_with_epochs(df, "source", {"tiny": 1.0},
                            key_col="doc_id", total_rows=1000)
    # raising the cap deliberately makes the same call legal
    out = mixture_with_epochs(df, "source", {"tiny": 1.0},
                              key_col="doc_id", total_rows=100,
                              max_epochs=20)
    assert out.count() == 100       # 10 docs x exactly 10 epochs


def test_mixture_with_epochs_downsample_agrees_with_mixture_sample(spark):
    """When no source needs more than one epoch the construction is a
    plain per-source downsample; spot-check composition against the
    downsample-only operator at the same realized scale."""
    from trial_data_ingestion_spark.operators.sampling import (
        mixture_with_epochs,
    )
    rows = ([(f"a{i}", "s1") for i in range(1000)]
            + [(f"b{i}", "s2") for i in range(1000)])
    df = spark.createDataFrame(rows, "doc_id string, source string")
    out = mixture_with_epochs(df, "source", {"s1": 0.7, "s2": 0.3},
                              key_col="doc_id", total_rows=1000)
    by = {r["source"]: r["count"]
          for r in out.groupBy("source").count().collect()}
    assert abs(by["s1"] - 700) < 70 and abs(by["s2"] - 300) < 55, by
    assert out.where("epoch != 0").count() == 0


def test_mixture_with_epochs_matches_duckdb(spark):
    """Row-for-row (key, epoch) membership reproduced in DuckDB from
    the same md5 arithmetic + the operator's published epoch spec —
    the engine-independence contract every sampler here carries."""
    from trial_data_ingestion_spark.operators.sampling import (
        mixture_with_epochs,
    )
    rows = ([(f"w{i}", "web") for i in range(400)]
            + [(f"k{i}", "wiki") for i in range(60)])
    df = spark.createDataFrame(rows, "doc_id string, source string")
    total_rows, weights = 300, {"web": 0.5, "wiki": 0.5}
    out = mixture_with_epochs(df, "source", weights,
                              key_col="doc_id", total_rows=total_rows,
                              seed="e1")
    got = sorted((r["doc_id"], r["epoch"]) for r in out.collect())
    # derive the spec exactly as the operator does
    counts = {"web": 400, "wiki": 60}
    spec = {}
    for s, w in weights.items():
        e = (w / sum(weights.values())) * total_rows / counts[s]
        spec[s] = (int(e), int(round((e - int(e)) * 1_000_000)))
    con = duckdb.connect()
    con.execute("CREATE TABLE docs (doc_id VARCHAR, source VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    con.execute("CREATE TABLE spec (source VARCHAR, nfull INT, part BIGINT)")
    con.executemany("INSERT INTO spec VALUES (?, ?, ?)",
                    [(s, f, p) for s, (f, p) in spec.items()])
    ref = con.execute("""
        SELECT d.doc_id, e.epoch
        FROM docs d
        JOIN spec s USING (source)
        CROSS JOIN LATERAL (SELECT UNNEST(range(0, s.nfull + 1)) AS epoch) e
        WHERE e.epoch < s.nfull
           OR CAST('0x' || substr(md5('e1|' || d.doc_id || '|e'
                                      || CAST(e.epoch AS VARCHAR)),
                   1, 15) AS BIGINT) % 1000000 < s.part
        ORDER BY d.doc_id, e.epoch
    """).fetchall()
    assert got == [(d, e) for d, e in ref] and len(got) > 0


def test_weighted_fixed_n_proportional_and_deterministic(spark):
    """A-ES draw: heavy-weight rows dominate the sample, the draw is
    exact-n, content-stable across partitioning/seeds behave as an
    independent re-draw, and non-positive/NULL weights are
    ineligible."""
    from trial_data_ingestion_spark.operators.sampling import (
        weighted_fixed_n,
    )
    rows = ([(f"h{i}", 9.0) for i in range(500)]
            + [(f"l{i}", 1.0) for i in range(500)]
            + [(f"z{i}", 0.0) for i in range(50)]
            + [(f"n{i}", None) for i in range(50)])
    df = spark.createDataFrame(rows, "doc_id string, w double")
    out = weighted_fixed_n(df, 200, "w", "doc_id", seed="aes")
    got = [r["doc_id"] for r in out.collect()]
    assert len(got) == 200
    heavy = sum(1 for d in got if d.startswith("h"))
    light = sum(1 for d in got if d.startswith("l"))
    assert not any(d[0] in "zn" for d in got)
    # inclusion odds ~9:1 before saturation; demand a loose 3:1
    assert heavy > 3 * light, (heavy, light)
    # deterministic under repartitioning
    again = weighted_fixed_n(df.repartition(17), 200, "w", "doc_id",
                             seed="aes")
    assert sorted(got) == sorted(r["doc_id"] for r in again.collect())
    # a different seed is an independent draw
    other = weighted_fixed_n(df, 200, "w", "doc_id", seed="aes2")
    assert sorted(got) != sorted(r["doc_id"] for r in other.collect())
    # n beyond the eligible pool returns the whole pool
    assert weighted_fixed_n(df, 5000, "w", "doc_id").count() == 1000
    with pytest.raises(ValueError):
        weighted_fixed_n(df, 0, "w", "doc_id")


def test_weighted_fixed_n_plans_as_top_n(spark):
    """No full sort/shuffle: the plan must be TakeOrderedAndProject
    (per-partition top-n + driver merge), the 100 TB shape."""
    from trial_data_ingestion_spark.operators.sampling import (
        weighted_fixed_n,
    )
    d = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
         .select("doc_id", F.col("n_chars").cast("double").alias("w")))
    plan = (weighted_fixed_n(d, 10, "w", "doc_id")
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_mixture_sample_token_budget(spark):
    """size_col switches composition to token units: sources with
    very different doc lengths still land near the target TOKEN
    shares (row shares would be far off), membership stays by-key
    deterministic, and max_rows caps in token units."""
    from trial_data_ingestion_spark.operators.sampling import (
        mixture_sample,
    )
    # long docs in 'web' (~1000 tok), short in 'wiki' (~100 tok)
    rows = ([(f"w{i}", "web", 1000 + (i % 7)) for i in range(300)]
            + [(f"k{i}", "wiki", 100 + (i % 7)) for i in range(300)])
    df = spark.createDataFrame(rows,
                               "doc_id string, source string, tok int")
    out = mixture_sample(df, "source", {"web": 0.5, "wiki": 0.5},
                         key_col="doc_id", size_col="tok")
    toks = {r["source"]: r["t"] for r in
            out.groupBy("source").agg(F.sum("tok").alias("t"))
               .collect()}
    # wiki (scarce in tokens) pins the scale: kept whole
    assert toks["wiki"] == sum(t for _, s, t in rows if s == "wiki")
    ratio = toks["web"] / (toks["web"] + toks["wiki"])
    assert abs(ratio - 0.5) < 0.12, toks
    # deterministic under repartitioning
    again = mixture_sample(df.repartition(11), "source",
                           {"web": 0.5, "wiki": 0.5},
                           key_col="doc_id", size_col="tok")
    assert sorted(r["doc_id"] for r in out.collect()) == \
           sorted(r["doc_id"] for r in again.collect())
    # token-unit cap: ~30k tokens -> ~15k per source
    capped = mixture_sample(df, "source", {"web": 0.5, "wiki": 0.5},
                            key_col="doc_id", size_col="tok",
                            max_rows=30_000)
    total = capped.agg(F.sum("tok")).collect()[0][0]
    assert 15_000 < total < 45_000, total
    # all-zero-size source with positive weight is a loud error
    zero = spark.createDataFrame(
        [("a1", "a", 0), ("b1", "b", 10)],
        "doc_id string, source string, tok int")
    with pytest.raises(ValueError, match="zero total"):
        mixture_sample(zero, "source", {"a": 0.5, "b": 0.5},
                       key_col="doc_id", size_col="tok")


def test_temperature_mixture_token_units(spark):
    """Temperature flattening over token counts: the head source is
    trimmed toward the flattened share; output is a subset of input
    and deterministic."""
    from trial_data_ingestion_spark.operators.sampling import (
        temperature_mixture,
    )
    rows = ([(f"w{i}", "web", 200) for i in range(900)]
            + [(f"k{i}", "wiki", 200) for i in range(100)])
    df = spark.createDataFrame(rows,
                               "doc_id string, source string, tok int")
    out = temperature_mixture(df, "source", key_col="doc_id",
                              alpha=0.5, size_col="tok")
    toks = {r["source"]: r["t"] for r in
            out.groupBy("source").agg(F.sum("tok").alias("t"))
               .collect()}
    # alpha=0.5: weights prop sqrt(180k):sqrt(20k) = 3:1 -> web share
    # flattens from 0.9 to 0.75; wiki (scarce vs weight) kept whole
    assert toks["wiki"] == 20_000
    share = toks["web"] / (toks["web"] + toks["wiki"])
    assert abs(share - 0.75) < 0.08, toks


def test_leakage_safe_split_families_move_together(spark):
    """Confirmed near-dup families land in ONE split; docs outside
    any pair keep exactly the split plain split_by_hash gives their
    own id (enabling leakage safety never reshuffles clean docs)."""
    from trial_data_ingestion_spark.operators.sampling import (
        leakage_safe_split, split_by_hash,
    )
    docs = spark.createDataFrame([(i,) for i in range(200)],
                                 ["doc_id"])
    # three families incl. a transitive chain, rest unpaired
    pairs = spark.createDataFrame(
        [(1, 3), (2, 3), (10, 11), (50, 199)], ["doc_a", "doc_b"])
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {r["doc_id"]: r["split"] for r in
           leakage_safe_split(docs, pairs, "doc_id", w).collect()}
    assert got[1] == got[2] == got[3]
    assert got[10] == got[11]
    assert got[50] == got[199]
    plain = {r["doc_id"]: r["split"] for r in
             split_by_hash(docs, "doc_id", w).collect()}
    paired = {1, 2, 3, 10, 11, 50, 199}
    for i in set(plain) - paired:
        assert got[i] == plain[i]
    # family hashes on its min-id label: the family's split equals
    # the label doc's plain split
    assert got[1] == plain[1] and got[10] == plain[10]
    assert got[50] == plain[50]
    # deterministic
    again = {r["doc_id"]: r["split"] for r in
             leakage_safe_split(docs, pairs, "doc_id", w).collect()}
    assert again == got
    with pytest.raises(ValueError):
        leakage_safe_split(docs, pairs, "doc_id", {"train": 0.5})


def test_plan_mixture_recipe_table(spark):
    from trial_data_ingestion_spark.operators.sampling import (
        mixture_with_epochs, plan_mixture,
    )
    rows = ([(i, "web") for i in range(80)]
            + [(1000 + i, "wiki") for i in range(20)])
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    # alpha=1: natural proportions, planned = share * total
    p1 = {r["source"]: r for r in
          plan_mixture(df, "source", target_total=50).collect()}
    assert p1["web"]["natural_share"] == pytest.approx(0.8)
    assert p1["web"]["target_share"] == pytest.approx(0.8)
    assert p1["web"]["planned"] == pytest.approx(40.0)
    assert p1["wiki"]["epochs_needed"] == pytest.approx(0.5)
    assert p1["web"]["feasible"] and p1["wiki"]["feasible"]
    # alpha=0.5 flattens toward the tail: sqrt(80):sqrt(20) = 2:1
    p2 = {r["source"]: r for r in
          plan_mixture(df, "source", target_total=150,
                       alpha=0.5).collect()}
    assert p2["web"]["target_share"] == pytest.approx(2 / 3)
    assert p2["wiki"]["target_share"] == pytest.approx(1 / 3)
    # wiki needs 150/3 = 50 from 20 available -> 2.5 epochs
    assert p2["wiki"]["epochs_needed"] == pytest.approx(2.5)
    assert p2["wiki"]["feasible"]
    assert not plan_mixture(df, "source", target_total=150, alpha=0.5,
                            max_epochs=2).where(
                                "source = 'wiki'").collect()[0]["feasible"]
    # the plan EXECUTES: mixture_with_epochs at the planned weights
    # lands near the planned per-source volumes (downsampled sources
    # draw by content-stable hash fraction, so +/-10% at n=80)
    weights = {s: p2[s]["target_share"] for s in p2}
    out = mixture_with_epochs(df, "source", weights, "doc_id",
                              total_rows=150)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert abs(got["web"] - 100) <= 10 and abs(got["wiki"] - 50) <= 5
    with pytest.raises(ValueError):
        plan_mixture(df, "source", 10, alpha=0.0)
