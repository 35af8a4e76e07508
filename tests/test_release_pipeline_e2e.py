"""Release-pipeline capstone: every round-5 stage composed end-to-end
— curate (hygiene + Gopher + exact/line dedup) -> fuzzy decontam ->
content-stable split -> leakage audit -> token-budget shards ->
corpus card — with cross-stage invariants asserted at each seam."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE


def test_release_pipeline(spark, tmp_path):
    from trial_data_ingestion_spark.operators.decontam import (
        decontaminate_fuzzy,
        split_leakage_report,
    )
    from trial_data_ingestion_spark.operators.gopher_rules import (
        GopherThresholds,
    )
    from trial_data_ingestion_spark.operators.prefix import (
        shard_by_token_budget,
    )
    from trial_data_ingestion_spark.pipelines.curation import (
        CurationConfig,
        curate,
    )
    from trial_data_ingestion_spark.pipelines.report import corpus_card

    docs = spark.read.parquet(f"{SF_DIR_ORACLE}/documents.parquet")
    n_raw = docs.count()

    # 1. curation: hygiene + Gopher (stopword rule relaxed for the
    #    synthetic keyword corpus) + exact dedup + line dedup
    cfg = CurationConfig(
        gopher=GopherThresholds(min_stopword_hits=1),
        line_dedup_min_chars=10)
    curated = curate(docs, config=cfg).localCheckpoint()
    n_curated = curated.count()
    assert 0 < n_curated <= n_raw
    assert {"split", "lang", "quality"} <= set(curated.columns)

    # 2. fuzzy decontamination against a mini benchmark drawn from
    #    the corpus itself: the planted items MUST all be removed
    bench = docs.where("doc_id % 100 = 7").select("text")
    n_bench_in = curated.join(
        docs.where("doc_id % 100 = 7").select("doc_id"),
        "doc_id", "left_semi").count()
    assert n_bench_in > 0
    clean = decontaminate_fuzzy(curated, bench,
                                threshold=0.8).localCheckpoint()
    assert clean.join(docs.where("doc_id % 100 = 7")
                      .select("doc_id"), "doc_id", "left_semi") \
        .count() == 0
    assert clean.count() >= n_curated - n_bench_in - 5  # fuzzy extras

    # 2.5 data selection: DSIR-rank the clean corpus against a
    #     trusted target slice; the top half must (a) stay inside the
    #     clean corpus and (b) score strictly better than the bottom
    #     half on mean normalized importance
    from trial_data_ingestion_spark.operators.dsir import (
        dsir_select, fit_dsir, score_importance,
    )
    target = docs.where("doc_id % 17 = 3").select("text")
    model = fit_dsir(target, clean.select("text"), n_buckets=2048)
    n_clean = clean.count()
    selected = dsir_select(clean, model, k=n_clean // 2,
                           id_col="doc_id", gumbel=False)
    assert selected.count() == n_clean // 2
    sel_ids = {r.doc_id for r in selected.select("doc_id").collect()}
    clean_ids = {r.doc_id for r in clean.select("doc_id").collect()}
    assert sel_ids <= clean_ids
    norm = {r.doc_id: r.log_weight / r.n_grams
            for r in score_importance(clean, model).collect()}
    inside = [norm[i] for i in sel_ids if i in norm]
    outside = [v for i, v in norm.items() if i not in sel_ids]
    assert sum(inside) / len(inside) > sum(outside) / len(outside)

    # 3. the split came content-stable from curate(); audit leakage
    #    BETWEEN the final splits (exact-dup removal already ran, so
    #    only residual shared grams can leak)
    leak = {r["split"]: r["leak_rate"]
            for r in split_leakage_report(clean).collect()}
    assert set(leak) <= {"val", "test"}
    assert all(v <= 0.2 for v in leak.values()), leak

    # 4. token-budget shards over the train split: balanced by token
    #    mass, all rows kept
    train = clean.where("split = 'train'").withColumn(
        "n_tokens", F.size(F.split("text", r"\s+")))
    shards = shard_by_token_budget(train, "doc_id", "n_tokens", 4000)
    assert shards.count() == train.count()
    sums = [r["s"] for r in shards.groupBy("shard")
            .agg(F.sum("n_tokens").alias("s")).collect()]
    max_doc = train.agg(F.max("n_tokens")).collect()[0][0]
    assert all(s <= 4000 + max_doc for s in sums)

    # 5. the shipped card reflects the CLEAN corpus
    card = corpus_card(clean)
    assert card["overall"]["n_docs"] == clean.count()
    assert sum(m["n_docs"] for m in card["by_lang"].values()) \
        == clean.count()
    assert card["overall"]["exact_dup_rate"] <= 0.02

    # 6. the release ships with an integrity manifest: a later
    #    consumer proves the exported shards match what the pipeline
    #    released, from the files alone
    from trial_data_ingestion_spark.sinks.manifest import (
        read_manifest, verify_manifest, write_manifest,
    )
    out = str(tmp_path / "release_shards")
    shards.write.partitionBy("shard").mode("overwrite").parquet(out)
    mpath = str(tmp_path / "release_manifest.json")
    exported = spark.read.parquet(out)
    write_manifest(exported, ["shard"], mpath)
    assert verify_manifest(
        spark.read.parquet(out), ["shard"],
        read_manifest(spark, mpath, ["shard"])).count() == 0


def test_q64_release_summary_exact_golden(spark):
    """Exact 3-row pin for the one driver-graded composition with no
    SQL oracle (r6 verdict item 2): q64's per-split release summary
    is deterministic (content-stable split, deterministic extraction
    and curation), so a silent value regression anywhere in the
    composition now trips THIS golden instead of only surfacing via
    the separately-graded constituent stages.  Regenerate with
    plans.QUERIES['q64_release_pipeline'] at sf0.01 after any
    INTENDED semantic change, and say why in the commit."""
    from trial_data_ingestion_spark.plans import QUERIES
    rows = sorted(tuple(r) for r in
                  QUERIES["q64_release_pipeline"](
                      spark, SF_DIR_ORACLE).collect())
    assert rows == [
        ("test", 18, 5836, 18, 3),
        ("train", 453, 134069, 453, 3),
        ("val", 23, 7288, 23, 3),
    ]
