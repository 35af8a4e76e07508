"""End-to-end pipeline tests: fulltext enrichment (§3.1), chunk+embed+
upsert (§3.2), upsert idempotency (SURVEY.md §5 items 4-5)."""

from __future__ import annotations

import pytest

from tests import fixtures as FX


def _fetcher_factory():
    from trial_data_ingestion_spark.sources.http_connector import (
        FixtureFetcher,
    )
    return FixtureFetcher(
        doi_to_pmcid={
            "10.1000/long": "PMC9999999",
            "10.1000/short": "PMC7777777",   # abstract-only -> gate
        },
        pmcid_to_xml={
            "PMC9999999": FX.long_jats(),
            "PMC7777777": FX.JATS_ABSTRACT_ONLY,
        },
    )


def _input(spark):
    return spark.createDataFrame(
        [("https://doi.org/10.1000/LONG", "Journal A"),
         ("10.1000/long", "Dup Journal"),        # dup after normalize
         ("10.1000/short", None),                 # abstract-only
         ("10.1000/missing", "Journal B"),        # idconv miss
         (None, "Journal C")],                    # null doi dropped
        "doi string, journal string")


@pytest.mark.slow
def test_fulltext_pipeline(spark):
    from trial_data_ingestion_spark.pipelines.fulltext import (
        run_fulltext, summarize,
    )
    result = run_fulltext(_input(spark), _fetcher_factory)
    records = result["records"].collect()
    failures = {r["doi"]: r["reason"] for r in result["failures"].collect()}

    assert len(records) == 1
    rec = records[0]
    assert rec["pmcid"] == "PMC9999999"
    assert rec["source"] == "pmc"
    assert rec["title"] == "Long Article"
    assert rec["journal"] == "Journal A"          # keep-first dedup
    assert len(rec["sections"]) == 1

    assert failures["10.1000/short"] == "abstract_only"
    assert failures["10.1000/missing"] == "idconv: no PMCID"

    s = summarize(result)
    assert s == {"input_unique_doi": 3, "appended": 1,
                 "skipped_existing": 0, "failures": 2}


@pytest.mark.slow
def test_batch_workers_bounds_connector_partitions(spark):
    """--batch-workers twin (reference cli.py:17): num_partitions
    repartitions the connector worklist, so the mapInPandas output —
    and therefore the number of concurrent fetcher loops — has
    exactly that many partitions; results are unchanged."""
    from trial_data_ingestion_spark.pipelines.fulltext import (
        run_fulltext,
    )
    from trial_data_ingestion_spark.sources.http_connector import (
        map_idconv,
    )
    worklist = spark.createDataFrame(
        [(f"10.1000/long{i}",) for i in range(8)],
        "doi_norm string").repartition(8)
    idmap = map_idconv(worklist, _fetcher_factory, num_partitions=3)
    assert idmap.rdd.getNumPartitions() == 3
    # default keeps the incoming partitioning
    assert (map_idconv(worklist, _fetcher_factory)
            .rdd.getNumPartitions() == 8)
    # plumbed end-to-end: same results as the unbounded run
    bounded = run_fulltext(_input(spark), _fetcher_factory,
                           batch_workers=2)
    assert bounded["records"].count() == 1
    assert (sorted(r["reason"] for r in
                   bounded["failures"].select("reason").collect())
            == ["abstract_only", "idconv: no PMCID"])


def test_fulltext_resume_antijoin(spark):
    from trial_data_ingestion_spark.pipelines.fulltext import (
        run_fulltext, summarize,
    )
    existing = spark.createDataFrame([("10.1000/long",)],
                                     "doi_norm string")
    result = run_fulltext(_input(spark), _fetcher_factory,
                          existing_df=existing)
    s = summarize(result)
    # the already-ingested doi is skipped before any fetch (F8)
    assert s["skipped_existing"] == 1
    assert s["appended"] == 0


@pytest.mark.slow
def test_ingest_embed_upsert_idempotent(spark, tmp_path):
    from trial_data_ingestion_spark.pipelines.fulltext import run_fulltext
    from trial_data_ingestion_spark.pipelines.ingest_embed import (
        RunConfig, run_ingest_and_embed,
    )
    store = str(tmp_path / "vectors")
    records = run_fulltext(_input(spark), _fetcher_factory)["records"]
    cfg = RunConfig(chunker="by_section", chunk_size=300, chunk_overlap=30)

    out1 = run_ingest_and_embed(spark, records, store, cfg)
    rows1 = sorted([(r["chunk_id"], tuple(r["embedding"]))
                    for r in out1.collect()])
    assert rows1, "pipeline produced no chunks"
    # metadata P15 attached
    sample = out1.limit(1).collect()[0]
    assert sample["chunker"] == "by_section"
    assert sample["embed_backend"] == "hash"
    assert sample["embedding_dim"] == 64

    # run twice -> identical store (deterministic-id upsert contract)
    out2 = run_ingest_and_embed(spark, records, store, cfg)
    rows2 = sorted([(r["chunk_id"], tuple(r["embedding"]))
                    for r in out2.collect()])
    assert rows1 == rows2


def test_upsert_replaces_by_key(spark, tmp_path):
    from trial_data_ingestion_spark.sinks import (
        read_upsert_table, upsert_parquet,
    )
    path = str(tmp_path / "store")
    v1 = spark.createDataFrame([("a", 1), ("b", 1)], "id string, v int")
    v2 = spark.createDataFrame([("b", 2), ("c", 2)], "id string, v int")
    upsert_parquet(spark, v1, path, key="id", n_buckets=4)
    upsert_parquet(spark, v2, path, key="id", n_buckets=4)
    rows = {r["id"]: r["v"] for r in read_upsert_table(spark, path).collect()}
    assert rows == {"a": 1, "b": 2, "c": 2}


def test_single_fallback_ladder(spark):
    # S8/S9: a doc that misses batch idconv resolves via EuropePMC
    # search, and one missing from the batch EFetch response is
    # recovered through the OAI-PMH / EuropePMC fullTextXML ladder
    from trial_data_ingestion_spark.pipelines.fulltext import run_fulltext
    from trial_data_ingestion_spark.sources.http_connector import (
        FixtureFetcher,
    )

    def factory():
        return FixtureFetcher(
            doi_to_pmcid={"10.1000/long": "PMC9999999"},
            pmcid_to_xml={},                       # batch EFetch misses all
            oai_xml={"PMC9999999": FX.long_jats()},
            epmc_xml={"PMC5555555": FX.long_jats()},
            epmc_doi_to_pmcid={"10.1000/epmconly": "PMC5555555"},
        )

    df = spark.createDataFrame(
        [("10.1000/long", "J1"),       # batch idconv ok, EFetch via OAI
         ("10.1000/epmconly", "J2"),   # idconv miss -> EPMC search + XML
         ("10.1000/gone", "J3")],      # fails the whole ladder
        "doi string, journal string")

    # without the fallback both fetchable docs fail
    off = run_fulltext(df, factory)
    assert off["records"].count() == 0

    on = run_fulltext(df, factory, single_fallback=True)
    recs = {r["doi"]: r for r in on["records"].collect()}
    fails = {r["doi"]: r["reason"] for r in on["failures"].collect()}
    assert set(recs) == {"10.1000/long", "10.1000/epmconly"}
    assert recs["10.1000/epmconly"]["pmcid"] == "PMC5555555"
    assert fails["10.1000/gone"] == "EuropePMC: no PMCID | idconv: no PMCID"


def test_fixture_fetcher_single_ladder_order():
    # the ladder must try EFetch, then OAI, then EuropePMC (pmc.py:169-205)
    from trial_data_ingestion_spark.sources.http_connector import (
        FixtureFetcher,
    )
    f = FixtureFetcher(
        doi_to_pmcid={}, pmcid_to_xml={},
        oai_xml={"PMC1": FX.long_jats()},
        epmc_xml={"PMC1": FX.JATS_ABSTRACT_ONLY},
    )
    rec, err = f.jats_single("PMC1")
    assert err is None and rec["title"] == "Long Article"
    assert (f.efetch_calls, f.oai_calls, f.epmc_calls) == (1, 1, 0)
    rec2, err2 = f.jats_single("PMCNOPE")
    assert rec2 is None and err2 == "PMC/EPMC: no JATS <article> found"


def test_single_ladder_returns_first_found_articles_error():
    # A located <article> whose parse fails (body present but empty,
    # no abstract -> "No sections/text") must surface that parse error
    # instead of falling through to later sources: the reference's
    # try_pmc_jats returns _parse_article(art) — error included — as
    # soon as an <article> is found (pmc.py:156-209).
    from trial_data_ingestion_spark.sources.http_connector import (
        FixtureFetcher,
    )
    bad = ("<article><front><title-group><article-title>T"
           "</article-title></title-group></front><body></body></article>")
    f = FixtureFetcher(
        doi_to_pmcid={}, pmcid_to_xml={"PMC1": bad},
        oai_xml={"PMC1": FX.long_jats()})
    rec, err = f.jats_single("PMC1")
    assert rec is None and err == "No sections/text"
    assert (f.efetch_calls, f.oai_calls) == (1, 0)

    # unparseable payloads and article-free responses still fall through
    f2 = FixtureFetcher(
        doi_to_pmcid={}, pmcid_to_xml={"PMC1": "not xml <"},
        oai_xml={"PMC1": "<no-article/>"},
        epmc_xml={"PMC1": FX.long_jats()})
    rec2, err2 = f2.jats_single("PMC1")
    assert err2 is None and rec2["title"] == "Long Article"
    assert (f2.efetch_calls, f2.oai_calls, f2.epmc_calls) == (1, 1, 1)


def test_fixture_fetcher_batches():
    f = _fetcher_factory()
    out, fails = f.idconv_batch(["10.1000/long", "nope"])
    assert out == {"10.1000/long": "PMC9999999"}
    assert fails == [("nope", "idconv: no PMCID")]
    parsed, fails2 = f.efetch_batch(["PMC9999999", "PMCMISSING"])
    assert "PMC9999999" in parsed
    assert fails2[0][1] == "EFetch: article not found in response"


def test_build_chunks_normalizes_doi_for_doc_id(spark):
    # ids must be input-format-independent: the reference normalizes
    # the DOI before _doc_id_from_record, so a re-ingest of the same
    # article with 'https://doi.org/10.1000/LONG' replaces, not
    # duplicates, the rows keyed '10.1000/long'
    from trial_data_ingestion_spark.pipelines.ingest_embed import (
        RunConfig, build_chunks,
    )
    secs = [{"section_path": "Intro", "text": "hello world " * 30}]
    records = spark.createDataFrame(
        [("https://doi.org/10.1000/LONG", "T", "J", "pmc", "PMC1", secs),
         ("10.1000/long", "T", "J", "pmc", "PMC1", secs)],
        "doi string, title string, journal string, source string, "
        "pmcid string, sections array<struct<section_path:string,"
        "text:string>>")
    cfg = RunConfig(chunker="by_section", chunk_size=100, chunk_overlap=10)
    ids = {r["doc_id"] for r in build_chunks(records, cfg).collect()}
    assert ids == {"10.1000/long"}
