"""Reader tests S1-S4 + bib parse (FIXTURES.md §1-2, §5)."""

from __future__ import annotations

import json

import pytest

from tests import fixtures as FX


@pytest.fixture()
def tmp(tmp_path):
    return tmp_path


def test_bib_reader(spark, tmp):
    p = tmp / "sample.bib"
    p.write_text(FX.SAMPLE_BIB)
    from trial_data_ingestion_spark.sources.bibtex import read_bib
    rows = read_bib(spark, str(p)).collect()
    by_doi = {r["doi_norm"]: r for r in rows}
    # entry without a DOI dropped; duplicate (URL-mined, case-folded)
    # deduped keep-first
    assert len(rows) == 2
    assert "10.1000/jot.2020.001" in by_doi
    # brace strip + whitespace collapse on titles (doi_utils.py:19-23)
    assert by_doi["10.1000/jot.2020.001"]["title"] == "A Great Study of Things"
    assert by_doi["10.1000/jot.2020.001"]["journal"] == "Journal of Testing"
    # keep-FIRST: smith2020's journal wins over dup2020's booktitle
    assert by_doi["10.1000/jot.2020.001"]["doi"] == "10.1000/jot.2020.001"
    # doi mined from url, normalized to lowercase
    assert "10.1000/sj.2021.xyz" in by_doi
    assert by_doi["10.1000/sj.2021.xyz"]["journal"] == "Second Journal"


def test_csv_reader(spark, tmp):
    p = tmp / "input.csv"
    p.write_text(
        "doi,title\n"
        "https://doi.org/10.1/A,First\n"
        "10.1/a,DupOfFirst\n"
        ",NoDoi\n"
        "10.2/b,Second\n")
    from trial_data_ingestion_spark.sources.readers import read_csv_input
    rows = read_csv_input(spark, str(p)).collect()
    by_norm = {r["doi_norm"]: r for r in rows}
    assert set(by_norm) == {"10.1/a", "10.2/b"}
    # journal injected as null when absent (P7)
    assert rows[0]["journal"] is None
    # keep-first: the URL-prefixed original survives
    assert by_norm["10.1/a"]["title"] == "First"


def test_json_array_and_jsonl(spark, tmp):
    recs = [{"id": None, "pmcid": "PMC1", "title": "T1",
             "text": "body text one"},
            {"pmid": "999", "title": "T2", "full_text": "body two"}]
    pa = tmp / "arr.json"
    pa.write_text(json.dumps(recs))
    pl = tmp / "lines.jsonl"
    pl.write_text("\n".join(json.dumps(r) for r in recs) + "\n\n")
    from trial_data_ingestion_spark.sources.readers import (
        normalize_articles, read_json_array, read_jsonl,
    )
    for reader, path in ((read_json_array, pa), (read_jsonl, pl)):
        df = normalize_articles(reader(spark, str(path)))
        rows = sorted(df.collect(), key=lambda r: r["title"])
        # P8 coalesce: id|pmcid|pmid, full_text|text|body
        assert rows[0]["id"] == "PMC1"
        assert rows[0]["full_text"] == "body text one"
        assert rows[1]["id"] == "999"
        assert rows[1]["full_text"] == "body two"


def test_json_single_dict_promoted(spark, tmp):
    p = tmp / "single.json"
    p.write_text(json.dumps({"title": "Solo", "doi": "10.9/solo"}))
    from trial_data_ingestion_spark.sources.readers import read_json_array
    rows = read_json_array(spark, str(p)).collect()
    assert len(rows) == 1 and rows[0]["title"] == "Solo"


def test_read_input_dispatch(spark, tmp):
    p = tmp / "x.csv"
    p.write_text("doi\n10.5/ok\n")
    from trial_data_ingestion_spark.sources.readers import read_input
    assert read_input(spark, str(p)).count() == 1
    with pytest.raises(ValueError):
        read_input(spark, "nope.xyz")


def test_bib_cross_file_keep_first_deterministic(spark, tmp):
    # duplicate DOI across two files: the lexicographically-first
    # file's entry must win, regardless of partitioning (the per-file
    # ordinal alone collides across files)
    (tmp / "a_first.bib").write_text(
        "@article{a1, doi={10.9/dup}, journal={From A}, title={T}}\n")
    (tmp / "b_second.bib").write_text(
        "@article{b1, doi={10.9/dup}, journal={From B}, title={T}}\n")
    from trial_data_ingestion_spark.sources.bibtex import read_bib
    for _ in range(3):
        rows = read_bib(spark, str(tmp)).collect()
        assert len(rows) == 1
        assert rows[0]["journal"] == "From A"


def test_orc_round_trip(spark, tmp, sf_dir):
    from trial_data_ingestion_spark.sources.readers import read_orc
    from trial_data_ingestion_spark.sinks import write_orc
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp / "docs_orc")
    write_orc(docs, path, partition_by=["lang"])
    back = read_orc(spark, path)
    assert back.count() == docs.count()
    assert set(back.columns) == set(docs.columns)
    a = sorted(tuple(r) for r in docs.select("doc_id", "n_chars").collect())
    b = sorted(tuple(r) for r in back.select("doc_id", "n_chars").collect())
    assert a == b


def test_orc_partition_pruning(spark, tmp, sf_dir):
    # a lang filter over the partitioned layout must prune to that
    # partition directory, not scan-and-filter
    from trial_data_ingestion_spark.sources.readers import read_orc
    from trial_data_ingestion_spark.sinks import write_orc
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp / "docs_orc2")
    write_orc(docs, path, partition_by=["lang"])
    q = read_orc(spark, path).where("lang = 'en'")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan
    assert q.count() == docs.where("lang = 'en'").count()


def test_avro_gated_with_clear_error(spark, tmp, sf_dir):
    from trial_data_ingestion_spark.sources.readers import (
        _avro_available, read_avro,
    )
    from trial_data_ingestion_spark.sinks import write_avro
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp / "docs_avro")
    if _avro_available(spark):
        write_avro(docs, path)
        assert read_avro(spark, path).count() == docs.count()
    else:
        with pytest.raises(NotImplementedError, match="spark-avro"):
            write_avro(docs, path)
        with pytest.raises(NotImplementedError, match="spark-avro"):
            read_avro(spark, path)
