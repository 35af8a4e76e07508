"""CLI parity shim smoke tests (reference cli.py:11-73): the six
commands run end-to-end offline — fulltext against the fixture
fetcher, then chunk-fulltext over its JSON artifact; ingest -> chunk
-> embed (`run`) over a v1-shaped jsonl worklist."""

from __future__ import annotations

import json
import os

import pytest

from tests import fixtures as FX
from trial_data_ingestion_spark.cli import main


@pytest.fixture()
def fixture_file(tmp_path):
    fx = {
        "doi_to_pmcid": {
            "10.1000/long": "PMC9999999",
            "10.1000/short": "PMC7777777",   # abstract-only -> gate
        },
        "pmcid_to_xml": {
            "PMC9999999": FX.long_jats(),
            "PMC7777777": FX.JATS_ABSTRACT_ONLY,
        },
    }
    path = tmp_path / "fixture.json"
    path.write_text(json.dumps(fx), encoding="utf-8")
    return str(path)


@pytest.mark.slow
def test_cli_fulltext_then_chunk_fulltext(spark, tmp_path, fixture_file,
                                          capsys):
    csv = tmp_path / "worklist.csv"
    csv.write_text("doi,journal\n"
                   "https://doi.org/10.1000/LONG,Journal A\n"
                   "10.1000/short,\n"
                   "10.1000/missing,Journal B\n", encoding="utf-8")
    out = str(tmp_path / "processed")
    main(["fulltext", str(csv), "--output-dir", out,
          "--fixture", fixture_file])
    printed = capsys.readouterr().out
    assert "appended: 1" in printed
    assert "failures: 2" in printed

    art_path = os.path.join(out, "fulltext_articles.json")
    with open(art_path, encoding="utf-8") as f:
        records = json.load(f)
    assert len(records) == 1
    assert records[0]["pmcid"] == "PMC9999999"
    assert records[0]["source"] == "pmc"
    with open(os.path.join(out, "fulltext_summary.json")) as f:
        assert json.load(f)["appended"] == 1
    assert os.path.exists(os.path.join(out, "fulltext_failures.csv"))

    # stage 2: the fulltext artifact feeds chunk-fulltext unchanged
    main(["chunk-fulltext", art_path, "--output-dir", out,
          "--max-tokens", "64", "--overlap", "8"])
    chunks = spark.read.parquet(os.path.join(out, "chunks.parquet"))
    rows = chunks.collect()
    assert len(rows) >= 2                       # long body -> >1 window
    # the reference's chunk_from_fulltext keys on the RAW doi field of
    # the record (chunk_from_fulltext.py:27: "id": rec.get("doi")) —
    # the keep-first dedup kept the first input spelling
    assert {r["article_id"] for r in rows} == \
        {"https://doi.org/10.1000/LONG"}
    assert all(r["chunk_id"].startswith(
        "https://doi.org/10.1000/LONG::chunk_") for r in rows)
    assert all(r["n_tokens"] <= 64 for r in rows)


def test_cli_fulltext_allow_abstract_only(tmp_path, fixture_file,
                                          capsys):
    """--allow-abstract-only (reference cli.py:26
    require_fulltext=False) keeps the short-body record as a RECORD:
    the same worklist that fails 2 under the default policy fails
    only the no-PMCID doi here."""
    csv = tmp_path / "worklist.csv"
    csv.write_text("doi,journal\n"
                   "10.1000/long,Journal A\n"
                   "10.1000/short,\n"
                   "10.1000/missing,Journal B\n", encoding="utf-8")
    out = str(tmp_path / "processed_abs")
    main(["fulltext", str(csv), "--output-dir", out,
          "--fixture", fixture_file, "--allow-abstract-only"])
    printed = capsys.readouterr().out
    assert "appended: 2" in printed
    assert "failures: 1" in printed
    with open(os.path.join(out, "fulltext_articles.json"),
              encoding="utf-8") as f:
        pmcids = {r["pmcid"] for r in json.load(f)}
    assert pmcids == {"PMC9999999", "PMC7777777"}


def test_cli_run_v1_staged_pipeline(spark, tmp_path, capsys):
    src = tmp_path / "articles_in.jsonl"
    lines = [
        {"id": "a1", "title": "T1", "doi": "10.1/a",
         "text": "alpha beta " * 200},          # 'text' -> full_text
        {"id": "a2", "title": "T2", "doi": "10.1/b",
         "full_text": "gamma delta " * 5},
    ]
    src.write_text("\n".join(json.dumps(r) for r in lines),
                   encoding="utf-8")
    out = str(tmp_path / "data")
    main(["run", str(src), "--output-dir", out,
          "--max-tokens", "32", "--overlap", "4", "--dim", "16"])
    printed = capsys.readouterr().out
    assert "articles:" in printed and "embeddings:" in printed

    arts = spark.read.json(os.path.join(out, "articles.jsonl"))
    assert arts.count() == 2
    # url/source are null for every row, and Spark's JSON writer
    # omits null fields — only the populated Article fields appear
    assert set(arts.columns) >= {"id", "title", "doi", "full_text"}

    chunks = spark.read.parquet(os.path.join(out, "chunks.parquet"))
    by_doc = {r["article_id"] for r in chunks.collect()}
    assert by_doc == {"a1", "a2"}
    assert chunks.where("article_id = 'a1'").count() > 1

    emb = spark.read.parquet(os.path.join(out, "embeddings.parquet"))
    row = emb.first()
    assert len(row["embedding"]) == 16
    assert emb.count() == chunks.count()


def test_cli_rejects_unknown_extension(tmp_path):
    bad = tmp_path / "input.xyz"
    bad.write_text("nope", encoding="utf-8")
    with pytest.raises(SystemExit):
        main(["ingest", str(bad), "--output-dir", str(tmp_path / "d")])
    with pytest.raises(SystemExit):
        main([])                                 # no command
