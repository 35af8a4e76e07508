"""Command-line parity shim for the reference's typer CLI
(reference ``cli.py:11-73``): the same six commands over the same
staged artifacts, each a thin argparse wrapper around this package's
library API — the CLI adds NO pipeline logic of its own.

Commands and their library mappings:

  fulltext        -> :func:`pipelines.fulltext.run_fulltext`
                     (.bib/.csv worklist -> fulltext_articles.json +
                     fulltext_failures.csv + fulltext_summary.json)
  chunk-fulltext  -> read JSON array -> sections flatten ->
                     :func:`operators.chunking.chunk_by_tokens`
                     -> chunks.parquet  (reference
                     ``pipelines/chunk_from_fulltext.py:12-37``)
  ingest          -> worklist -> articles.jsonl   (v1 ``ingest_stage``,
                     ``preprocessing/normalize.py:51-59``)
  chunk           -> articles.jsonl -> chunks.parquet (v1 C4 chunker)
  embed           -> chunks.parquet -> embeddings.parquet
                     (v1 ``embedder_archived.py:20-25``; default
                     backend is the offline-deterministic hash
                     embedder — pass ``--embed-backend hf|openai``
                     for the env-gated real ones)
  run             -> ingest -> chunk -> embed  (v1 ``run_all``)

Networking: the reference CLI always talks to live NCBI.  Here the
``fulltext`` command defaults to :class:`LiveNCBIFetcher` but accepts
``--fixture PATH`` (a JSON file with ``doi_to_pmcid`` /
``pmcid_to_xml`` maps) to run fully offline — the same
:class:`FixtureFetcher` the test suite uses, so the command is
smoke-testable in an air-gapped container.

Flag parity (reference ``cli.py:13-31``): all pipeline-POLICY flags
are present (``--idconv-chunk``/``--efetch-chunk``,
``--min-fulltext-chars``, ``--require-fulltext/--allow-abstract-only``,
the single-fallback toggle, ``--request-timeout``).
``--batch-workers`` (reference thread-pool width, cli.py:17) is wired
to its Spark twin: the connector worklists' PARTITION count, which
bounds concurrent fetch tasks — and, with each task holding its own
``--rpm`` limiter, caps aggregate request rate at workers x rpm.
Deliberately OMITTED are the remaining driver-execution knobs, which
have no meaning under Spark's execution model:

  --batch-throttle-sec / per-thread sleeps -> subsumed by the
  --throttle-sec         client-side ``--rpm`` rate limiter, which
                         bounds the aggregate request rate no matter
                         how many partitions fetch concurrently
  --progress             tqdm bar -> the Spark UI / event log is the
                         progress surface for a distributed job

Tokenization: the reference chunker tokenizes with a HuggingFace
``AutoTokenizer`` (``chunker_archived.py:26``); this package's C4
chunker uses the regex tokenizer (``operators/chunking.py:161``) so
the CLI needs no model download.  ``--model-name`` is accepted for
interface parity and recorded in the artifact metadata.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional


def _get_spark(app_name: str):
    from trial_data_ingestion_spark.session import get_spark
    return get_spark(app_name=app_name)


def _read_worklist(spark, input_path: str):
    """Extension-dispatch via the S1-S5 readers (readers.read_input);
    unsupported extensions exit with the reader's message."""
    from trial_data_ingestion_spark.sources.readers import read_input
    try:
        return read_input(spark, input_path)
    except ValueError as e:
        raise SystemExit(str(e))


def _fetcher_factory(args):
    """--fixture PATH -> offline FixtureFetcher; default live NCBI."""
    from trial_data_ingestion_spark.sources.http_connector import (
        FixtureFetcher, LiveNCBIFetcher,
    )
    if args.fixture:
        with open(args.fixture, encoding="utf-8") as f:
            fx = json.load(f)
        return lambda: FixtureFetcher(
            fx.get("doi_to_pmcid", {}), fx.get("pmcid_to_xml", {}),
            oai_xml=fx.get("oai_xml"), epmc_xml=fx.get("epmc_xml"),
            epmc_doi_to_pmcid=fx.get("epmc_doi_to_pmcid"))
    timeout, rpm = args.request_timeout, args.rpm
    return lambda: LiveNCBIFetcher(timeout=timeout, rpm=rpm)


def cmd_fulltext(args) -> None:
    from trial_data_ingestion_spark.pipelines.fulltext import (
        run_fulltext, summarize,
    )
    from trial_data_ingestion_spark.sinks import (
        write_csv, write_json_array, write_summary_json,
    )
    spark = _get_spark("cli-fulltext")
    result = run_fulltext(
        _read_worklist(spark, args.input_path),
        _fetcher_factory(args),
        min_fulltext_chars=args.min_fulltext_chars,
        idconv_batch=args.idconv_chunk,
        efetch_batch=args.efetch_chunk,
        single_fallback=args.single_fallback,
        require_fulltext=args.require_fulltext,
        batch_workers=args.batch_workers)
    out = args.output_dir
    os.makedirs(out, exist_ok=True)
    # same artifact trio as the reference run (K1/K2/K6 —
    # fulltext_enricher.py:230-249)
    write_json_array(result["records"],
                     os.path.join(out, "fulltext_articles.json"))
    write_csv(result["failures"],
              os.path.join(out, "fulltext_failures.csv"))
    summary = summarize(result)
    write_summary_json(summary,
                       os.path.join(out, "fulltext_summary.json"))
    for k, v in summary.items():
        print(f"{k}: {v}")


def cmd_chunk_fulltext(args) -> None:
    from pyspark.sql import functions as F

    from trial_data_ingestion_spark.functions.text import (
        sections_to_text,
    )
    from trial_data_ingestion_spark.operators.chunking import (
        chunk_by_tokens,
    )
    from trial_data_ingestion_spark.sources.readers import (
        read_json_array,
    )
    spark = _get_spark("cli-chunk-fulltext")
    recs = read_json_array(spark, args.fulltext_json)
    flat = recs.select(
        F.col("doi").alias("id"),
        sections_to_text(F.col("sections")).alias("full_text"))
    chunks = (chunk_by_tokens(flat, "full_text", "id",
                              max_tokens=args.max_tokens,
                              overlap=args.overlap)
              .withColumn("model_name",
                          F.lit(args.model_name or "regex")))
    os.makedirs(args.output_dir, exist_ok=True)
    out_path = os.path.join(args.output_dir, "chunks.parquet")
    chunks.write.mode("overwrite").parquet(out_path)
    print(out_path)


def _ingest(spark, input_path: str, output_dir: str) -> str:
    """v1 ingest_stage: worklist -> normalized articles.jsonl
    (Article shape: id/title/doi/url/source/full_text —
    normalize.py:36-49, via readers.normalize_articles)."""
    from trial_data_ingestion_spark.sinks import write_jsonl
    from trial_data_ingestion_spark.sources.readers import (
        normalize_articles,
    )
    articles = normalize_articles(_read_worklist(spark, input_path))
    os.makedirs(output_dir, exist_ok=True)
    out_path = os.path.join(output_dir, "articles.jsonl")
    write_jsonl(articles, out_path)
    return out_path


def _chunk(spark, input_path: str, output_dir: str,
           model_name: Optional[str], max_tokens: int,
           overlap: int) -> str:
    """v1 chunk_stage: articles.jsonl -> C4 token chunks parquet."""
    from pyspark.sql import functions as F

    from trial_data_ingestion_spark.operators.chunking import (
        chunk_by_tokens,
    )
    from trial_data_ingestion_spark.sources.readers import read_jsonl
    arts = read_jsonl(spark, input_path)
    chunks = (chunk_by_tokens(arts, "full_text", "id",
                              max_tokens=max_tokens, overlap=overlap)
              .withColumn("model_name", F.lit(model_name or "regex")))
    os.makedirs(output_dir, exist_ok=True)
    out_path = os.path.join(output_dir, "chunks.parquet")
    chunks.write.mode("overwrite").parquet(out_path)
    return out_path


def _embed(spark, chunks_path: str, output_dir: str,
           backend: str, model_name: Optional[str],
           dim: int) -> str:
    """v1 embed_stage: chunks.parquet -> embeddings.parquet
    (embedder_archived.py:20-25); hash backend is the offline
    default, hf/openai resolve the env-gated real embedders."""
    from trial_data_ingestion_spark.operators.embedding import (
        embed_text, resolve_backend,
    )
    if backend == "hash":
        factory = resolve_backend("hash", dim=dim)
    else:
        factory = resolve_backend(backend, model=model_name) \
            if model_name else resolve_backend(backend)
    chunks = spark.read.parquet(chunks_path)
    embedded = embed_text(chunks, "text", factory)
    os.makedirs(output_dir, exist_ok=True)
    out_path = os.path.join(output_dir, "embeddings.parquet")
    embedded.write.mode("overwrite").parquet(out_path)
    return out_path


def cmd_ingest(args) -> None:
    spark = _get_spark("cli-ingest")
    print(_ingest(spark, args.input_path, args.output_dir))


def cmd_chunk(args) -> None:
    spark = _get_spark("cli-chunk")
    print(_chunk(spark, args.input_path, args.output_dir,
                 args.model_name, args.max_tokens, args.overlap))


def cmd_embed(args) -> None:
    spark = _get_spark("cli-embed")
    print(_embed(spark, args.chunks_path, args.output_dir,
                 args.embed_backend, args.model_name, args.dim))


def cmd_run(args) -> None:
    spark = _get_spark("cli-run")
    articles = _ingest(spark, args.input_path, args.output_dir)
    chunks = _chunk(spark, articles, args.output_dir,
                    args.model_name, args.max_tokens, args.overlap)
    embeddings = _embed(spark, chunks, args.output_dir,
                        args.embed_backend, args.model_name, args.dim)
    for k, v in (("articles", articles), ("chunks", chunks),
                 ("embeddings", embeddings)):
        print(f"{k}: {v}")


def build_parser() -> argparse.ArgumentParser:
    from trial_data_ingestion_spark.config import get_settings
    s = get_settings()
    p = argparse.ArgumentParser(
        prog="trial_data_ingestion_spark",
        description="Ingestion + Fulltext + Chunking + Embeddings "
                    "pipeline (Spark)")
    sub = p.add_subparsers(dest="command", required=True)

    ft = sub.add_parser(
        "fulltext",
        help="Build fulltext_articles.json (+ summary/CSV) from DOIs")
    ft.add_argument("input_path",
                    help=".bib or .csv with a 'doi' column")
    ft.add_argument("--output-dir", default=s.processed_dir)
    ft.add_argument("--idconv-chunk", type=int, default=150)
    ft.add_argument("--efetch-chunk", type=int, default=80)
    ft.add_argument("--request-timeout", type=int, default=45)
    ft.add_argument("--rpm", type=int, default=None,
                    help="client-side rate limit (requests/minute)")
    ft.add_argument("--min-fulltext-chars", type=int, default=200)
    # reference cli.py:26 --require-fulltext/--allow-abstract-only
    ft.add_argument("--require-fulltext", dest="require_fulltext",
                    action="store_true", default=True)
    ft.add_argument("--allow-abstract-only", dest="require_fulltext",
                    action="store_false")
    ft.add_argument("--allow-pmc-single-fallback", dest="single_fallback",
                    action="store_true", default=False)
    # reference cli.py:17 --batch-workers: thread-pool width -> the
    # connector worklists' partition count (bounds concurrent fetch
    # tasks; with per-task --rpm limiters, aggregate RPM too)
    ft.add_argument("--batch-workers", type=int, default=None)
    ft.add_argument("--fixture", default=None,
                    help="JSON fixture file -> offline FixtureFetcher")
    ft.set_defaults(func=cmd_fulltext)

    cf = sub.add_parser("chunk-fulltext",
                        help="Chunk fulltext_articles.json to parquet")
    cf.add_argument("fulltext_json", nargs="?",
                    default="data/processed/fulltext_articles.json")
    cf.add_argument("--output-dir", default=s.processed_dir)
    cf.add_argument("--model-name", default=None)
    cf.add_argument("--max-tokens", type=int, default=s.max_tokens)
    cf.add_argument("--overlap", type=int, default=s.chunk_overlap)
    cf.set_defaults(func=cmd_chunk_fulltext)

    ing = sub.add_parser("ingest",
                         help="Normalize input to articles.jsonl")
    ing.add_argument("input_path")
    ing.add_argument("--output-dir", default="data")
    ing.set_defaults(func=cmd_ingest)

    ch = sub.add_parser("chunk",
                        help="Chunk articles.jsonl to chunks.parquet")
    ch.add_argument("input_path")
    ch.add_argument("--output-dir", default="data")
    ch.add_argument("--model-name", default=None)
    ch.add_argument("--max-tokens", type=int, default=s.max_tokens)
    ch.add_argument("--overlap", type=int, default=s.chunk_overlap)
    ch.set_defaults(func=cmd_chunk)

    em = sub.add_parser("embed",
                        help="Embed chunks.parquet to embeddings.parquet")
    em.add_argument("chunks_path")
    em.add_argument("--output-dir", default="data")
    em.add_argument("--model-name", default=None)
    em.add_argument("--embed-backend", default="hash",
                    choices=("hash", "hf", "openai"))
    em.add_argument("--dim", type=int, default=64)
    em.set_defaults(func=cmd_embed)

    rn = sub.add_parser("run", help="ingest -> chunk -> embed")
    rn.add_argument("input_path")
    rn.add_argument("--output-dir", default="data")
    rn.add_argument("--model-name", default=None)
    rn.add_argument("--max-tokens", type=int, default=s.max_tokens)
    rn.add_argument("--overlap", type=int, default=s.chunk_overlap)
    rn.add_argument("--embed-backend", default="hash",
                    choices=("hash", "hf", "openai"))
    rn.add_argument("--dim", type=int, default=64)
    rn.set_defaults(func=cmd_run)
    return p


def main(argv: Optional[list] = None) -> None:
    args = build_parser().parse_args(argv)
    args.func(args)


if __name__ == "__main__":
    main(sys.argv[1:])
