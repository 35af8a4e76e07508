"""WARC (Web ARChive, ISO 28500) source — the container format of
web-crawl corpora (Common Crawl et al.), the dominant raw input of
large-scale pretraining pipelines.

The reference ingests publisher XML; a 100 TB training pipeline
starts one step earlier, at the crawl.  This source reads WARC files
Spark-first:

* ``spark.read.format("binaryFile")`` lists and ships whole files —
  one task per WARC file, which is exactly the right parallelism
  unit (crawl archives come as many ~1 GB files; record boundaries
  never span files).
* An Arrow-batched ``mapInPandas`` kernel walks each file's records
  (pure stdlib: WARC headers are RFC-822-style; ``.warc.gz`` uses
  the member-per-record convention, which ``gzip.decompress``
  handles transparently as concatenated members).
* ``response`` records are parsed one level deeper: the HTTP status
  line / headers are split from the body, so callers get the page
  bytes and the declared content type as columns.

Filters on (warc_type, content_type, http_status) are ordinary
pushed-down-into-the-kernel-output predicates; column pruning drops
``payload`` for metadata-only queries before anything is shipped.
"""

from __future__ import annotations

import gzip
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = ("path string, record_id string, warc_type string, "
               "target_uri string, warc_date string, "
               "content_type string, http_status int, "
               "http_content_type string, payload binary")


def _parse_headers(block: bytes) -> dict:
    headers: dict = {}
    for line in block.split(b"\n"):
        line = line.rstrip(b"\r")
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1", "replace")
    return headers


def iter_warc_records(data: bytes):
    """Yield (warc_headers: dict, payload: bytes) per record.
    Tolerates \\r\\n and bare \\n terminators; resynchronizes on the
    next ``WARC/`` magic if a record is malformed."""
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(b"\r\n\r\n", start)
        sep_len = 4
        alt = data.find(b"\n\n", start)
        if hdr_end < 0 or (0 <= alt < hdr_end):
            hdr_end, sep_len = alt, 2
        if hdr_end < 0:
            return
        headers = _parse_headers(data[start:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = start + 5
            continue
        body_start = hdr_end + sep_len
        payload = data[body_start:body_start + length]
        yield headers, payload
        pos = body_start + length


def _split_http(payload: bytes) -> tuple:
    """(status:int|None, content_type:str|None, body:bytes) from an
    HTTP response payload; returns the payload unchanged when it
    doesn't start with an HTTP status line."""
    if not payload.startswith(b"HTTP/"):
        return None, None, payload
    for sep in (b"\r\n\r\n", b"\n\n"):
        cut = payload.find(sep)
        if cut >= 0:
            head, body = payload[:cut], payload[cut + len(sep):]
            break
    else:
        return None, None, payload
    lines = head.split(b"\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        status = None
    http_headers = _parse_headers(head)
    return status, http_headers.get("content-type"), body


def read_warc(spark: SparkSession, path: str,
              types: tuple = ("response",)) -> DataFrame:
    """One row per WARC record of the given ``types`` across every
    file matched by ``path`` (``binaryFile`` accepts globs).  For
    ``response`` records, ``http_status``/``http_content_type`` are
    parsed and ``payload`` is the HTTP BODY; for other types the
    payload is the raw record block."""
    files = (spark.read.format("binaryFile").load(path)
             .select("path", "content"))
    return _records_kernel(files, types)


def _records_kernel(files: DataFrame, types: tuple) -> DataFrame:
    """Shared batch/streaming record-walk (see :func:`read_warc`)."""
    import pandas as pd

    want = {t.lower() for t in types} if types else None

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict = {k: [] for k in
                         ("path", "record_id", "warc_type",
                          "target_uri", "warc_date", "content_type",
                          "http_status", "http_content_type",
                          "payload")}
            for path_, content in zip(pdf["path"], pdf["content"]):
                data = bytes(content)
                if path_.endswith(".gz"):
                    data = gzip.decompress(data)
                for headers, payload in iter_warc_records(data):
                    wtype = headers.get("warc-type", "")
                    if want is not None and wtype.lower() not in want:
                        continue
                    status, http_ct, body = (
                        _split_http(payload)
                        if wtype.lower() == "response"
                        else (None, None, payload))
                    out["path"].append(path_)
                    out["record_id"].append(
                        headers.get("warc-record-id", ""))
                    out["warc_type"].append(wtype)
                    out["target_uri"].append(
                        headers.get("warc-target-uri"))
                    out["warc_date"].append(headers.get("warc-date"))
                    out["content_type"].append(
                        headers.get("content-type"))
                    out["http_status"].append(status)
                    out["http_content_type"].append(http_ct)
                    out["payload"].append(body)
            yield pd.DataFrame(out)

    return files.mapInPandas(kernel, schema=WARC_SCHEMA)


def read_warc_stream(spark: SparkSession, path: str,
                     types: tuple = ("response",),
                     max_files_per_trigger: int | None = None
                     ) -> DataFrame:
    """Streaming twin of :func:`read_warc`: a crawl-drop directory
    consumed as a file-source stream (``binaryFile`` is a supported
    streaming source; the record-walk kernel is stateless, so the
    batch and streaming paths share the exact same code).  Pair with
    ``availableNow`` for catch-up batches or leave running for
    continuous ingest."""
    reader = (spark.readStream.format("binaryFile")
              .schema("path string, modificationTime timestamp, "
                      "length long, content binary"))
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger",
                               max_files_per_trigger)
    files = reader.load(path).select("path", "content")
    return _records_kernel(files, types)
