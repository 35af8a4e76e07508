"""Chunking operators C1-C4 (SURVEY.md §2.7).

The reference's chunkers (behavioral contract, not copied code):

* C1 char-window splitter — ``chunking/chunkers.py:48-77``:
  whitespace-normalize; windows of ``chunk_size`` chars; window end
  extended up to 40 chars to the next whitespace so words aren't cut;
  next window starts at ``end - overlap`` (the *bumped* end, which
  makes the recurrence iterative); chunks stripped, empties dropped;
  ``chunk_size <= 0`` means "no splitting"; overlap clamped to
  ``[0, chunk_size-1]``.
* C2 by-section chunker — ``chunking/chunkers.py:94-114``: one chunk
  per (section_path, text), long sections re-windowed by C1, running
  ``chunk_index`` across sections in document order; empty structure
  falls back to the whole flattened article.
* C3 fixed-window chunker — ``chunking/chunkers.py:116-125``: flatten
  the whole article, then C1.
* C4 token-window chunker (v1) — ``chunking/chunker_archived.py:8-50``:
  encode to tokens, windows of ``max_tokens`` with token ``overlap``,
  decode back, per-chunk ``n_tokens``.

Spark design: the window recurrence is inherently sequential *within a
document* but embarrassingly parallel *across documents*, so C1 runs as
an Arrow-batched ``pandas_udf`` returning ``array<string>`` followed by
``posexplode`` — one Python round-trip per batch of documents, with the
explode and all indexing/ids done natively afterwards. At 100 TB the
operator is shuffle-free: chunking is a narrow map over whatever
partitioning the scan produced.
"""

from __future__ import annotations

import re
from typing import Iterator, List

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from trial_data_ingestion_spark.functions.text import chunk_id

_WS_RE = re.compile(r"\s+")
_BUMP_RE = re.compile(r"\s")

# Reference defaults: 1200-char windows, 120 overlap
# (pipelines/ingest_and_embed.py:36-37).
DEFAULT_CHUNK_SIZE = 1200
DEFAULT_OVERLAP = 120


def split_text_windows(text: str, chunk_size: int, overlap: int) -> List[str]:
    """C1 kernel — reproduces ``_split_text_windows`` behavior exactly
    (chunking/chunkers.py:48-77), including the <=40-char whitespace
    bump and the bumped-end overlap recurrence."""
    if text is None:
        return []
    text = _WS_RE.sub(" ", text).strip()
    if not text:
        return []
    if chunk_size <= 0:
        return [text]
    overlap = max(0, min(overlap, max(0, chunk_size - 1)))
    n = len(text)
    out: List[str] = []
    start = 0
    while start < n:
        end = min(n, start + chunk_size)
        if end < n:
            m = _BUMP_RE.search(text[end:end + 40])
            if m:
                end += m.start()
        piece = text[start:end].strip()
        if piece:
            out.append(piece)
        if end == n:
            break
        start = end - overlap
    return out


def chunk_array_udf(chunk_size: int = DEFAULT_CHUNK_SIZE,
                    overlap: int = DEFAULT_OVERLAP):
    """Arrow-batched scalar pandas UDF: text -> array<string> of chunks."""
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _chunk(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: split_text_windows(t, chunk_size, overlap))
    return _chunk


def chunk_fixed(df: DataFrame, text_col: str, id_col: str,
                chunk_size: int = DEFAULT_CHUNK_SIZE,
                overlap: int = DEFAULT_OVERLAP,
                keep_cols: list[str] | None = None) -> DataFrame:
    """C3 — fixed-window chunking of a text column.

    Returns one row per chunk with ``chunk_index`` (0-based, free from
    ``posexplode`` — no window function, no shuffle) and the
    deterministic ``chunk_id`` P10.
    """
    udf = chunk_array_udf(chunk_size, overlap)
    keep = keep_cols or []
    exploded = (
        df.select(F.col(id_col), *[F.col(c) for c in keep],
                  F.posexplode(udf(F.col(text_col))).alias("chunk_index",
                                                           "chunk_text"))
    )
    return exploded.withColumn(
        "chunk_id", chunk_id(F.col(id_col).cast("string"),
                             F.col("chunk_index")))


def chunk_by_section(df: DataFrame, sections_col: str, id_col: str,
                     chunk_size: int = DEFAULT_CHUNK_SIZE,
                     overlap: int = DEFAULT_OVERLAP) -> DataFrame:
    """C2 — per-section chunking with a running per-document index.

    ``sections_col`` is the normalized
    ``array<struct<section_path:string, text:string>>`` (SURVEY.md
    §1.3). Section order and window order are both explicit, so the
    global ``chunk_index`` is a deterministic ``row_number`` per doc.
    The window shuffle partitions by doc id — at scale that is the
    natural partitioning for every downstream per-doc operator, so the
    exchange is reused, not wasted.
    """
    udf = chunk_array_udf(chunk_size, overlap)
    sec = df.select(
        F.col(id_col),
        F.posexplode(F.col(sections_col)).alias("section_ord", "section"),
    ).select(
        F.col(id_col), "section_ord",
        F.col("section.section_path").alias("section_path"),
        F.col("section.text").alias("section_text"),
    )
    win = sec.select(
        F.col(id_col), "section_ord", "section_path",
        F.posexplode(udf(F.col("section_text"))).alias("window_ord",
                                                       "chunk_text"),
    )
    order = Window.partitionBy(id_col).orderBy("section_ord", "window_ord")
    return (
        win.withColumn("chunk_index", F.row_number().over(order) - F.lit(1))
           .withColumn("chunk_id", chunk_id(F.col(id_col).cast("string"),
                                            F.col("chunk_index")))
           .drop("section_ord", "window_ord")
    )


# --------------------------------------------------------------------------
# C4 — token-window chunker (v1 semantics).  The reference uses a HF
# tokenizer (chunker_archived.py:26); transformers is not available in
# this environment, so the default tokenizer is a deterministic BPE-ish
# regex word/punctuation splitter with identity decode.  The split /
# window / decode / recount pipeline is the real contract and is fully
# exercised; a HF tokenizer can be dropped in via ``encode``/``decode``
# callables (loaded lazily once per executor).
# --------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"\w+|[^\w\s]")


def regex_encode(text: str) -> List[str]:
    return _TOKEN_RE.findall(text)


def regex_decode(tokens: List[str]) -> str:
    return " ".join(tokens)


def split_by_tokens(text: str, max_tokens: int, overlap: int,
                    encode=regex_encode, decode=regex_decode) -> List[str]:
    """Token windowing per chunker_archived.py:8-22: windows of
    ``max_tokens`` token ids, next start at ``end - overlap``.

    Overlap is clamped to ``[0, max_tokens - 1]`` (the C1 splitter's
    clamp, which the reference's archived chunker lacks): with
    ``overlap >= max_tokens`` the start index would never advance and
    the loop would spin forever inside a mapInPandas task."""
    if not text or not text.strip():
        return []
    if max_tokens <= 0:
        raise ValueError(f"max_tokens must be positive, got {max_tokens}")
    overlap = max(0, min(overlap, max_tokens - 1))
    tokens = encode(text)
    out: List[str] = []
    start = 0
    while start < len(tokens):
        end = min(start + max_tokens, len(tokens))
        out.append(decode(tokens[start:end]).strip())
        if end == len(tokens):
            break
        start = max(0, end - overlap)
    return out


def chunk_by_tokens(df: DataFrame, text_col: str, id_col: str,
                    max_tokens: int = 512, overlap: int = 50) -> DataFrame:
    """C4 — token-window chunking via ``mapInPandas``.

    Emits the v1 chunk shape (chunker_archived.py:37-49):
    ``article_id, chunk_id ("{id}::chunk_{i}"), text, n_tokens``.
    """
    schema = T.StructType([
        T.StructField("article_id", T.StringType()),
        T.StructField("chunk_id", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_tokens", T.IntegerType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, text in zip(pdf[id_col], pdf[text_col]):
                aid = "" if aid is None else str(aid)
                for i, ch in enumerate(
                        split_by_tokens(text, max_tokens, overlap)):
                    rows.append((aid, f"{aid}::chunk_{i}", ch,
                                 len(regex_encode(ch))))
            yield pd.DataFrame(rows, columns=[f.name for f in schema.fields])

    return df.select(id_col, text_col).mapInPandas(run, schema)


# ---------------------------------------------------------------------------
# Content-defined chunking (CDC)
# ---------------------------------------------------------------------------

# 256-entry gear table derived from md5 so the hash — and therefore
# every chunk boundary — is stable across runs, engines, and machines.
_GEAR = None


def _gear_table() -> List[int]:
    global _GEAR
    if _GEAR is None:
        import hashlib
        _GEAR = [int.from_bytes(
            hashlib.md5(b"cdc-gear-%d" % b).digest()[:8], "big")
            for b in range(256)]
    return _GEAR


def split_content_defined(text: str, target_size: int = 512,
                          min_size: int | None = None,
                          max_size: int | None = None) -> List[str]:
    """Gear-hash content-defined splitting (FastCDC-style, public
    algorithm family): a rolling hash over the UTF-8 bytes declares a
    boundary where ``hash % target_size == target_size - 1``, with
    min/max clamps.  Unlike fixed windows (C1/C3), boundaries depend
    only on LOCAL content — inserting text early in a document leaves
    every later chunk identical, which is what makes chunk-level
    exact/near dedup robust to edits.

    The min-size clamp is applied by skipping the hash check for the
    first ``min_size`` bytes of each chunk (the standard CDC trick:
    it also re-synchronizes boundaries after an edit); ``max_size``
    forces a cut.  Splits are byte-positioned but snapped back to
    UTF-8 character starts so multi-byte text never tears."""
    if not text:
        return []
    min_size = max(1, min_size if min_size is not None
                   else target_size // 4)
    max_size = max_size if max_size is not None else target_size * 4
    if max_size < min_size:
        raise ValueError(f"max_size {max_size} < min_size {min_size}")
    gear = _gear_table()
    data = text.encode("utf-8")
    n = len(data)
    cuts = []
    start = 0
    while start < n:
        h = 0
        end = min(n, start + max_size)
        pos = start + min_size
        cut = end
        i = start
        while i < end:
            h = ((h << 1) + gear[data[i]]) & 0xFFFFFFFFFFFFFFFF
            if i >= pos and h % target_size == target_size - 1:
                cut = i + 1
                break
            i += 1
        # snap to a UTF-8 character boundary (continuation bytes are
        # 0b10xxxxxx) — BACKWARD, so a max_size-forced cut never
        # overshoots the documented clamp; fall forward only in the
        # degenerate case where backing up would empty the chunk
        if cut < n and (data[cut] & 0xC0) == 0x80:
            back = cut
            while back > start and (data[back] & 0xC0) == 0x80:
                back -= 1
            if back > start:
                cut = back
            else:
                while cut < n and (data[cut] & 0xC0) == 0x80:
                    cut += 1
        cuts.append(cut)
        start = cut
    out = []
    prev = 0
    for c in cuts:
        out.append(data[prev:c].decode("utf-8"))
        prev = c
    return out


def chunk_content_defined(df: DataFrame, text_col: str, id_col: str,
                          target_size: int = 512,
                          min_size: int | None = None,
                          max_size: int | None = None) -> DataFrame:
    """CDC chunking over a corpus via ``mapInPandas`` (same Arrow
    tier as C4).  Emits (doc_id, chunk_id, chunk_index, text,
    n_chars); ``chunk_id`` is content-addressed (md5 of the chunk
    text) so identical chunks collide across documents — feed it
    straight into exact dedup for edit-resistant chunk-level
    dedup.

    Scale: embarrassingly parallel, no shuffle; the rolling hash is
    O(bytes) per doc with no backtracking."""
    import hashlib

    schema = T.StructType([
        T.StructField("doc_id", T.StringType()),
        T.StructField("chunk_id", T.StringType()),
        T.StructField("chunk_index", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                did = "" if did is None else str(did)
                for i, ch in enumerate(split_content_defined(
                        text or "", target_size, min_size, max_size)):
                    cid = hashlib.md5(ch.encode("utf-8")).hexdigest()
                    rows.append((did, cid, i, ch, len(ch)))
            yield pd.DataFrame(rows,
                               columns=[f.name for f in schema.fields])

    return df.select(id_col, text_col).mapInPandas(run, schema)
