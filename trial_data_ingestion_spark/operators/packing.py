"""Sequence packing: bin chunks into fixed token-budget training
sequences.

North-star training-data-pipeline tier (BASELINE.json).  The
reference repo stops at chunking (C1-C4); a pretraining pipeline then
PACKS chunks into sequences of exactly the model's context length so
no batch slot is wasted on padding.  This operator implements
deterministic first-fit-decreasing (FFD) packing as a sharded
``applyInPandas`` kernel.

Scale design (100 TB):
  * Packing is a bin-packing problem; cross-shard optimality buys
    <1% fill over shard-local FFD (FFD alone guarantees <= 11/9 OPT
    + 1 bins, and real chunk-size distributions pack ~99% full), so
    the distributed answer is shard-local packing — embarrassingly
    parallel, ONE shuffle by shard key, shard count chosen so a
    shard's (id, n_tokens) rows fit executor memory comfortably
    (rows are ~16 B each; 2^20 rows/shard is nothing).
  * Shard-sizing rule (measured, tests/test_packing.py): each shard
    ends with one partially-filled tail sequence, so waste is about
    ``num_shards * max_tokens / (2 * total_tokens)``.  Keep
    ``total_tokens / num_shards >= ~50 * max_tokens`` and mean fill
    stays >= 0.98; violate it (tiny corpus, huge budget, many
    shards) and the tail dominates — at 100 TB any sane shard count
    satisfies the rule with orders of magnitude to spare.
  * The kernel is Arrow-batched pandas (same split as the C4 token
    chunker: plan-transparent native ops where possible, vectorized
    Python where the algorithm is inherently sequential).
  * Determinism: shard = hash(id) % shards, candidates sorted by
    (-n_tokens, id) before FFD, sequences numbered in creation
    order — same input, same packing, independent of input
    partitioning or row order.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(df: DataFrame, id_col: str = "chunk_id",
                   token_col: str = "n_tokens",
                   max_tokens: int = 2048,
                   num_shards: int = 64) -> DataFrame:
    """Assign every row to a packed sequence.

    Returns the input columns plus:
      * ``seq_id``    — ``"{shard}/{k}"``, globally unique;
      * ``seq_pos``   — 0-based position within the sequence
        (FFD insertion order);
      * ``truncated`` — True when a single chunk exceeds
        ``max_tokens`` and was given a singleton sequence (callers
        decide whether to split or drop it; packing never silently
        drops data).

    Every input row appears in the output exactly once, and no
    sequence's token total exceeds ``max_tokens`` except flagged
    singleton oversize chunks.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField("seq_id", T.StringType(), False),
           T.StructField("seq_pos", T.IntegerType(), False),
           T.StructField("truncated", T.BooleanType(), False)])
    cols = [f.name for f in df.schema.fields]

    def pack_shard(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        pdf = pdf.sort_values(
            [token_col, id_col], ascending=[False, True],
            kind="mergesort").reset_index(drop=True)
        # open bins: parallel lists of remaining budget; FFD scans
        # open bins first-fit.  Chunk counts per shard are modest, and
        # real chunk-size distributions close bins fast, so the scan
        # list stays short.
        remaining: list[int] = []
        fill_count: list[int] = []
        seq_ids, seq_pos, trunc = [], [], []
        for tok in pdf[token_col].astype("int64"):
            tok = int(tok)
            if tok > max_tokens:
                b = len(remaining)
                remaining.append(0)
                fill_count.append(1)
                seq_ids.append(f"{shard}/{b}")
                seq_pos.append(0)
                trunc.append(True)
                continue
            for b, rem in enumerate(remaining):
                if tok <= rem:
                    break
            else:
                b = len(remaining)
                remaining.append(max_tokens)
                fill_count.append(0)
            remaining[b] -= tok
            seq_ids.append(f"{shard}/{b}")
            seq_pos.append(fill_count[b])
            fill_count[b] += 1
            trunc.append(False)
        pdf = pdf[cols].copy()
        pdf["seq_id"] = seq_ids
        pdf["seq_pos"] = pd.array(seq_pos, dtype="int32")
        pdf["truncated"] = trunc
        return pdf

    shard = F.pmod(F.xxhash64(F.col(id_col).cast("string")),
                   F.lit(num_shards)).alias("__shard")
    return (df.withColumn("__shard", shard)
              .groupBy("__shard")
              .applyInPandas(pack_shard, schema=out_schema))


def packing_stats(packed: DataFrame, token_col: str = "n_tokens",
                  max_tokens: int = 2048) -> DataFrame:
    """One row per sequence: n_chunks, total_tokens, fill_ratio.
    The corpus-level mean of ``fill_ratio`` is the padding-waste
    metric training teams track."""
    return (packed.groupBy("seq_id")
            .agg(F.count(F.lit(1)).alias("n_chunks"),
                 F.sum(token_col).alias("total_tokens"),
                 F.max("truncated").alias("truncated"))
            .withColumn("fill_ratio",
                        F.least(F.col("total_tokens").cast("double")
                                / max_tokens, F.lit(1.0))))


def materialize_sequences(token_rows: DataFrame,
                          id_col: str = "chunk_id",
                          ids_col: str = "token_ids",
                          eod_id: int | None = None,
                          max_tokens: int = 2048,
                          num_shards: int = 64) -> DataFrame:
    """The final mile: turn per-document token-id arrays into the
    fixed-context training rows a dataloader reads.

    Input: (id, token-id array) — e.g. ``bpe.encode_ids`` output.
    Each document's LENGTH feeds :func:`pack_sequences` (FFD over
    counts, never over payloads), then one shuffle on ``seq_id``
    assembles each sequence: members concatenated in ``seq_pos``
    order with ``eod_id`` appended after every document when given
    (the GPT-style end-of-document separator — counted against the
    budget via the +1 per member).

    Output: (seq_id, token_ids, n_tokens, n_docs, truncated) — one
    row per packed sequence, ``n_tokens <= max_tokens`` except
    flagged singleton oversize docs.  Payload bytes move through
    exactly ONE exchange (the seq_id groupBy); the packing decision
    itself moved only counts."""
    sep = 1 if eod_id is not None else 0
    counted = token_rows.select(
        F.col(id_col),
        (F.size(ids_col) + F.lit(sep)).cast("long").alias("__n"))
    packed = pack_sequences(counted, id_col=id_col, token_col="__n",
                            max_tokens=max_tokens,
                            num_shards=num_shards)
    joined = packed.join(token_rows.select(id_col, ids_col), id_col)
    body = (F.concat(F.col(ids_col), F.array(F.lit(eod_id)))
            if eod_id is not None else F.col(ids_col))
    per_member = joined.select(
        "seq_id", "seq_pos", "truncated", body.alias("__body"))
    return (per_member
            .groupBy("seq_id")
            .agg(F.flatten(F.array_sort(F.collect_list(
                     F.struct("seq_pos", "__body"))).getField("__body"))
                 .alias(ids_col),
                 F.max(F.col("truncated").cast("int")).cast("boolean")
                  .alias("truncated"),
                 F.count(F.lit(1)).alias("n_docs"))
            .withColumn("n_tokens", F.size(ids_col))
            .select("seq_id", ids_col, "n_tokens", "n_docs",
                    "truncated"))
