"""Content-defined chunking: reconstruction, size bounds, the CDC
edit-resistance property, unicode safety, and chunk-level dedup via
content-addressed ids."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
         "golf", "hotel", "india", "juliet", "kilo", "lima", "mike",
         "november", "oscar", "papa", "quebec", "romeo", "sierra",
         "tango", "uniform", "victor", "whiskey", "xray", "yankee"]


def _text(n_words=3000, seed=5):
    rng = random.Random(seed)
    return " ".join(rng.choice(WORDS) for _ in range(n_words))


def test_cdc_reconstruction_and_bounds():
    from trial_data_ingestion_spark.operators.chunking import (
        split_content_defined,
    )
    t = _text()
    chunks = split_content_defined(t, target_size=256)
    assert "".join(chunks) == t
    assert len(chunks) > 3
    for c in chunks[:-1]:
        b = len(c.encode("utf-8"))
        assert 64 <= b <= 1024          # default min=target/4, max=4x


def test_cdc_edit_resistance():
    """THE content-defined property: an insertion near the front must
    leave the great majority of later chunks bit-identical (fixed
    windows shift every boundary after the edit)."""
    from trial_data_ingestion_spark.operators.chunking import (
        split_content_defined,
    )
    t = _text()
    orig = split_content_defined(t, target_size=256)
    edited = split_content_defined("INSERTED-PREFIX " + t,
                                   target_size=256)
    k = 0
    while (k < min(len(orig), len(edited))
           and orig[-1 - k] == edited[-1 - k]):
        k += 1
    assert k >= len(orig) - 3, (k, len(orig))
    # and determinism: same input, same boundaries
    assert orig == split_content_defined(t, target_size=256)


def test_cdc_multibyte_never_tears():
    from trial_data_ingestion_spark.operators.chunking import (
        split_content_defined,
    )
    t = ("héllo wörld émoji \U0001F600 ünïcode " * 200)
    chunks = split_content_defined(t, target_size=128)
    assert "".join(chunks) == t          # every chunk decoded cleanly


def test_cdc_forced_cut_never_exceeds_max_size():
    """A max_size-forced cut snaps BACKWARD to the previous character
    start, so the documented clamp holds even when the byte limit
    lands mid-character (4-byte emoji stream never fires the hash for
    small max_size)."""
    from trial_data_ingestion_spark.operators.chunking import (
        split_content_defined,
    )
    t = "\U0001F600" * 500                # 2000 bytes of 4-byte chars
    for max_size in (9, 10, 11, 33):      # deliberately non-multiples
        chunks = split_content_defined(t, target_size=8,
                                       min_size=1, max_size=max_size)
        assert "".join(chunks) == t
        assert all(len(c.encode("utf-8")) <= max_size for c in chunks)


def test_cdc_repetitive_text_hits_max_size():
    """Pathologically periodic text may never fire the hash; the
    max-size clamp must bound chunks instead of spinning."""
    from trial_data_ingestion_spark.operators.chunking import (
        split_content_defined,
    )
    t = "ab" * 5000
    chunks = split_content_defined(t, target_size=128)
    assert "".join(chunks) == t
    assert all(len(c.encode()) <= 512 for c in chunks)


def test_cdc_spark_kernel_and_chunk_level_dedup(spark):
    """Two documents sharing a long middle section must produce
    colliding content-addressed chunk_ids for the shared interior —
    the edit-resistant chunk-dedup story end to end."""
    from trial_data_ingestion_spark.operators.chunking import (
        chunk_content_defined,
    )
    shared = _text(n_words=2000, seed=9)
    inputs = {"a": "unique head A. " + shared,
              "b": "a completely different beginning here! " + shared}
    df = spark.createDataFrame(list(inputs.items()),
                               "doc_id string, text string")
    out = chunk_content_defined(df, "text", "doc_id", target_size=256)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d in by_doc.values():
        d.sort(key=lambda r: r["chunk_index"])
    # reconstruction inside Spark
    for doc, chunks in by_doc.items():
        assert "".join(r["text"] for r in chunks) == inputs[doc]
    ids_a = {r["chunk_id"] for r in by_doc["a"]}
    ids_b = {r["chunk_id"] for r in by_doc["b"]}
    # most chunks collide across the two docs despite different heads
    assert len(ids_a & ids_b) >= max(len(ids_a), len(ids_b)) - 3
    # distinct-chunk storage is ~half the naive chunk count
    n_distinct = out.select("chunk_id").distinct().count()
    assert n_distinct <= out.count() - len(ids_a & ids_b) + 1
