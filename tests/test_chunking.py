"""Chunker golden + property tests (SURVEY.md §5 items 2-3,
FIXTURES.md §6 edge cases)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from trial_data_ingestion_spark.operators.chunking import (
    split_by_tokens, split_text_windows,
)

WORDS = st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=12),
                 min_size=0, max_size=120).map(" ".join)


def test_short_text_single_chunk():
    assert split_text_windows("hello world", 1200, 120) == ["hello world"]


def test_empty_and_whitespace():
    assert split_text_windows("", 100, 10) == []
    assert split_text_windows("   \n\t ", 100, 10) == []
    assert split_text_windows(None, 100, 10) == []


def test_chunk_size_zero_means_no_split():
    assert split_text_windows("a b  c", 0, 10) == ["a b c"]


def test_whitespace_bump_extends_to_boundary():
    # window of 10 lands mid-word; end extends to the next whitespace
    text = "aaaa bbbb cccccccccc dddd"
    chunks = split_text_windows(text, 10, 0)
    # first window 'aaaa bbbb ' (10 chars) ends exactly at whitespace;
    # no mid-word cut anywhere
    for c in chunks:
        assert not c.startswith(" ") and not c.endswith(" ")
    joined = " ".join(chunks)
    for w in ["aaaa", "bbbb", "cccccccccc", "dddd"]:
        assert w in joined


def test_no_bump_beyond_40_chars():
    # a 60-char unbroken word cannot be rescued: mid-word cut happens
    text = "x" * 60 + " tail"
    chunks = split_text_windows(text, 20, 0)
    assert chunks[0] == "x" * 20


def test_overlap_clamped():
    # overlap >= chunk_size is clamped to size-1 (chunkers.py:62)
    chunks = split_text_windows("abcdefghij" * 5, 10, 99)
    assert len(chunks) > 1


@settings(max_examples=200, deadline=None)
@given(WORDS, st.integers(5, 80), st.integers(0, 80))
def test_windows_cover_text_and_respect_bump_bound(text, size, overlap):
    chunks = split_text_windows(text, size, overlap)
    norm = " ".join(text.split())
    if not norm:
        assert chunks == []
        return
    # every chunk within size + 40 (bump bound), never empty
    for c in chunks:
        assert c
        assert len(c) <= size + 40
    # chunks reassemble to cover the full normalized text
    assert chunks[0].startswith(norm[:min(len(norm), 1)])
    assert norm.endswith(chunks[-1][-min(len(chunks[-1]), 10):])


@settings(max_examples=100, deadline=None)
@given(WORDS, st.integers(1, 50), st.integers(0, 20))
def test_token_windows_bounds(text, max_tokens, overlap):
    overlap = min(overlap, max_tokens - 1)
    chunks = split_by_tokens(text, max_tokens, overlap)
    toks = text.split()
    if not toks:
        assert chunks == []
        return
    for c in chunks:
        assert len(c.split()) <= max_tokens
    # all tokens covered in order
    assert " ".join(toks) == " ".join(
        " ".join(c.split()[(overlap if i else 0):])
        for i, c in enumerate(chunks)) or len(chunks) == 1


def test_by_section_running_index(spark):
    rows = [("d1", [{"section_path": "Intro", "text": "alpha " * 50},
                    {"section_path": "Methods", "text": "beta " * 50}])]
    df = spark.createDataFrame(
        rows, "doc_id string, sections array<struct<section_path:string,"
              "text:string>>")
    from trial_data_ingestion_spark.operators.chunking import chunk_by_section
    out = chunk_by_section(df, "sections", "doc_id", 100, 10).collect()
    idxs = sorted(r["chunk_index"] for r in out)
    assert idxs == list(range(len(out)))  # running index across sections
    intro_max = max(r["chunk_index"] for r in out
                    if r["section_path"] == "Intro")
    methods_min = min(r["chunk_index"] for r in out
                      if r["section_path"] == "Methods")
    assert intro_max < methods_min  # section order preserved
    assert all(r["chunk_id"] == f"d1::c{r['chunk_index']}" for r in out)


def test_chunk_by_tokens_spark(spark):
    df = spark.createDataFrame(
        [(7, "one two three four five six seven eight nine ten")],
        "doc_id long, text string")
    from trial_data_ingestion_spark.operators.chunking import chunk_by_tokens
    out = chunk_by_tokens(df, "text", "doc_id", max_tokens=4,
                          overlap=1).collect()
    assert [r["chunk_id"] for r in out] == [
        "7::chunk_0", "7::chunk_1", "7::chunk_2"]
    assert [r["n_tokens"] for r in out] == [4, 4, 4]
    assert out[0]["text"] == "one two three four"
    assert out[1]["text"] == "four five six seven"  # 1-token overlap


def test_token_overlap_ge_max_tokens_terminates():
    # overlap >= max_tokens must clamp, not spin forever (the start
    # index would never advance); coverage of all tokens is preserved
    text = "one two three four five six seven eight nine ten"
    out = split_by_tokens(text, max_tokens=3, overlap=3)
    assert out and out[0] == "one two three"
    joined = " ".join(out)
    for w in text.split():
        assert w in joined
    out2 = split_by_tokens(text, max_tokens=3, overlap=99)
    assert out == out2  # any over-clamp value behaves like max-1


def test_token_nonpositive_max_tokens_raises():
    import pytest
    with pytest.raises(ValueError):
        split_by_tokens("some text", max_tokens=0, overlap=0)
