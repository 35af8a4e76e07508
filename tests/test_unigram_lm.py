"""Unigram-LM tokenizer: morpheme discovery on a constructed corpus,
EM likelihood monotonicity, Viterbi round-trip + unseen-char
fallback, Arrow kernel parity with the driver reference, save/load,
determinism, and fewer-tokens-than-chars compression on real text."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _freqs(spark, pairs):
    return spark.createDataFrame(pairs, "word string, cnt long")


def test_unigram_discovers_morphemes(spark):
    from trial_data_ingestion_spark.operators.unigram_lm import (
        train_unigram,
        viterbi_segment,
    )
    pairs = [("unhappy", 50), ("unhappiness", 40), ("happiness", 60),
             ("happy", 80), ("unkind", 30), ("kindness", 45)]
    m = train_unigram(_freqs(spark, pairs), vocab_size=20,
                      max_piece_len=6)
    logp = m.logprobs
    segs = {w: viterbi_segment(w, logp, m.max_piece_len)
            for w, _ in pairs}
    # every segmentation round-trips
    for w, s in segs.items():
        assert "".join(s) == w
    # shared morphemes compress: multi-char pieces dominate
    assert sum(len(s) for s in segs.values()) < \
        sum(len(w) for w, _ in pairs) * 0.6
    # the vocabulary fits the budget and keeps all chars
    assert len(logp) <= 20 + len({c for w, _ in pairs for c in w})


def test_unigram_em_monotone_likelihood(spark):
    from trial_data_ingestion_spark.operators.unigram_lm import (
        _em_step,
        train_unigram,
    )
    pairs = [("banana", 30), ("bandana", 20), ("cabana", 25)]
    m = train_unigram(_freqs(spark, pairs), vocab_size=15,
                      max_piece_len=4, em_iters=1)
    # run extra EM steps at FIXED vocab: ll must never decrease
    logp = m.logprobs
    words = pairs
    lls = []
    for _ in range(4):
        logp, ll = _em_step(words, logp, m.max_piece_len)
        lls.append(ll)
    assert all(b >= a - 1e-9 for a, b in zip(lls, lls[1:])), lls


def test_viterbi_unseen_chars_round_trip(spark):
    from trial_data_ingestion_spark.operators.unigram_lm import (
        train_unigram,
        viterbi_segment,
    )
    m = train_unigram(_freqs(spark, [("abc", 10)]), vocab_size=8,
                      max_piece_len=3)
    s = viterbi_segment("xyzabc", m.logprobs, m.max_piece_len)
    assert "".join(s) == "xyzabc"
    assert viterbi_segment("", m.logprobs, m.max_piece_len) == []


def test_tokenize_kernel_matches_driver_reference(spark):
    from trial_data_ingestion_spark.operators.unigram_lm import (
        tokenize_unigram,
        train_unigram,
        viterbi_segment,
        word_frequencies,
    )
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").limit(50))
    m = train_unigram(word_frequencies(docs), vocab_size=200,
                      max_piece_len=6)
    out = {r["doc_id"]: (list(r["unigram_tokens"]),
                         r["unigram_tokens_count"])
           for r in tokenize_unigram(docs, m).collect()}
    logp = m.logprobs
    for r in docs.collect():
        want = []
        for w in (r["text"] or "").lower().split():
            want.extend(viterbi_segment(w, logp, m.max_piece_len))
        assert out[r["doc_id"]] == (want, len(want))
    # subword compression: fewer tokens than characters, more than
    # whitespace words
    n_words = sum(len((r["text"] or "").split())
                  for r in docs.collect())
    n_tok = sum(c for _, c in out.values())
    assert n_tok >= n_words
    assert n_tok < sum(len((r["text"] or "")) for r in docs.collect())


def test_unigram_save_load_round_trip(spark, tmp_path):
    from trial_data_ingestion_spark.operators.unigram_lm import (
        load_unigram,
        save_unigram,
        train_unigram,
        viterbi_segment,
    )
    m = train_unigram(_freqs(spark, [("spark", 10), ("sparkle", 5)]),
                      vocab_size=12, max_piece_len=5)
    save_unigram(m, spark, str(tmp_path / "uni"))
    m2 = load_unigram(spark, str(tmp_path / "uni"))
    assert m2.pieces == m.pieces
    assert m2.max_piece_len == m.max_piece_len
    assert viterbi_segment("sparkle", m2.logprobs, 5) == \
        viterbi_segment("sparkle", m.logprobs, 5)


def test_unigram_deterministic(spark):
    from trial_data_ingestion_spark.operators.unigram_lm import (
        train_unigram,
        word_frequencies,
    )
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("text").limit(80))
    a = train_unigram(word_frequencies(docs), vocab_size=150)
    b = train_unigram(word_frequencies(docs), vocab_size=150)
    assert a.pieces == b.pieces
