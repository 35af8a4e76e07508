"""Text-analysis operators (north-star: language-ID, quality scoring,
token counting, document fingerprinting).

All operators are native Column expressions — the hot path of a
100 TB text pipeline must stay inside whole-stage codegen.  Regex
character classes are written portably (explicit classes, no
Java-only escapes) so the DuckDB oracle can evaluate the same logic.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language identifier.  Chosen to be disjoint enough on the synthetic
# corpus; a production deployment would swap in real profiles.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "por"],
    "de": ["der", "die", "und", "das", "nicht", "ist", "ein", "mit"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour"],
}

PUNCT_CLASS = r"[.,;:!?'\"()\[\]{}-]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization of trimmed text; empty text -> empty
    array (split of '' yields [''], which we filter)."""
    return F.filter(
        F.split(F.trim(text), r"\s+"),
        lambda t: t != "",
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


# GPT-2-style pre-tokenizer shape (public pattern family: common
# English contractions, letter runs, digit runs, punctuation runs,
# whitespace runs) without lookarounds so Java regex and DuckDB RE2
# count identically.  Approximates subword token counts ~2x closer to
# a real BPE than whitespace words do — good enough for corpus sizing
# and per-doc budget filters without shipping a tokenizer to the hot
# path (the exact counter is the C4 token chunker's mapInPandas
# kernel, operators/chunking.py).
BPE_ISH_RE = (r"'(?:s|t|re|ve|m|ll|d)|"
              r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+")


def subword_count(text: Column) -> Column:
    """Approximate subword token count: ``BPE_ISH_RE`` matches that
    are not pure whitespace, entirely native (regexp_extract_all +
    higher-order filter, no UDF)."""
    toks = F.regexp_extract_all(text, F.lit(f"({BPE_ISH_RE})"), 1)
    return F.size(F.filter(toks, lambda t: F.trim(t) != ""))


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars (0 for empty text)."""
    punct = F.length(text) - F.length(
        F.regexp_replace(text, PUNCT_CLASS, ""))
    return F.when(F.length(text) > 0,
                  punct.cast("double") / F.length(text)).otherwise(F.lit(0.0))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    sw = STOPWORDS[lang]
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(*sw)))
    return F.when(F.size(toks) > 0,
                  hits.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def avg_token_length(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0),
                        lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0,
                  total.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0, 1]: rewards reasonable
    length, English stopword presence, and sane punctuation density.
    Deliberately simple and fully declarative."""
    len_score = F.least(F.length(text).cast("double") / F.lit(500.0),
                        F.lit(1.0))
    sw_score = F.least(stopword_ratio(text, "en") * F.lit(4.0), F.lit(1.0))
    punct_penalty = F.greatest(
        F.lit(0.0), F.lit(1.0) - punct_ratio(text) * F.lit(5.0))
    return (len_score + sw_score + punct_penalty) / F.lit(3.0)


def detect_language(text: Column) -> Column:
    """Stopword-vote language ID over {en, es, de, fr}; ties and
    no-hits -> 'und'.  One pass over the token array per language —
    four filtered size() expressions, all codegen'd."""
    toks = tokens(F.lower(text))

    def hits(sw):
        # NB: the lambda must be unary — pyspark dispatches on lambda
        # arity, and a second (default) parameter would receive the
        # array-index Column instead of the intended closure value.
        return F.size(F.filter(toks, lambda t: t.isin(*sw)))

    scores = [(lang, hits(sw)) for lang, sw in STOPWORDS.items()]
    best = F.greatest(*[s for _, s in scores])
    result = F.lit("und")
    # first language reaching the max wins (deterministic order)
    for lang, s in reversed(scores):
        result = F.when((best > 0) & (s == best), F.lit(lang)).otherwise(result)
    return result


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized,
    lowercased text.  Stable across engines; used for exact-content
    dedup and incremental-resume keys."""
    return F.md5(F.lower(F.trim(F.regexp_replace(text, r"\s+", " "))))


# ---------------------------------------------------------------------------
# PII scrubbing + repetition quality signals (training-data hygiene)
# ---------------------------------------------------------------------------

# Portable patterns (no lookarounds/backrefs, so Java regex and
# DuckDB's RE2 agree — the parity test in test_textstats_edges pins
# it).  Deliberately conservative: training-data scrubbing prefers
# over-redaction of digit runs to leaking a real number.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b")
PHONE_RE = (r"(?:\+?[0-9]{1,3}[-. ]?)?\(?[0-9]{3}\)?[-. ]?"
            r"[0-9]{3}[-. ]?[0-9]{4}\b")


def redact_pii(text: Column) -> Column:
    """Replace emails, IPv4 addresses and phone-shaped digit runs
    with typed placeholders — the standard scrub pass before text
    enters a training corpus.  Order matters: emails first (their
    local parts contain digit runs), then IPs (dotted quads would
    otherwise half-match the phone pattern), then phones."""
    out = F.regexp_replace(text, EMAIL_RE, "[EMAIL]")
    out = F.regexp_replace(out, IPV4_RE, "[IP]")
    return F.regexp_replace(out, PHONE_RE, "[PHONE]")


def _lines(text: Column) -> Column:
    return F.filter(
        F.transform(F.split(text, r"\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != "")


def repeated_line_ratio(text: Column) -> Column:
    """Fraction of non-empty lines that duplicate an earlier line
    (Gopher-style repetition signal: boilerplate, nav bars, and
    degenerate generations repeat lines).  0 for empty docs."""
    lines = _lines(text)
    n = F.size(lines)
    return F.when(
        n > 0,
        (n - F.size(F.array_distinct(lines))).cast("double") / n
    ).otherwise(F.lit(0.0))


def top_ngram_ratio(text: Column, n: int = 2) -> Column:
    """Fraction of a document's token n-grams taken by the single
    most frequent one (Gopher's "fraction in most common n-gram").
    Docs with fewer than ``n`` tokens score 0.

    Native-expression shape: one pass builds the gram array, then a
    distinct-gram x gram-array count — O(g * distinct g) per doc,
    entirely inside codegen; no shuffle, no UDF."""
    toks = tokens(F.lower(text))
    n_grams = F.size(toks) - (n - 1)
    # sequence(1, 0) would yield a DESCENDING [1, 0]: clamp the stop
    # to 1 and let the n_grams > 0 guard zero out short docs
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    counts = F.transform(
        F.array_distinct(grams),
        lambda g: F.size(F.filter(grams, lambda x: x == g)))
    return F.when(
        n_grams > 0,
        F.array_max(counts).cast("double") / n_grams
    ).otherwise(F.lit(0.0))
