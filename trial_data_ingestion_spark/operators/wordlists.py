"""Word-list content filtering (the C4 recipe): flag documents whose
TEXT contains blocked-list words — C4 drops any page with a hit from
the published "List of Dirty, Naughty, Obscene..." list; later
pipelines keep a rate threshold instead (one incidental hit in a long
medical document is not a porn page).

Spark-first shape: the word list compiles into ONE case-insensitive
word-boundary alternation evaluated by ``regexp_count`` inside
whole-stage codegen — no Python, no shuffle, a single narrow
projection however long the corpus.  Word lists are a few thousand
entries; the compiled regex is a literal in the plan (for lists so
large the plan string itself would bloat, pre-filter with a broadcast
token join instead — that variant is deliberately not built until a
real list needs it).

This is the CONTENT sibling of ``url_filter`` (same scoring idea on
the URL string) and complements ``gopher_rules`` (structural quality)
and the trained classifiers (topical quality): word-list filtering is
the only one of the three that encodes an explicit editorial policy.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: document-safe representatives of the published blocklists
DEFAULT_BLOCKED_WORDS = (
    "porn", "xxx", "hardcore", "erotic", "viagra", "casino",
    "jackpot", "bukkake",
)


def blocked_word_hits(text: Column, words=DEFAULT_BLOCKED_WORDS) -> Column:
    """Count of blocked-word occurrences in ``text`` (case-insensitive,
    word-boundary-anchored so 'Essex' or 'classic' never match a
    blocked 'sex'/'ass' entry — the famous C4 false-positive class)."""
    rx = r"(?i)\b(?:" + "|".join(re.escape(w) for w in words) + r")\b"
    return F.regexp_count(text, F.lit(rx))


def flag_blocked_content(df: DataFrame,
                         words=DEFAULT_BLOCKED_WORDS,
                         text_col: str = "text",
                         max_hits: int = 0,
                         max_rate: float | None = None) -> DataFrame:
    """Adds ``blocked_hits``, ``blocked_rate`` (hits per whitespace
    token) and boolean ``content_keep``.  ``max_hits=0`` is the strict
    C4 policy (any hit drops); give ``max_rate`` (e.g. 0.01) to switch
    to rate-based flagging where ``max_hits`` becomes a floor below
    which short docs always pass.  Rows are FLAGGED, never dropped —
    chain ``.where("content_keep")`` to materialize."""
    hits = blocked_word_hits(F.col(text_col), words)
    n_tokens = F.size(F.split(F.trim(text_col), r"\s+", -1))
    out = (df.withColumn("blocked_hits", hits.cast("long"))
             .withColumn(
                 "blocked_rate",
                 F.when(n_tokens > 0,
                        F.round(F.col("blocked_hits") / n_tokens, 6))
                  .otherwise(F.lit(0.0))))
    if max_rate is None:
        keep = F.col("blocked_hits") <= F.lit(int(max_hits))
    else:
        keep = ((F.col("blocked_hits") <= F.lit(int(max_hits)))
                | (F.col("blocked_rate") <= F.lit(float(max_rate))))
    return out.withColumn("content_keep", keep)
