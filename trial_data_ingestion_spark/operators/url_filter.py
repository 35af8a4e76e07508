"""URL-level corpus filtering (the RefinedWeb / C4 recipe): domain
blocklists + adult/spam keyword scoring over the URL string itself,
before a byte of page content is fetched or parsed.

Published pipeline step (RefinedWeb §3.1 "URL filtering": a 4.6M-domain
blocklist plus a weighted keyword score on the URL; C4 likewise drops
pages by bad-word lists).  Spark-first shape:

  * **Domain rules** key on :func:`functions.url.registered_domain`
    (a codegen regexp, no Python).  Blocklists are DataFrames — a few
    thousand rows broadcast; the published 4.6M-domain list is still
    only ~100 MB and broadcasts too, but the join degrades gracefully
    to a shuffled hash join if the caller disables broadcast.  List
    inputs are compiled to literal ``isin`` filters (pure pushdown).
  * **Keyword score** is one ``regexp_count`` per URL region —
    matches in the HOST weigh ``host_weight`` (2.0, a porn-site domain
    is a stronger signal than a path fragment), matches in the
    path/query weigh 1.0.  All whole-stage codegen.
  * Rows are FLAGGED (``url_keep`` + ``url_reason``), never dropped —
    the audit-trail convention of the curation tier; chain
    ``.where("url_keep")`` to materialize.

At 100 TB the whole operator is one narrow projection plus at most one
broadcast join: no shuffle of the corpus, no Python.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trial_data_ingestion_spark.functions.url import (
    host_of, registered_domain,
)

#: starter keyword list (extend freely — the published lists are long;
#: these are the document-safe representatives)
DEFAULT_BLOCKED_WORDS = (
    "porn", "xxx", "sex", "casino", "viagra", "escort", "gambling",
    "webcam", "torrent", "warez",
)


def _word_regex(words) -> str:
    return "(?i)(?:" + "|".join(re.escape(w) for w in words) + ")"


def filter_urls(df: DataFrame,
                url_col: str = "url",
                blocked_domains: DataFrame | list | tuple | None = None,
                allowed_domains: DataFrame | list | tuple | None = None,
                blocked_words=DEFAULT_BLOCKED_WORDS,
                word_threshold: float = 2.0,
                host_weight: float = 2.0,
                keep_missing: bool = True) -> DataFrame:
    """Flag rows by URL: adds ``url_domain`` (registrable domain),
    ``url_word_score`` (weighted keyword hits), ``url_keep`` and
    ``url_reason`` ('allowed' | 'blocked_domain' | 'blocked_words' |
    'no_url' | 'ok').  An allowlisted domain overrides both block
    rules (the RefinedWeb curated-exceptions list: e.g. a medical site
    whose name trips the keyword score).

    A NULL URL is its own visible category (``url_reason='no_url'``),
    never an implicit pass: every block predicate is NULL on a NULL
    URL, so without the explicit branch such rows would fall through
    to 'ok' with no audit trace.  ``keep_missing`` sets the policy —
    True (default) keeps them (metadata loss shouldn't silently drop
    content), False drops them (strict provenance pipelines)."""
    dom = registered_domain(F.col(url_col))
    out = df.withColumn("url_domain", dom)

    if blocked_words:
        rx = _word_regex(blocked_words)
        host = host_of(F.col(url_col))
        tail = F.regexp_replace(
            F.col(url_col), r"^(?:[A-Za-z][A-Za-z0-9+.-]*://)?[^/?#]*", "")
        score = (F.regexp_count(host, F.lit(rx)) * F.lit(host_weight)
                 + F.regexp_count(tail, F.lit(rx)))
        out = out.withColumn("url_word_score", score.cast("double"))
    else:
        out = out.withColumn("url_word_score", F.lit(0.0))

    def _flag(source, flag_name):
        nonlocal out
        if source is None:
            out = out.withColumn(flag_name, F.lit(False))
        elif isinstance(source, DataFrame):
            # contract: the FIRST column holds registrable domains
            cols = source.columns
            marked = F.broadcast(
                source.select(F.col(cols[0]).alias("url_domain"))
                .distinct().withColumn(flag_name, F.lit(True)))
            out = out.join(marked, "url_domain", "left") \
                     .withColumn(flag_name,
                                 F.coalesce(F.col(flag_name), F.lit(False)))
        else:
            out = out.withColumn(
                flag_name, F.col("url_domain").isin(*[str(d) for d in source]))

    _flag(allowed_domains, "__allowed")
    _flag(blocked_domains, "__blocked")

    keep_reasons = ["allowed", "ok"] + (["no_url"] if keep_missing
                                        else [])
    reason = (F.when(F.col(url_col).isNull(), F.lit("no_url"))
               .when(F.col("__allowed"), F.lit("allowed"))
               .when(F.col("__blocked"), F.lit("blocked_domain"))
               .when(F.col("url_word_score") >= F.lit(word_threshold),
                     F.lit("blocked_words"))
               .otherwise(F.lit("ok")))
    return (out.withColumn("url_reason", reason)
               .withColumn("url_keep",
                           F.col("url_reason").isin(*keep_reasons))
               .drop("__allowed", "__blocked"))
