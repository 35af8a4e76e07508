"""Instruction/chat dataset operators: multi-turn conversations as a
first-class column type.

Post-training corpora (instruction tuning, chat SFT) are arrays of
role-tagged turns, not flat documents.  The published hygiene steps —
flatten with a chat template, validate turn structure, dedup on
content rather than formatting, fit a context budget, emit loss-mask
spans for assistant-only training — are all array-shape problems, and
Spark's higher-order functions (``transform`` / ``filter`` /
``aggregate`` / ``zip_with``) express every one of them as ONE narrow
codegen projection: no explode, no per-conversation shuffle, no
Python.  A conversation is a single row end to end.

Schema contract: ``msgs_col`` is ``array<struct<role:string,
content:string>>`` (extra struct fields pass through untouched).

The flat text these produce feeds every document-tier operator
unchanged — dedup, MinHash, decontam, packing all run on the
flattened column, which is the point: the chat tier is a front-end to
the same engine, not a parallel one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trial_data_ingestion_spark.operators.textstats import token_count


def flatten_conversation(msgs: Column,
                         turn_template: str = "<|{role}|>\n{content}",
                         sep: str = "\n") -> Column:
    """Render a conversation to one string with a chat template
    (``{role}``/``{content}`` placeholders, turns joined by
    ``sep``)."""
    pre, _, rest = turn_template.partition("{role}")
    mid, _, post = rest.partition("{content}")
    return F.array_join(
        F.transform(msgs, lambda m: F.concat(
            F.lit(pre), m["role"], F.lit(mid),
            F.coalesce(m["content"], F.lit("")), F.lit(post))),
        sep)


#: turn separator for the fingerprint hash — a control byte, written
#: as a VISIBLE escape (a raw 0x01 in source renders as an empty
#: string in diffs and editors, and normalization strips control
#: characters below, so it genuinely cannot appear in the image)
TURN_SEP = "\x01"

#: control characters that survive the \s+ collapse (whitespace
#: controls are already folded to a space by then)
_CTRL_RE = r"[\x00-\x1f\x7f]"


def conversation_fingerprint(msgs: Column) -> Column:
    """Content-stable dedup key: md5 over normalized turns
    (lowercased, whitespace collapsed, control characters stripped)
    joined with :data:`TURN_SEP` — which cannot appear in the
    normalization image BECAUSE the image is control-free, making the
    turns -> string encoding injective (a 0x01 planted inside a turn's
    content cannot forge a boundary).  Two conversations that differ
    only in formatting/casing collide, which is what chat dedup wants
    (the same exchange re-exported by two tools differs exactly that
    way)."""
    def _norm(c: Column) -> Column:
        collapsed = F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")
        return F.regexp_replace(collapsed, _CTRL_RE, "")

    norm = F.transform(msgs, lambda m: F.concat_ws(
        ":", _norm(m["role"]), _norm(m["content"])))
    return F.md5(F.array_join(norm, TURN_SEP))


def redact_conversation_pii(msgs: Column) -> Column:
    """Scrub emails / IPv4s / phone-shaped digit runs from every
    turn's content (typed placeholders via
    :func:`textstats.redact_pii`) — the chat-tier twin of the
    document scrub pass, applied BEFORE flattening so the
    placeholders land in every downstream rendering and span.
    ``withField`` rewrites only ``content``: roles and any extra turn
    fields (weights, names, tool ids) pass through untouched, and
    NULL content stays NULL (a missing turn body is a
    ``validate_turns`` defect, not an empty redaction)."""
    from trial_data_ingestion_spark.operators.textstats import redact_pii

    return F.transform(
        msgs, lambda m: m.withField("content", redact_pii(m["content"])))


def validate_turns(msgs: Column,
                   roles: tuple = ("system", "user", "assistant"),
                   require_alternation: bool = True) -> Column:
    """First structural defect as a string, or NULL when valid:
    'empty' (no turns), 'unknown_role', 'empty_content',
    'leading_assistant' (conversation opens with the model),
    'consecutive_same_role' (user/assistant must alternate),
    'system_not_first'.  One pass of array predicates."""
    role_arr = F.transform(msgs, lambda m: F.lower(m["role"]))
    ua = F.filter(role_arr, lambda r: r != "system")
    bad_neighbor = F.exists(
        F.zip_with(ua, F.slice(ua, 2, F.greatest(
            F.size(ua) - 1, F.lit(0))),
            lambda a, b: a == b),
        lambda x: x)
    return (F.when(F.size(msgs) == 0, "empty")
             .when(F.exists(role_arr,
                            lambda r: ~r.isin(*roles)), "unknown_role")
             .when(F.exists(msgs, lambda m:
                            F.length(F.trim(F.coalesce(
                                m["content"], F.lit("")))) == 0),
                   "empty_content")
             .when(F.exists(F.zip_with(
                       role_arr, F.sequence(F.lit(0), F.size(role_arr) - 1),
                       lambda r, i: (r == "system") & (i > 0)),
                   lambda x: x), "system_not_first")
             .when(F.element_at(ua, 1) == "assistant",
                   "leading_assistant")
             .when(F.lit(require_alternation) & bad_neighbor,
                   "consecutive_same_role")
             .otherwise(F.lit(None).cast("string")))


def truncate_to_budget(msgs: Column, max_tokens: int) -> Column:
    """Longest prefix of turns whose summed whitespace-token count
    fits ``max_tokens``: a prefix-sum via ``aggregate`` (running
    total + kept count), then one ``slice`` — turns are never split,
    matching SFT convention (a cut-off reply teaches the model to
    truncate).  NULL content counts as 0 tokens (same coalesce
    convention as :func:`flatten_conversation`) — an unguarded NULL
    would make the running ``(tot + c) > max_tokens`` comparison NULL
    and silently disable the budget for every later turn."""
    counted = F.transform(
        msgs, lambda m: F.coalesce(token_count(m["content"]),
                                   F.lit(0)))
    kept = F.aggregate(
        counted,
        F.struct(F.lit(0).cast("long").alias("tot"),
                 F.lit(0).alias("n"),
                 F.lit(False).alias("stop")),
        lambda acc, c: F.when(
            acc["stop"] | ((acc["tot"] + c) > max_tokens),
            F.struct(acc["tot"].alias("tot"), acc["n"].alias("n"),
                     F.lit(True).alias("stop")))
         .otherwise(
            F.struct((acc["tot"] + c).alias("tot"),
                     (acc["n"] + 1).alias("n"),
                     F.lit(False).alias("stop"))),
        lambda acc: acc["n"])
    return F.slice(msgs, 1, kept)


def assistant_spans(msgs: Column,
                    turn_template: str = "<|{role}|>\n{content}",
                    sep: str = "\n") -> Column:
    """Character [start, end) spans of each ASSISTANT turn inside
    :func:`flatten_conversation`'s rendering — the loss-mask contract
    for assistant-only SFT (tokenizers consuming the flat text remap
    char offsets to token offsets).  Computed by the same template
    arithmetic as the renderer, so the two cannot drift: a prefix-sum
    of rendered-turn lengths via ``aggregate``, filtered to assistant
    rows.  Returns ``array<struct<start:long, end:long>>``."""
    pre, _, rest = turn_template.partition("{role}")
    mid, _, post = rest.partition("{content}")
    fixed = len(pre) + len(mid) + len(post)
    lens = F.transform(msgs, lambda m: (
        F.length(m["role"]) + F.length(F.coalesce(m["content"], F.lit("")))
        + F.lit(fixed)).cast("long"))
    sep_len = len(sep)
    spans = F.aggregate(
        lens,
        F.struct(F.lit(0).cast("long").alias("off"),
                 F.array().cast(
                     "array<struct<start:bigint,end:bigint>>")
                 .alias("spans")),
        lambda acc, ln: F.struct(
            (acc["off"] + ln + sep_len).alias("off"),
            F.concat(acc["spans"], F.array(F.struct(
                acc["off"].alias("start"),
                (acc["off"] + ln).alias("end")))).alias("spans")),
        lambda acc: acc["spans"])
    tagged = F.filter(
        F.zip_with(spans,
                   F.transform(msgs, lambda m: F.lower(m["role"])),
                   lambda s, r: F.struct(
                       s["start"].alias("start"), s["end"].alias("end"),
                       r.alias("__role"))),
        lambda x: x["__role"] == "assistant")
    return F.transform(tagged, lambda x: F.struct(
        x["start"].alias("start"), x["end"].alias("end")))


def dedup_conversations(df: DataFrame, msgs_col: str = "messages",
                        order_col: str = "conv_id") -> DataFrame:
    """Keep one conversation per content fingerprint (lowest
    ``order_col`` wins — the deterministic keep-first convention of
    ``dedup.dedup_exact``, reused verbatim)."""
    from trial_data_ingestion_spark.operators.dedup import dedup_exact
    out = df.withColumn("conv_fingerprint",
                        conversation_fingerprint(F.col(msgs_col)))
    return dedup_exact(out, ["conv_fingerprint"], order_col=order_col)
