"""Instruction/chat tier: template flattening, structural validation,
content-stable dedup, context-budget truncation, loss-mask spans —
all one narrow codegen projection per operator."""

from __future__ import annotations

from pyspark.sql import functions as F

SCHEMA = ("conv_id long, "
          "messages array<struct<role:string, content:string>>")


def _conv(*turns):
    return [{"role": r, "content": c} for r, c in turns]


def test_flatten_and_spans_agree(spark):
    """assistant_spans' offsets must index the exact substrings of
    flatten_conversation's rendering — template arithmetic checked
    against python slicing on every row."""
    from trial_data_ingestion_spark.operators.conversations import (
        assistant_spans, flatten_conversation,
    )
    rows = [
        (0, _conv(("system", "be helpful"), ("user", "hi there"),
                  ("assistant", "hello!"), ("user", "thanks"),
                  ("assistant", "any time"))),
        (1, _conv(("user", "solo question"),
                  ("assistant", "solo answer"))),
        (2, _conv(("user", "unanswered"))),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = df.select(
        "conv_id",
        flatten_conversation(F.col("messages")).alias("text"),
        assistant_spans(F.col("messages")).alias("spans")).collect()
    for r in out:
        convs = dict((c, m) for c, m in rows)[r["conv_id"]]
        want = [m["content"] for m in convs if m["role"] == "assistant"]
        got = [r["text"][s["start"]:s["end"]] for s in r["spans"]]
        # each span covers the whole rendered turn; its tail is the content
        assert [g.split("\n", 1)[1] for g in got] == want, (got, want)
        assert all(g.startswith("<|assistant|>") for g in got)
    assert out[2]["conv_id"] != 2 or True
    by_id = {r["conv_id"]: r for r in out}
    assert by_id[2]["spans"] == []


def test_flatten_custom_template(spark):
    from trial_data_ingestion_spark.operators.conversations import (
        flatten_conversation,
    )
    df = spark.createDataFrame(
        [(0, _conv(("user", "a"), ("assistant", "b")))], SCHEMA)
    got = df.select(flatten_conversation(
        F.col("messages"), "### {role}: {content}",
        sep="\n\n").alias("t")).collect()[0]["t"]
    assert got == "### user: a\n\n### assistant: b"


def test_redact_conversation_pii(spark):
    from trial_data_ingestion_spark.operators.conversations import (
        flatten_conversation, redact_conversation_pii,
    )
    rows = [(0, _conv(
        ("user", "mail me at a.b+1@corp.io or call 415-555-1234"),
        ("assistant", "sent to 10.0.0.1 just now"),
        ("user", None)))]
    df = spark.createDataFrame(rows, SCHEMA)
    out = df.select(
        redact_conversation_pii(F.col("messages")).alias("m")).collect()[0]
    msgs = out["m"]
    assert msgs[0]["content"] == "mail me at [EMAIL] or call [PHONE]"
    assert msgs[1]["content"] == "sent to [IP] just now"
    assert msgs[2]["content"] is None          # defect, not redaction
    assert [m["role"] for m in msgs] == ["user", "assistant", "user"]
    # composes before flattening: placeholders land in the rendering
    flat = df.select(flatten_conversation(
        redact_conversation_pii(F.col("messages"))).alias("t")) \
        .collect()[0]["t"]
    assert "[EMAIL]" in flat and "415" not in flat


def test_redact_conversation_pii_preserves_extra_fields(spark):
    from trial_data_ingestion_spark.operators.conversations import (
        redact_conversation_pii,
    )
    schema = ("conv_id long, messages array<struct<role:string, "
              "content:string, weight:double>>")
    df = spark.createDataFrame(
        [(0, [{"role": "user", "content": "ip 10.0.0.1",
               "weight": 0.5}])], schema)
    m = df.select(redact_conversation_pii(F.col("messages"))
                  .alias("m")).collect()[0]["m"][0]
    assert m["content"] == "ip [IP]" and m["weight"] == 0.5


def test_validate_turns_defect_taxonomy(spark):
    from trial_data_ingestion_spark.operators.conversations import (
        validate_turns,
    )
    rows = [
        (0, _conv(("system", "s"), ("user", "u"), ("assistant", "a"))),
        (1, []),
        (2, _conv(("user", "u"), ("robot", "r"))),
        (3, _conv(("user", "u"), ("assistant", "  "))),
        (4, _conv(("assistant", "a"), ("user", "u"))),
        (5, _conv(("user", "u"), ("user", "again"), ("assistant", "a"))),
        (6, _conv(("user", "u"), ("system", "late"), ("assistant", "a"))),
        (7, _conv(("user", "u"), ("assistant", "a"), ("user", "u2"),
                  ("assistant", "a2"))),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    got = {r["conv_id"]: r["defect"] for r in df.select(
        "conv_id",
        validate_turns(F.col("messages")).alias("defect")).collect()}
    assert got[0] is None and got[7] is None
    assert got[1] == "empty"
    assert got[2] == "unknown_role"
    assert got[3] == "empty_content"
    assert got[4] == "leading_assistant"
    assert got[5] == "consecutive_same_role"
    assert got[6] == "system_not_first"


def test_dedup_conversations_content_stable(spark):
    """Formatting/casing-variant re-exports of the same exchange
    collide; genuinely different exchanges survive; lowest id wins."""
    from trial_data_ingestion_spark.operators.conversations import (
        dedup_conversations,
    )
    rows = [
        (10, _conv(("user", "What is Spark?"),
                   ("assistant", "A distributed engine."))),
        (11, _conv(("USER", "what   is spark?"),
                   ("Assistant", "a distributed  engine. "))),
        (12, _conv(("user", "What is Flink?"),
                   ("assistant", "A streaming engine."))),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = dedup_conversations(df)
    ids = sorted(r["conv_id"] for r in out.collect())
    assert ids == [10, 12]


def test_truncate_to_budget(spark):
    from trial_data_ingestion_spark.operators.conversations import (
        truncate_to_budget,
    )
    msgs = _conv(("user", "one two three"),           # 3 tokens
                 ("assistant", "four five"),          # 2
                 ("user", "six seven eight nine"),    # 4
                 ("assistant", "ten"))                # 1
    df = spark.createDataFrame([(0, msgs)], SCHEMA)

    def kept(budget):
        r = df.select(truncate_to_budget(
            F.col("messages"), budget).alias("m")).collect()[0]["m"]
        return len(r)

    assert kept(100) == 4
    assert kept(9) == 3        # 3+2+4 = 9 fits exactly
    assert kept(8) == 2        # third turn would overflow
    assert kept(5) == 2
    assert kept(2) == 0        # even the first turn overflows
    # turns are never split: the kept prefix is a prefix of the input
    r = df.select(truncate_to_budget(
        F.col("messages"), 9).alias("m")).collect()[0]["m"]
    assert [m["content"] for m in r] == [m["content"] for m in msgs[:3]]


def test_truncate_to_budget_null_content_counts_zero(spark):
    """A NULL-content turn must count as 0 tokens, not poison the
    running total into NULL (which would disable the budget for every
    later turn — ADVICE round 5)."""
    from trial_data_ingestion_spark.operators.conversations import (
        truncate_to_budget,
    )
    msgs = [("user", "one two three"),      # 3 tokens
            ("assistant", None),            # NULL -> 0
            ("user", "four five six")]      # 3
    arr = [{"role": r, "content": c} for r, c in msgs]
    df = spark.createDataFrame([(0, arr)], SCHEMA)

    def kept(budget):
        r = df.select(truncate_to_budget(
            F.col("messages"), budget).alias("m")).collect()[0]["m"]
        return len(r)

    assert kept(100) == 3
    assert kept(6) == 3    # 3 + 0 + 3 fits
    assert kept(5) == 2    # the last REAL turn overflows -> cut
    assert kept(3) == 2    # null turn itself is free
    assert kept(2) == 0


def test_fingerprint_separator_cannot_be_forged(spark):
    """The 0x01 turn separator is stripped from content during
    normalization, so planting it inside a turn cannot collide with a
    genuinely different turn split; and the separator constant is a
    visible escape, not a raw byte (ADVICE round 5)."""
    import inspect

    from trial_data_ingestion_spark.operators import conversations
    from trial_data_ingestion_spark.operators.conversations import (
        TURN_SEP, conversation_fingerprint,
    )
    assert TURN_SEP == "\x01"
    src = inspect.getsource(conversations)
    assert "\x01" not in src          # no raw control byte in source

    forged = _conv(("user", "hello\x01assistant:world"))
    two = _conv(("user", "hello"), ("assistant", "world"))
    clean = _conv(("user", "helloassistant:world"))
    df = spark.createDataFrame(
        [(0, forged), (1, two), (2, clean)], SCHEMA)
    fp = {r["conv_id"]: r["fp"] for r in df.select(
        "conv_id",
        conversation_fingerprint(F.col("messages")).alias("fp"))
        .collect()}
    # the forged single turn equals the CLEAN single turn (separator
    # stripped), and differs from the real two-turn conversation
    assert fp[0] == fp[2]
    assert fp[0] != fp[1]


def test_conversation_ops_plan_is_narrow(spark):
    """The whole chat-hygiene chain — flatten + validate + fingerprint
    + truncate — is one projection: no Exchange, no Python."""
    from trial_data_ingestion_spark.operators.conversations import (
        conversation_fingerprint, flatten_conversation,
        truncate_to_budget, validate_turns,
    )
    df = spark.createDataFrame(
        [(0, _conv(("user", "u"), ("assistant", "a")))], SCHEMA)
    out = df.select(
        flatten_conversation(F.col("messages")).alias("text"),
        validate_turns(F.col("messages")).alias("defect"),
        conversation_fingerprint(F.col("messages")).alias("fp"),
        truncate_to_budget(F.col("messages"), 512).alias("m"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan


def test_conversation_ops_run_on_streams(spark, tmp_path):
    """The chat-hygiene chain is stream-safe by construction (pure
    Column expressions): run it as a REAL availableNow file stream
    and assert row-for-row parity with the batch projection."""
    rows = [
        (0, _conv(("user", "what is spark"),
                  ("assistant", "a distributed engine"))),
        (1, _conv(("assistant", "i speak first"), ("user", "bad"))),
        (2, _conv(("user", "what is spark"),
                  ("assistant", "a distributed engine"))),   # dup of 0
        (3, _conv(("user", "tell me more"),
                  ("assistant", "much more"))),
    ]
    src = str(tmp_path / "convs")
    spark.createDataFrame(rows, SCHEMA).write.parquet(src)

    from trial_data_ingestion_spark.operators.conversations import (
        conversation_fingerprint, flatten_conversation, validate_turns,
    )

    def project(df):
        return df.select(
            "conv_id",
            flatten_conversation(F.col("messages")).alias("text"),
            validate_turns(F.col("messages")).alias("defect"),
            conversation_fingerprint(F.col("messages")).alias("fp"))

    stream = (spark.readStream.schema(SCHEMA.replace(", ", ",\n"))
              .parquet(src))
    q = (project(stream).writeStream.format("memory")
         .queryName("conv_stream").outputMode("append")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql(
        "SELECT * FROM conv_stream").collect()))
    want = sorted(map(tuple, project(
        spark.read.parquet(src)).collect()))
    assert got == want and len(got) == 4
    by_id = {r[0]: r for r in got}
    assert by_id[1][2] == "leading_assistant"
    assert by_id[0][3] == by_id[2][3]          # dup fingerprints collide
