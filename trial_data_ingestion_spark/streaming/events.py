"""Structured Streaming operators over the events stream
(SURVEY.md §2.10).

The reference has zero streaming code — its incremental resume (F8,
append-only output + seen-key skip) is a batch approximation of
exactly these primitives.  All built-in: file/readStream source,
watermarks for late data, tumbling/sliding/session windows, streaming
dedup (the streaming analog of P5), and a ``foreachBatch`` upsert
(the streaming analog of the J6/K5 merge).

Scale notes: every aggregation here is keyed-state with watermark
eviction, so state size is bounded by (#keys x window horizon), not
stream length; the foreachBatch upsert inherits the bucketed-merge
cost model of ``sinks.upsert_parquet``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from trial_data_ingestion_spark.schemas import SECTIONS  # noqa: F401

EVENT_SCHEMA = ("event_id long, ts timestamp, user_id long, "
                "event_type string, value double, props string")


def read_event_stream(spark: SparkSession, path: str,
                      schema: str = EVENT_SCHEMA,
                      fmt: str = "parquet",
                      max_files_per_trigger: Optional[int] = None
                      ) -> DataFrame:
    """File-source event stream (the ingest-directory pattern)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def tumbling_counts(events: DataFrame, window: str = "1 hour",
                    watermark: str = "2 hours") -> DataFrame:
    """Tumbling-window per-type aggregate with late-data watermark."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n_events", "total_value"))


def sliding_counts(events: DataFrame, window: str = "1 hour",
                   slide: str = "15 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Sliding-window aggregate (overlapping windows)."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("total_value"))
            .select(F.col("w.start").alias("window_start"),
                    "event_type", "n_events", "total_value"))


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "2 hours") -> DataFrame:
    """Session-window aggregate per user (gap-based sessions) — the
    streaming twin of the batch q22_sessionize query."""
    return (events.withWatermark("ts", watermark)
            .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.sum("value").alias("session_value"))
            .select(F.col("w.start").alias("session_start"),
                    F.col("w.end").alias("session_end"),
                    "user_id", "n_events", "session_value"))


def streaming_dedup(events: DataFrame, keys: list[str],
                    watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup with bounded state — P5/F8's streaming
    analog: a key is remembered until the watermark passes it."""
    return events.withWatermark("ts", watermark).dropDuplicates(keys)


def attribution_join(events: DataFrame, horizon: str = "1 hour",
                     watermark: str = "2 hours") -> DataFrame:
    """Stream-stream interval join: each purchase attributed to the
    same user's view events in the preceding ``horizon``.

    Both sides are the SAME input stream filtered two ways — Spark
    handles this as a true stream-stream join with buffered state on
    both sides.  The watermark plus the time-range predicate bound
    that state: a view can be dropped once the purchase-side watermark
    passes view_ts + horizon, so state is O(events within horizon),
    not stream length.  This is the streaming form of the as-of /
    range join family (q23/q38/q39)."""
    views = (events.where(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"),
                     F.col("ts").alias("view_ts"))
             .withWatermark("view_ts", watermark))
    purchases = (events.where(F.col("event_type") == "purchase")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("ts").alias("buy_ts"),
                         F.col("value").alias("buy_value"))
                 .withWatermark("buy_ts", watermark))
    cond = (
        (F.col("v_user") == F.col("p_user"))
        & (F.col("buy_ts") >= F.col("view_ts"))
        & (F.col("buy_ts") <= F.col("view_ts") + F.expr(
            f"INTERVAL {horizon}"))
    )
    return (views.join(purchases, cond)
            .select(F.col("p_user").alias("user_id"),
                    "view_ts", "buy_ts", "buy_value"))


RUNNING_STATS_SCHEMA = ("user_id long, n_events long, total_value double, "
                        "max_value double")


def user_running_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, sum, max) maintained across micro-batches.

    This is the streaming generalization of the reference's resume
    counters (A1, ``fulltext_enricher.py:234-248``) — state the
    built-in windowed aggregates can't express because it never closes:
    totals accumulate for the life of the stream and each micro-batch
    emits the updated row per key seen in that batch (update-mode
    semantics).

    Scale: state is one 3-double struct per user key, partitioned by
    the groupBy hash — O(#users), independent of stream length; the
    per-batch Arrow transfer carries only the keys present in the
    batch."""
    import pandas as pd  # noqa: F401 (worker-side)
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    def update(key, pdf_iter, state: GroupState):
        n, total, mx = state.get if state.exists else (0, 0.0, None)
        for pdf in pdf_iter:
            vals = pdf["value"].dropna()
            n += len(pdf)
            total += float(vals.sum())
            if len(vals):
                batch_max = float(vals.max())
                mx = batch_max if mx is None else max(mx, batch_max)
        state.update((n, total, mx))
        import pandas as pd
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [total], "max_value": [mx]})

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType="n long, total double, mx double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _validate_ttl(state_ttl_minutes, state_ttl_mode):
    """Shared TTL-knob validation for the stateful triple."""
    if state_ttl_mode not in ("processing", "event"):
        raise ValueError(f"state_ttl_mode must be processing|event, "
                         f"got {state_ttl_mode!r}")
    if state_ttl_mode == "event" and state_ttl_minutes is None:
        raise ValueError("state_ttl_mode='event' needs "
                         "state_ttl_minutes set")
    return (int(state_ttl_minutes * 60_000)
            if state_ttl_minutes is not None else None)


def user_funnel_state(events: DataFrame, steps: list[str],
                      within_seconds: float | None = None,
                      emit: str = "depth",
                      state_ttl_minutes: float | None = None,
                      state_ttl_mode: str = "processing",
                      watermark_delay: str = "10 minutes") -> DataFrame:
    """Streaming conversion funnel: per-user chain state maintained
    across micro-batches via ``applyInPandasWithState`` — each batch
    emits the user's updated funnel ``depth`` (update-mode).  The
    streaming twin of ``operators.funnels.funnel_depths``: the chain
    fold is a LEFT fold over time-sorted events, and a left fold
    composes over stream prefixes, so when each user's events arrive
    in timestamp order across batches (in-batch disorder is fine —
    the batch is sorted before folding) the final depths equal the
    batch operator's exactly (parity-tested, including a
    checkpoint-restart).  A late event older than already-folded
    state folds at arrival position — the standard streaming
    approximation; feed time-partitioned sources in order for exact
    parity.

    State per user: the k chain-start timestamps plus the completing
    event's timestamp (micros; -1 = unreached) — O(#users x (k+1))
    total, independent of stream length.

    ``emit="depth"`` (default) emits the updated funnel depth;
    ``emit="conversion"`` emits ``convert_seconds`` (NULL until the
    chain completes, then the time-to-convert — the streaming twin of
    ``funnels.funnel_conversion_times``, same slot-k capture rule).

    ``state_ttl_minutes`` bounds total state at 100 TB-stream scale:
    a user idle past the TTL has their chain state dropped — a later
    event restarts their funnel from scratch, the standard
    streaming-state trade (documented approximation; the batch-parity
    tests run with TTL off).  Without it, state is O(all users ever
    seen).  ``state_ttl_mode`` picks the clock:

      * ``"processing"`` (default) — wall time
        (``ProcessingTimeTimeout``).  Right for live streams; WRONG
        under replay/backfill, where a month of data replays in
        minutes and nothing ever expires (or, paused mid-replay,
        everything expires).  NOTE: a ProcessingTimeTimeout query
        never self-terminates under an ``availableNow`` trigger
        (Spark schedules empty batches to fire future timeouts) —
        run bounded passes through
        :func:`trial_data_ingestion_spark.streaming.drain`, never a
        bare ``awaitTermination``.
      * ``"event"`` — data time (``EventTimeTimeout``): the input is
        watermarked on ``ts`` with ``watermark_delay``, and a user's
        state expires when the WATERMARK passes their last event +
        TTL.  Replay-safe: expiry follows the data's own clock, so a
        replayed month expires exactly the users the live run would
        have.  Note the watermark also drops events older than it —
        ``watermark_delay`` is the disorder budget."""
    import pandas as pd  # noqa: F401 (worker-side)
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )
    k = len(steps)
    if k < 2:
        raise ValueError("funnel needs >= 2 steps")
    if len(set(steps)) != k:
        raise ValueError(f"duplicate step names: {steps}")
    sid = {s: i for i, s in enumerate(steps)}
    win_us = (int(within_seconds * 1_000_000)
              if within_seconds is not None else None)
    if emit not in ("depth", "conversion"):
        raise ValueError(f"emit must be depth|conversion, got {emit!r}")
    ttl_ms = _validate_ttl(state_ttl_minutes, state_ttl_mode)
    event_ttl = ttl_ms is not None and state_ttl_mode == "event"

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        reached = ([None if v < 0 else v for v in state.get]
                   if state.exists else [None] * (k + 1))
        rows = []
        for pdf in pdf_iter:
            rows.extend(zip(pdf["__t"].astype("int64"),
                            pdf["__s"].astype("int64")))
        # same tie rule as the batch fold: sort by (t, step index)
        for t, s in sorted(rows):
            t, s = int(t), int(s)
            if s == 0:
                if reached[0] is None:
                    reached[0] = t
            elif (reached[s] is None and reached[s - 1] is not None
                  and (win_us is None
                       or t - reached[s - 1] <= win_us)):
                # promote the CHAIN-START time, like the batch fold
                reached[s] = reached[s - 1]
                if s == k - 1:
                    # slot k: the completing event's own timestamp
                    reached[k] = t
        state.update(tuple(-1 if v is None else v for v in reached))
        if event_ttl:
            # expire when the watermark passes last-event + TTL; the
            # timestamp must exceed the current watermark or Spark
            # rejects it, hence the max()
            last_ms = max(t for t, _ in rows) // 1000 if rows else 0
            state.setTimeoutTimestamp(
                max(last_ms + ttl_ms,
                    state.getCurrentWatermarkMs() + 1))
        elif ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if emit == "depth":
            depth = sum(1 for v in reached[:k] if v is not None)
            yield pd.DataFrame({"user_id": [key[0]], "depth": [depth]})
        else:
            conv = (None if reached[k] is None
                    else (reached[k] - reached[k - 1]) / 1_000_000.0)
            yield pd.DataFrame({"user_id": [key[0]],
                                "convert_seconds": [conv]})

    step_id = F.lit(None).cast("int")
    for i, s in enumerate(reversed(steps)):
        step_id = F.when(F.col("event_type") == s,
                         F.lit(k - 1 - i)).otherwise(step_id)
    ev = (events.where(F.col("event_type").isin(*steps))
          .select("user_id",
                  F.col("ts").cast("timestamp").alias("ts"),
                  F.unix_micros(F.col("ts").cast("timestamp"))
                  .alias("__t"),
                  step_id.alias("__s")))
    if event_ttl:
        ev = ev.withWatermark("ts", watermark_delay)
    state_schema = ", ".join(f"r{i} long" for i in range(k + 1))
    out_schema = ("user_id long, depth int" if emit == "depth"
                  else "user_id long, convert_seconds double")
    if ttl_ms is None:
        timeout = GroupStateTimeout.NoTimeout
    elif event_ttl:
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.ProcessingTimeTimeout
    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=timeout,
    )


def user_transition_state(events: DataFrame,
                          state_ttl_minutes: float | None = None,
                          state_ttl_mode: str = "processing",
                          watermark_delay: str = "10 minutes",
                          ) -> DataFrame:
    """Streaming next-event transition counts: per-user LAST-EVENT
    state via ``applyInPandasWithState`` — each micro-batch emits the
    (from_event, to_event, n) increments its events produced for that
    user, including the pair that straddles the batch boundary (the
    remembered last event chains to the batch's first).  Summing the
    emitted increments over the stream reproduces
    ``operators.funnels.next_event_transitions``' counts exactly when
    each user's events arrive in timestamp order across batches
    (in-batch disorder is sorted away; same contract as
    :func:`user_funnel_state`).

    State per user: one (timestamp, event_type) pair — O(#users),
    stream-length independent.  The emitted increments are
    |event-types|^2-bounded per (user, batch); roll them up with a
    plain groupBy-sum in the sink.

    ``state_ttl_minutes`` bounds state to recently-active users: an
    idle user's remembered last event is dropped, so the single pair
    straddling their idle gap is not counted — usually the DESIRED
    semantics (a session boundary), and the documented trade.
    ``state_ttl_mode`` picks the clock, exactly as in
    :func:`user_funnel_state`: ``"processing"`` = wall time (live
    streams), ``"event"`` = watermark time over ``ts`` with
    ``watermark_delay`` disorder budget (replay/backfill-safe — an
    idle gap is measured in DATA time, so a replayed history cuts
    sessions at the same places the live run did).
    (``user_retention_state`` deliberately has NO such knob: cohort
    identity must persist for the whole analysis horizon, or a
    returning user re-cohorts and inflates later cohorts — bound that
    operator's state with ``max_periods`` instead.)"""
    import pandas as pd  # noqa: F401 (worker-side)
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )

    ttl_ms = _validate_ttl(state_ttl_minutes, state_ttl_mode)
    event_ttl = ttl_ms is not None and state_ttl_mode == "event"

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd
        if ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        rows = []
        for pdf in pdf_iter:
            rows.extend(zip(pdf["__t"].astype("int64"), pdf["__s"]))
        # same order as the batch operator's sort_array over
        # struct(t, s): ties break by event string
        rows = sorted((int(t), str(s)) for t, s in rows)
        if state.exists:
            lt, ls = state.get
            rows = [(int(lt), str(ls))] + rows
        counts: dict = {}
        for (_, a), (_, b) in zip(rows, rows[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
        if rows:
            state.update((rows[-1][0], rows[-1][1]))
            if event_ttl:
                state.setTimeoutTimestamp(
                    max(rows[-1][0] // 1000 + ttl_ms,
                        state.getCurrentWatermarkMs() + 1))
            elif ttl_ms is not None:
                state.setTimeoutDuration(ttl_ms)
        if counts:
            ks = sorted(counts)
            yield pd.DataFrame({
                "user_id": [key[0]] * len(ks),
                "from_event": [a for a, _ in ks],
                "to_event": [b for _, b in ks],
                "n": [counts[k] for k in ks]})

    ev = events.select(
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("__t"),
        F.col("event_type").alias("__s"))
    if event_ttl:
        ev = ev.withWatermark("ts", watermark_delay)
    if ttl_ms is None:
        timeout = GroupStateTimeout.NoTimeout
    elif event_ttl:
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.ProcessingTimeTimeout
    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=("user_id long, from_event string, "
                          "to_event string, n long"),
        stateStructType="t long, s string",
        outputMode="update",
        timeoutConf=timeout,
    )


def user_retention_state(events: DataFrame,
                         granularity: str = "week",
                         max_periods: int | None = None) -> DataFrame:
    """Streaming cohort-retention activations: per-user (cohort,
    seen-periods) state via ``applyInPandasWithState`` — each batch
    emits one (cohort, period_index) row per NEWLY activated period
    for that user, so a groupBy-count over the emitted rows equals
    ``operators.funnels.retention_cohorts``' ``n_active`` exactly
    (same in-order contract as :func:`user_funnel_state`; the first
    event's period IS the cohort when events arrive in time order).
    Completes the streaming event-analytics triple (funnel,
    transitions, retention).

    State per user: cohort as epoch days + the activated period
    indexes as a comma string — activations per user are bounded by
    the retention horizon in periods (weeks of stream history), not
    stream length; ``max_periods`` hard-caps it (periods beyond the
    analysis horizon are neither stored nor emitted — the batch
    operator's ``max_periods`` contract).  Cohort state itself has
    deliberately NO TTL: a returning user must keep their original
    cohort or later cohorts inflate.  ``cohort`` is emitted as epoch days; convert with
    ``F.date_from_unix_date`` for the report."""
    import pandas as pd  # noqa: F401 (worker-side)
    from pyspark.sql.streaming.state import (
        GroupState, GroupStateTimeout,
    )
    if granularity not in ("day", "week"):
        raise ValueError(
            f"granularity must be day|week, got {granularity!r}")
    step = 1 if granularity == "day" else 7

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd
        days = []
        for pdf in pdf_iter:
            days.extend(int(d) for d in pdf["__p"])
        if not days:
            return
        if state.exists:
            cohort, seen_s = state.get
            seen = set(int(x) for x in seen_s.split(",") if x != "")
        else:
            cohort, seen = min(days), set()
        fresh = sorted({(d - cohort) // step for d in days} - seen)
        if max_periods is not None:
            fresh = [p for p in fresh if p <= max_periods]
        seen.update(fresh)
        state.update((cohort,
                      ",".join(str(i) for i in sorted(seen))))
        if fresh:
            yield pd.DataFrame({
                "user_id": [key[0]] * len(fresh),
                "cohort": [cohort] * len(fresh),
                "period_index": fresh})

    per = F.date_trunc(granularity, F.col("ts")).cast("date")
    ev = events.select(
        "user_id", F.unix_date(per).alias("__p"))
    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=("user_id long, cohort int, "
                          "period_index int"),
        stateStructType="cohort int, seen string",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def foreach_batch_upsert(stream: DataFrame, spark: SparkSession,
                         path: str, key: str, checkpoint: str,
                         n_buckets: int = 16):
    """Stateful streaming upsert: each micro-batch merges by key into
    the bucketed parquet table (J6 semantics, exactly-once per batch
    via the checkpointed batch id + idempotent merge)."""
    from trial_data_ingestion_spark.sinks import upsert_parquet

    def do_merge(batch_df: DataFrame, _batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        upsert_parquet(spark, batch_df, path, key, n_buckets)

    return (stream.writeStream.foreachBatch(do_merge)
            .option("checkpointLocation", checkpoint))
