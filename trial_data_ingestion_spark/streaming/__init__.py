"""Structured Streaming surface (SURVEY.md §2.10)."""

from __future__ import annotations

import time


def drain(query, n_data_batches: int = 1, timeout: float = 180.0,
          poll_interval: float = 0.15) -> None:
    """Wait until ``query`` has processed ``n_data_batches``
    micro-batches that carried input rows, then stop it and surface
    any failure — the safe way to run a bounded (``availableNow``)
    pass of ANY stateful query in this package.

    Why ``awaitTermination`` is not enough: a query holding
    ``ProcessingTimeTimeout`` state — e.g.
    ``user_funnel_state(state_ttl_mode="processing")`` or
    ``user_transition_state`` with a wall-clock TTL — NEVER
    self-terminates under an ``availableNow`` trigger.  Spark keeps
    scheduling EMPTY micro-batches to fire future timeouts
    (``shouldRunAnotherBatch`` is unconditionally true under that
    timeout conf), so the query also blocks ``processAllAvailable``;
    ``awaitTermination(t)`` burns its full ``t`` and returns with the
    query STILL ACTIVE, silently leaking a stream that churns empty
    batches for the rest of the session.  Counting data-carrying
    batches via ``recentProgress`` works for terminating and
    non-terminating queries alike (an ``EventTimeTimeout`` or
    timeout-free availableNow query just finishes early and is
    stopped the same way).

    Raises ``TimeoutError`` if the data batches don't arrive within
    ``timeout`` seconds (the query is stopped first — never leaked),
    and ``RuntimeError`` wrapping the query's own exception if it
    failed (Spark's own ``StreamingQueryException`` is re-wrapped so
    callers have ONE failure type to catch)."""
    # recentProgress is a BOUNDED ring buffer
    # (spark.sql.streaming.numRecentProgressUpdates, default 100): a
    # ProcessingTimeTimeout query churning rapid EMPTY batches — the
    # exact case drain exists for — can evict data-batch entries
    # between polls.  Accumulate the ids of data-carrying batches
    # across polls instead of recounting the buffer each time.
    seen_data_batches: set[int] = set()

    def _data_batches() -> int:
        seen_data_batches.update(p.batchId for p in query.recentProgress
                                 if p.numInputRows > 0)
        return len(seen_data_batches)

    deadline = time.time() + timeout
    while (time.time() < deadline and query.isActive
           and _data_batches() < n_data_batches):
        time.sleep(poll_interval)
    try:
        if query.isActive and _data_batches() < n_data_batches:
            raise TimeoutError(
                f"stream drained only {_data_batches()}/"
                f"{n_data_batches} data batches in {timeout}s")
    finally:
        if query.isActive:
            query.stop()
    # a FAILED query makes awaitTermination itself raise
    # StreamingQueryException — normalize both failure surfaces to
    # the documented RuntimeError
    from pyspark.errors import StreamingQueryException
    try:
        query.awaitTermination(60)
    except StreamingQueryException as e:
        raise RuntimeError(str(e)[:2000]) from e
    if query.exception():
        raise RuntimeError(str(query.exception())[:2000])
