"""Join operators beyond Spark's built-ins: as-of join and manual
skew salting.

The reference's joins are all dict lookups (broadcast hash joins —
SURVEY.md §2.5 J1-J6, preprocessing/fulltext_enricher.py:196-203);
these two operators cover the join shapes a 100 TB deployment needs
that neither the reference nor Spark provides directly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, on: list[str],
              left_ts: str, right_ts: str,
              value_cols: list[str],
              direction: str = "backward") -> DataFrame:
    """As-of join: for each left row, attach ``value_cols`` from the
    most recent right row with ``right_ts <= left_ts`` (per ``on``
    key); nulls where no prior right row exists.

    Spark has no ASOF JOIN; the naive range-join (``l.ts >= r.ts`` +
    max-per-key) explodes to O(|L| x |R|) per key.  This is the
    union+window plan instead: tag both sides, union, one shuffle on
    the key, ``last(value, ignorenulls)`` over an unbounded-preceding
    frame ordered by (ts, side) — right rows sort before left rows at
    equal timestamps, so an exactly-simultaneous right row is visible
    to the left row (ASOF's <= semantics, matching DuckDB's ASOF
    JOIN, which the oracle uses to verify this operator).

    Scale shape: ONE hash shuffle on ``on`` + a per-partition sort —
    the same cost as a regular sort-merge join, independent of time-
    range density.  If multiple right rows share (key, ts), pre-
    aggregate the right side to make the result deterministic.

    ``direction="forward"`` flips the semantics to the NEXT right row
    with ``right_ts >= left_ts`` (DuckDB ``ASOF ... ON l.ts <= r.ts``)
    — same union plan with the window frame reversed: first-ignorenulls
    over current-row..unbounded-following, left rows sorting before
    right rows at equal timestamps so a simultaneous right row is
    still visible.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(
            f"direction must be backward|forward, got {direction!r}")
    rtypes = dict(right.dtypes)
    ltypes = dict(left.dtypes)
    lcols = left.columns

    lt = left.withColumn("__ts", F.col(left_ts)) \
             .withColumn("__is_left", F.lit(1))
    for c in value_cols:
        lt = lt.withColumn(f"__v_{c}", F.lit(None).cast(rtypes[c]))

    rt = right.withColumn("__ts", F.col(right_ts)) \
              .withColumn("__is_left", F.lit(0))
    for c in value_cols:
        rt = rt.withColumn(f"__v_{c}", F.col(c))
    for c in lcols:
        if c not in on:
            rt = rt.withColumn(c, F.lit(None).cast(ltypes[c]))

    out_cols = lcols + ["__ts", "__is_left"] + \
        [f"__v_{c}" for c in value_cols]
    unioned = lt.select(*out_cols).unionByName(rt.select(*out_cols))

    if direction == "backward":
        w = (Window.partitionBy(*on)
             .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        pick = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        # left (1) sorts before right (0) at equal ts: descending on
        # the side flag, so the forward frame still sees same-ts rows
        w = (Window.partitionBy(*on)
             .orderBy(F.col("__ts").asc(), F.col("__is_left").desc())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        pick = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    for c in value_cols:
        unioned = unioned.withColumn(c, pick(f"__v_{c}"))
    return (unioned.where(F.col("__is_left") == 1)
            .select(*lcols, *value_cols))


def salted_join(big: DataFrame, small: DataFrame, on: str,
                how: str = "inner", salt: int = 16) -> DataFrame:
    """Equi-join with manual key salting for skew.

    When one join key dominates (a hot document source, a null-ish
    default id), a hash shuffle sends all its rows to one reducer.
    AQE's skew-join splitting handles sort-merge joins; this handles
    the remaining case — small side too big to broadcast, hot key
    known to exist: big-side rows spread across ``salt`` sub-keys
    (round-robin via monotonically_increasing_id, NOT a hash of the
    key — same-key rows must scatter); small side replicated
    ``salt`` x.  Result identical to ``big.join(small, on, how)``
    ONLY for join types where unmatched small-side rows are never
    emitted: a replicated small row that matches nothing would appear
    once per salt replica under ``right``/``full_outer``, so those
    modes raise; reducer input bounded by |hot key| / salt.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "cross"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only: '{how}' would "
            "emit unmatched small-side rows once per salt replica")
    bs = big.withColumn(
        "__salt",
        F.pmod(F.monotonically_increasing_id(), F.lit(salt)).cast("int"))
    ss = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)])))
    return bs.join(ss, [on, "__salt"], how).drop("__salt")


def key_skew_report(df: DataFrame, key_cols: list[str] | str,
                    top_k: int = 20) -> DataFrame:
    """Per-key shuffle-pressure diagnostic: the ``top_k`` heaviest
    join/agg keys with row count, share of the table, and
    ``skew_factor`` = count / mean-count-per-key.  This is the number
    that decides the mitigation: factor ~1-10 -> AQE skew splitting
    suffices; 100+ on a key a reducer must hold -> salt
    (:func:`salted_join`) or isolate the hot key.

    One keyed aggregate with map-side combine plus two scalar
    aggregates — runs at full corpus scale as a cheap pre-flight
    before a big join."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n_rows"))
    stats = counts.agg(
        F.sum("n_rows").alias("__total"),
        F.avg("n_rows").alias("__mean"))
    return (counts
            .crossJoin(F.broadcast(stats))
            .select(*keys, "n_rows",
                    F.round(F.col("n_rows") / F.col("__total"), 6)
                     .alias("share"),
                    F.round(F.col("n_rows") / F.col("__mean"), 2)
                     .alias("skew_factor"))
            .orderBy(F.desc("n_rows"), *[F.asc(k) for k in keys])
            .limit(top_k))
