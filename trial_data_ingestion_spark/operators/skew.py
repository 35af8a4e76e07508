"""Shuffle-skew diagnostics: measure key skew BEFORE it melts a
reducer, and size the fix.

At 100 TB the difference between a 4-minute and a 4-hour job is
usually one hot key (a null-ish default id, a boilerplate
fingerprint, one mega-domain).  The engine already carries the fixes
— ``operators.joins.salted_join``, AQE skew splitting,
``sampling.cap_per_group`` — but picking between them needs numbers:
how hot is the hottest key, how many keys carry the mass, what salt
factor flattens it.  This module is the measuring tape.

Shapes: ONE map-side-combined count aggregate over the keys (the
same shuffle the diagnosed join/groupBy would do, minus the
payload), a TakeOrdered head for the top keys, and approxQuantile on
the per-key counts — nothing here is heavier than the query being
diagnosed.  For EXTREME key cardinality where even this count
shuffle is too big (urls, grams), use the no-shuffle candidate pass
of :func:`operators.corpus_stats.approx_heavy_hitters` instead.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class SkewReport:
    keys: list[str]
    n_rows: int
    n_keys: int
    max_key_rows: int
    mean_key_rows: float
    #: rows of the p50 / p90 / p99 key (approxQuantile, 1% error)
    p50: float
    p90: float
    p99: float
    #: max / mean — ~1 is uniform; >> shuffle_partitions means one
    #: task carries a partition-sized key on its own
    skew_factor: float
    #: (key values..., n_rows) for the top keys, hottest first
    top_keys: list[tuple]

    def recommended_salt(self, target_rows_per_task: int) -> int:
        """Salt factor spreading the hottest key to
        ``target_rows_per_task``: ceil(max / target), floored at 1
        (uniform data needs no salt)."""
        if target_rows_per_task < 1:
            raise ValueError("target_rows_per_task must be >= 1")
        return max(1, math.ceil(self.max_key_rows
                                / target_rows_per_task))


def key_skew_report(df: DataFrame, keys: list[str] | str,
                    top_n: int = 20) -> SkewReport:
    """Measure per-key row-count skew for a prospective shuffle on
    ``keys``.  NULL keys count as a key of their own — they are the
    most common hot key in practice."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    if not keys:
        raise ValueError("key_skew_report: at least one key column")
    counts = (df.groupBy(*keys)
              .agg(F.count(F.lit(1)).alias("__n"))
              .persist())
    agg = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("__n").alias("n_rows"),
        F.max("__n").alias("max_n")).collect()[0]
    if not agg["n_keys"]:
        counts.unpersist()
        raise ValueError("key_skew_report: empty input")
    p50, p90, p99 = counts.approxQuantile("__n", [0.5, 0.9, 0.99],
                                          0.01)
    top = [tuple(r[k] for k in keys) + (r["__n"],)
           for r in counts.orderBy(F.desc("__n"), *keys)
                          .limit(top_n).collect()]
    counts.unpersist()
    mean = agg["n_rows"] / agg["n_keys"]
    return SkewReport(
        keys=keys, n_rows=int(agg["n_rows"]),
        n_keys=int(agg["n_keys"]), max_key_rows=int(agg["max_n"]),
        mean_key_rows=round(mean, 3),
        p50=p50, p90=p90, p99=p99,
        skew_factor=round(agg["max_n"] / mean, 3),
        top_keys=top)
