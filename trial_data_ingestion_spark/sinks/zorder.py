"""Z-order (Morton-curve) data layout: cluster a table on SEVERAL
columns at once so file-level min/max statistics prune scans for
predicates on ANY of them.

The 100 TB data-skipping pattern: a table sorted linearly on one
column prunes beautifully on that column and not at all on any other
— every file's min/max for the secondary column spans the whole
domain.  Interleaving the bits of per-column rank codes (the Morton /
Z-order curve, the technique behind Delta Lake's OPTIMIZE ZORDER BY
and ClickHouse/DuckDB space-filling-curve indexes) maps
multi-dimensional proximity onto one sort key: rows close in the
curve are close in EVERY dimension, so each file covers a small
hyper-rectangle and a selective predicate on any indexed column
overlaps few files.

Mechanics, all native Column expressions (no Python in the path):

  1. per column: equal-frequency rank codes.  ``approxQuantile``
     (driver call, bounded error, one pass) yields 2^bits - 1
     boundaries; the per-row code is "how many boundaries <= value"
     — a ``size(filter(lit(boundaries), b -> v >= b))`` over a
     broadcast literal array.  Equal-frequency (not equal-width)
     codes keep the curve balanced under skew.
  2. interleave code bits into one long (``shiftleft``/``|`` terms,
     codegen-friendly: bits x n_cols terms total).
  3. ``repartitionByRange`` on the z key (range exchange: one
     sampling pass + one shuffle) then ``sortWithinPartitions`` and
     a parquet write — every output file covers one contiguous curve
     segment, and parquet footers carry per-file min/max for the
     original columns.

Readers need no cooperation: plain parquet scans with ordinary
predicates skip at row-group/file granularity via the stats Spark
and every other parquet reader already consult.  ``file_ranges``
exposes those footer stats so tests (and operators) can measure the
skipping instead of asserting it by faith.

Nulls order first in both the rank code (code 0) and parquet stats,
so null-filtering predicates prune too.  Columns must be numeric,
date, or timestamp — types with a meaningful total order for range
predicates; anything else raises.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_RANKABLE = ("int", "bigint", "smallint", "tinyint", "float", "double",
             "date", "decimal")


def _as_double(df: DataFrame, col: str) -> Column:
    """Numeric view of a rankable column (timestamps -> epoch secs)."""
    dt = dict(df.dtypes)[col]
    if dt.startswith("timestamp"):
        return F.unix_timestamp(F.col(col)).cast("double")
    if dt == "date":
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
    if any(dt.startswith(t) for t in _RANKABLE):
        return F.col(col).cast("double")
    raise ValueError(
        f"z-order column {col!r} has type {dt}: needs a range-ordered "
        "type (numeric/date/timestamp)")


def _interleave(codes: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits``-wide codes into one long: bit b of
    code i lands at position b * n + i (LSB-first round-robin)."""
    n = len(codes)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(codes):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)),
                            b * n + i))
    return z


def zorder_key(df: DataFrame, cols: list[str], bits: int = 8,
               relative_error: float = 0.001) -> DataFrame:
    """``df`` plus a ``__z`` long column: the Morton code of
    equal-frequency ``bits``-wide rank codes of ``cols``.  One
    ``approxQuantile`` driver call per column (sampling pass over the
    input; bounded memory at any scale); nulls take rank 0."""
    if not 1 <= len(cols) * bits <= 63:
        raise ValueError("cols x bits must fit a long")
    n_bounds = (1 << bits) - 1
    probs = [(i + 1) / (n_bounds + 1) for i in range(n_bounds)]
    num = {c: _as_double(df, c) for c in cols}
    sampled = df.select(*[num[c].alias(c) for c in cols])
    codes = []
    for c in cols:
        bounds = sorted(set(sampled.approxQuantile(c, probs,
                                                   relative_error)))
        v = num[c]
        code = F.size(F.filter(
            F.lit([float(b) for b in bounds]),
            lambda bnd: v >= bnd)).cast("long")
        # low-cardinality columns collapse duplicate quantile
        # boundaries; rescale so the surviving levels still span the
        # full bit width — otherwise the column's high interleave
        # bits are constant and it stops participating in the curve's
        # file-level (high-bit) ordering
        if len(bounds) < n_bounds:
            code = F.floor(code * n_bounds / max(len(bounds), 1)) \
                .cast("long")
        codes.append(F.when(v.isNull(), F.lit(0).cast("long"))
                     .otherwise(code))
    return df.withColumn("__z", _interleave(codes, bits))


def write_zordered(df: DataFrame, cols: list[str], path: str,
                   num_files: int = 32, bits: int = 8,
                   mode: str = "overwrite") -> None:
    """Materialize ``df`` at ``path`` clustered on the z-curve of
    ``cols``: range-partition on ``__z`` into ``num_files`` curve
    segments, sort within each, drop the key, write parquet.  Size
    ``num_files`` so each file lands near the cluster's target file
    size (the z key is dropped — the layout IS the index)."""
    keyed = zorder_key(df, cols, bits)
    (keyed.repartitionByRange(num_files, F.col("__z"))
     .sortWithinPartitions("__z")
     .drop("__z")
     .write.mode(mode).parquet(path))


def file_ranges(path: str, cols: list[str]) -> list[dict]:
    """Per-file [min, max] footer statistics for ``cols`` — the exact
    numbers a pruning scan consults.  Driver-side pyarrow read of
    footers only (no data pages): cheap inspection for tests,
    skip-ratio reports, and layout audits."""
    import glob
    import os

    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i
                 for i in range(md.num_columns)}
        rng = {"file": os.path.basename(f), "rows": md.num_rows}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(names[c]).statistics
                if st is None or not st.has_min_max:
                    lo, hi = None, None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            rng[c] = (lo, hi)
        out.append(rng)
    return out


def overlap_fraction(ranges: list[dict], col: str, lo, hi) -> float:
    """Fraction of files whose ``col`` footer range intersects
    [lo, hi] — the fraction of the table a stats-pruning scan reads
    for that predicate (1.0 where stats are absent: no pruning)."""
    hit = 0
    for r in ranges:
        cmin, cmax = r[col]
        if cmin is None or (cmax >= lo and cmin <= hi):
            hit += 1
    return hit / len(ranges) if ranges else 0.0
