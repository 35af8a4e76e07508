"""Z-order layout: Morton interleave vs a python reference, content
preservation, and the point of it all — measured multi-dimension file
skipping vs a linear sort on real lineitem data."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _py_morton(codes: list[int], bits: int) -> int:
    z = 0
    for b in range(bits):
        for i, c in enumerate(codes):
            z |= ((c >> b) & 1) << (b * len(codes) + i)
    return z


def test_morton_interleave_matches_reference(spark):
    from trial_data_ingestion_spark.sinks.zorder import _interleave

    rows = [(a, b) for a in (0, 1, 5, 200, 255) for b in (0, 3, 255)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select("a", "b",
                    _interleave([F.col("a"), F.col("b")], 8)
                    .alias("z")).collect()
    for r in got:
        assert r["z"] == _py_morton([r["a"], r["b"]], 8), (r["a"], r["b"])


def test_zorder_write_preserves_rows(spark, tmp_path):
    from trial_data_ingestion_spark.sinks.zorder import write_zordered

    li = (spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
          .select("l_orderkey", "l_partkey", "l_extendedprice",
                  "l_quantity"))
    out = str(tmp_path / "zli")
    write_zordered(li, ["l_partkey", "l_extendedprice"], out,
                   num_files=8)
    back = spark.read.parquet(out)
    assert back.columns == li.columns          # __z dropped
    assert back.count() == li.count()
    # double sums rounded: reassembly reorders float addition
    sums = lambda d: d.groupBy().agg(                    # noqa: E731
        F.round(F.sum("l_extendedprice"), 2),
        F.sum("l_orderkey"), F.sum("l_quantity")).collect()
    assert sums(li) == sums(back)


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    """The layout contract, measured from parquet footers: a linear
    sort prunes its own column and nothing else; the z-order layout
    prunes selective range predicates on BOTH indexed columns."""
    from trial_data_ingestion_spark.sinks.zorder import (
        file_ranges,
        overlap_fraction,
        write_zordered,
        zorder_key,
    )

    from tests.conftest import SF_DIR_ORACLE

    # sf0.01 x 64 files: repartitionByRange's sampling seed derives
    # from the RDD id, so file boundaries differ run to run (fresh
    # session vs mid-suite) — at 16 files one boundary wobble moved
    # the box fraction by 0.06 and flaked the old 0.45 gate.  64
    # finer files drop both the measured overlaps (~3x) and their
    # variance (observed spread <= 0.05 over reseeded runs); gates
    # keep >= 2x margin on the worst observed value.
    li = (spark.read.parquet(f"{SF_DIR_ORACLE}/lineitem.parquet")
          .select("l_orderkey", "l_partkey", "l_extendedprice"))
    n_files = 64
    zpath, lpath = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(li, ["l_partkey", "l_extendedprice"], zpath,
                   num_files=n_files)
    (zorder_key(li, ["l_partkey"], bits=8)   # linear: sort 1st col only
     .repartitionByRange(n_files, F.col("__z"))
     .sortWithinPartitions("__z").drop("__z")
     .write.mode("overwrite").parquet(lpath))
    # a ~10% box on each dimension
    pk = li.approxQuantile("l_partkey", [0.45, 0.55], 0.001)
    ep = li.approxQuantile("l_extendedprice", [0.45, 0.55], 0.001)
    zr = file_ranges(zpath, ["l_partkey", "l_extendedprice"])
    lr = file_ranges(lpath, ["l_partkey", "l_extendedprice"])
    assert len(zr) == n_files
    z_pk = overlap_fraction(zr, "l_partkey", *pk)
    z_ep = overlap_fraction(zr, "l_extendedprice", *ep)
    l_pk = overlap_fraction(lr, "l_partkey", *pk)
    l_ep = overlap_fraction(lr, "l_extendedprice", *ep)
    # linear layout: primary prunes hard, secondary reads EVERYTHING
    assert l_pk <= 0.25
    assert l_ep >= 0.9
    # z-order's contract: it trades some primary pruning (the curve
    # shares its high bits across columns) to make EVERY indexed
    # column prune — the secondary goes from ~1.0 to well under it,
    # and the primary still beats a full scan
    assert z_ep <= 0.6, f"z ep overlap {z_ep}"
    assert z_pk <= 0.7, f"z pk overlap {z_pk}"
    # the box (AND of both predicates) prunes on the intersection of
    # the footer ranges — far below either single dimension
    box = sum(1 for r in zr
              if r["l_partkey"][1] >= pk[0] and r["l_partkey"][0] <= pk[1]
              and r["l_extendedprice"][1] >= ep[0]
              and r["l_extendedprice"][0] <= ep[1]) / len(zr)
    assert box <= 0.3, f"z box overlap {box}"
    # and the scan itself agrees with the footer arithmetic: the same
    # predicate returns identical rows on both layouts
    pred = (F.col("l_partkey").between(*pk)
            & F.col("l_extendedprice").between(*ep))
    zn = spark.read.parquet(zpath).where(pred).count()
    ln = spark.read.parquet(lpath).where(pred).count()
    assert zn == ln == li.where(pred).count()


def test_zorder_rejects_unorderable_columns(spark):
    import pytest

    from trial_data_ingestion_spark.sinks.zorder import zorder_key

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with pytest.raises(ValueError, match="range-ordered"):
        zorder_key(docs, ["text"])
