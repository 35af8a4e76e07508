"""Scale-corpus generator invariants (bench.py `_scaled_documents`
and `_scaled_documents_rot`).

The scale tiers (BENCH_SCALE.json) are only a fair measurement if the
generated corpus grows WITHOUT changing its statistical character:
dup structure must replicate linearly, and replicas of one doc must
never become near-dups of each other under ANY projection an entry
uses.  Two generators, because one transform cannot satisfy both
invariant families:

* word-suffix (`_scaled_documents`) preserves lang/quality/stopword
  distributions (curation entries) but NOT sub-window edit
  separation — short-word 40-char prefixes stay byte-equal across
  replicas;
* char-permutation (`_scaled_documents_rot`) preserves edit-distance
  and shingle structure EXACTLY (a bijection) and leaves no shared
  cross-replica q-gram — the corpus the edit-distance entry (b12)
  scales over.  Round 9 also learned that a constant per-replica
  prefix tag is NOT a fix: it removes the distance-0 cliques but is
  itself a replica-wide hot positional gram, blowing up the blocking
  join's collision volume quadratically.

These tests pin both generators so neither degeneracy can silently
return.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

FACTOR = 5


@pytest.fixture(scope="module")
def base_docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


@pytest.fixture(scope="module")
def scaled(spark, base_docs):
    import bench
    out = bench._scaled_documents(base_docs, FACTOR).persist()
    out.count()
    yield base_docs, out
    out.unpersist()


@pytest.fixture(scope="module")
def scaled_rot(spark, base_docs):
    import bench
    out = bench._scaled_documents_rot(base_docs, FACTOR).persist()
    out.count()
    yield base_docs, out
    out.unpersist()


# --- word-suffix generator (curation-family corpus) ----------------------

def test_replica_zero_is_byte_identical(scaled):
    docs, out = scaled
    rep0 = (out.where(F.col("doc_id") % FACTOR == 0)
            .select((F.col("doc_id") / FACTOR).cast("long").alias("doc_id"),
                    "text"))
    diff = (rep0.join(docs.select("doc_id",
                                  F.col("text").alias("orig")), "doc_id")
            .where(F.col("text") != F.col("orig")))
    assert rep0.count() == docs.count()
    assert diff.count() == 0


def test_row_count_and_id_uniqueness(scaled):
    docs, out = scaled
    n = docs.count()
    assert out.count() == n * FACTOR
    assert out.select("doc_id").distinct().count() == n * FACTOR


def test_within_replica_dup_structure_replicates(scaled):
    """Planted near-dup pairs must keep their relationships inside
    every replica: the fingerprint-dedup survivor count per replica
    equals replica 0's (bijective word substitution preserves exact-
    dup groups)."""
    _, out = scaled
    per_rep = (out
               .select((F.col("doc_id") % FACTOR).alias("rep"),
                       F.xxhash64("text").alias("fp"))
               .groupBy("rep")
               .agg(F.countDistinct("fp").alias("uniq")))
    counts = {r["rep"]: r["uniq"] for r in per_rep.collect()}
    assert len(set(counts.values())) == 1, counts


# --- char-permutation generator (edit-distance corpus, b12) --------------

def _rot_stride(base_docs) -> int:
    mx = base_docs.agg(F.max("doc_id")).first()[0]
    stride = int(mx) + 1
    return stride + stride % 2


def test_rot_replica_zero_is_byte_identical(scaled_rot):
    docs, out = scaled_rot
    stride = _rot_stride(docs)
    rep0 = (out.where(F.col("doc_id") < stride)
            .select("doc_id", "text"))
    diff = (rep0.join(docs.select("doc_id",
                                  F.col("text").alias("orig")), "doc_id")
            .where(F.col("text") != F.col("orig")))
    assert rep0.count() == docs.count()
    assert diff.count() == 0


def test_rot_id_layout_preserves_parity(scaled_rot):
    """doc_id = orig + rep*stride with stride even: id parity equals
    the ORIGINAL doc's parity in every replica, so b12's even/odd
    left-right split puts all replicas of a doc on the SAME side —
    the join never compares a doc with its own replicas."""
    docs, out = scaled_rot
    stride = _rot_stride(docs)
    n = docs.count()
    assert out.count() == n * FACTOR
    assert out.select("doc_id").distinct().count() == n * FACTOR
    mixed = (out.select((F.col("doc_id") % 2).alias("p_scaled"),
                        ((F.col("doc_id") % stride) % 2).alias("p_orig"))
             .where(F.col("p_scaled") != F.col("p_orig")))
    assert mixed.count() == 0


def test_rot_preserves_edit_distance_exactly(scaled_rot):
    """The permutation is a character bijection: levenshtein between
    any two texts OF THE SAME REPLICA is identical to the distance
    between their rep-0 counterparts.  Checked on 40-char windows for
    consecutive-id pairs of every replica."""
    docs, out = scaled_rot
    stride = _rot_stride(docs)
    p = out.select((F.col("doc_id") / stride).cast("long").alias("rep"),
                   (F.col("doc_id") % stride).alias("orig"),
                   F.substring("text", 1, 40).alias("pfx"))
    a = p.alias("a")
    b = (p.withColumn("orig", F.col("orig") - 1).alias("b"))
    d = (a.join(b, ["rep", "orig"])
         .select("rep", "orig",
                 F.levenshtein(F.col("a.pfx"), F.col("b.pfx"))
                 .alias("d")))
    per_pair = (d.groupBy("orig")
                .agg(F.countDistinct("d").alias("nd"),
                     F.count(F.lit(1)).alias("nreps")))
    bad = per_pair.where((F.col("nreps") == FACTOR)
                         & (F.col("nd") != 1)).count()
    assert bad == 0


def test_rot_cross_replica_windows_are_far(scaled_rot):
    """Same doc, different replicas: 40-char windows must clear b12's
    d<=3 threshold (no distance-0 replica cliques).  Exhaustive over
    all docs x replica pairs at sf0.001."""
    docs, out = scaled_rot
    stride = _rot_stride(docs)
    p = out.select((F.col("doc_id") % stride).alias("orig"),
                   (F.col("doc_id") / stride).cast("long").alias("rep"),
                   F.substring("text", 1, 40).alias("pfx"))
    a, b = p.alias("a"), p.alias("b")
    close = (a.join(b, on=[F.col("a.orig") == F.col("b.orig"),
                           F.col("a.rep") < F.col("b.rep")])
             .where(F.levenshtein(F.col("a.pfx"), F.col("b.pfx")) <= 3))
    assert close.count() == 0


def test_rot_fuzzy_join_output_replicates_linearly(scaled_rot):
    """The end-to-end invariant the b12 tier rests on: the fuzzy join
    over the rot corpus returns exactly FACTOR x the base corpus's
    pairs — every replica reproduces replica 0's true pairs, nothing
    across replicas."""
    from trial_data_ingestion_spark.operators.fuzzy_join import (
        fuzzy_join_pairs,
    )
    docs, out = scaled_rot

    def pairs(d):
        left = (d.where("doc_id % 2 = 0")
                .select("doc_id", F.substring("text", 1, 40).alias("t")))
        right = (d.where("doc_id % 2 = 1")
                 .select("doc_id", F.substring("text", 1, 40).alias("t")))
        return fuzzy_join_pairs(left, right, "doc_id", "t",
                                "doc_id", "t", max_distance=3)

    base_n = pairs(docs).count()
    scaled_n = pairs(out).count()
    assert scaled_n == base_n * FACTOR, (base_n, scaled_n)
