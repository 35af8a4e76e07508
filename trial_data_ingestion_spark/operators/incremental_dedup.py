"""Incremental near-duplicate detection against a persisted MinHash
signature store.

At 100 TB you do not re-shingle and re-hash the whole corpus every
time a delta batch arrives: the corpus' banded MinHash signatures are
computed ONCE, persisted partitioned by a hash of the band bucket,
and each new batch is deduplicated by

1. an **in-batch** LSH pass (the batch against itself), plus
2. a **cross** pass — the batch's banded signatures broadcast-joined
   against the stored corpus bands, with the scan pruned to only the
   partitions the batch's buckets can possibly live in, plus
3. one exact Jaccard verification over (in-batch ∪ cross) candidate
   pairs — corpus text is fetched ONLY for candidate docs, via a
   partition-pruned read of the index's doc payload, plus
4. cluster-correct removal: connected components over the confirmed
   pairs; a new doc survives iff its component contains **no corpus
   doc** and it is the minimum-id new doc of its component
   ("corpus wins": persisted docs are never retracted by a delta).

The index stores EVERYTHING it has seen (duplicates included), not
just survivors: a new doc may match a previously-dropped duplicate
without matching that duplicate's representative, and the full graph
is what makes the incremental decision identical to re-running
:func:`~.dedup.dedup_minhash` over the union (see the parity test).

Index layout under ``path``:

* ``bands/``  — (doc, band, bucket, dbkt) partitioned by ``pbkt =
  pmod(xxhash64(bucket, band), num_buckets)``; a probe touches only
  the partitions of the batch's own buckets.
* ``docs/``   — (doc, text) partitioned by ``dbkt =
  pmod(xxhash64(doc), num_buckets)``; candidate verification reads
  only the partitions holding candidate corpus docs (their ``dbkt``
  rides along on the band rows, so no corpus-side hashing at query
  time).
* ``params/`` — one row recording (k, num_hashes, bands,
  num_buckets); loaded back so callers can't probe with mismatched
  hashing parameters.

Reference parity: the reference dedups only within one run
(``pipelines/ingest_pipeline.py`` drop_duplicates); incremental
corpus-level near-dedup is part of this engine's training-data tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trial_data_ingestion_spark.operators.dedup import (
    connected_components_min_label, jaccard_verify, minhash_signatures,
)


def _banded(df: DataFrame, id_col: str, text_col: str, k: int,
            num_hashes: int, bands: int) -> DataFrame:
    """(doc, band, bucket) banded-signature rows — the LSH key table
    (same banding as ``minhash_lsh_candidates``)."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes)
    return sig.select(
        "doc",
        F.explode(F.array(*[
            F.struct(F.lit(b).alias("band"),
                     F.concat_ws(",", *[
                         F.col(f"h{b * rows_per_band + r}")
                         for r in range(rows_per_band)
                     ]).alias("bucket"))
            for b in range(bands)
        ])).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")


def _pbkt(num_buckets: int):
    return F.pmod(F.xxhash64("bucket", "band"), F.lit(num_buckets))


def write_minhash_index(df: DataFrame, path: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = 8, num_hashes: int = 32,
                        bands: int = 8, num_buckets: int = 64,
                        mode: str = "overwrite") -> None:
    """Persist the banded-signature store for ``df`` (one shuffle —
    the signature groupBy; the band fan-out and partitioned write are
    narrow).  ``mode='append'`` extends an existing index (the layout
    is append-friendly; compact small files with a periodic rewrite
    when delta batches are tiny and frequent)."""
    banded = (_banded(df, id_col, text_col, k, num_hashes, bands)
              .withColumn("dbkt", F.pmod(F.xxhash64(F.col("doc")),
                                         F.lit(num_buckets)))
              .withColumn("pbkt", _pbkt(num_buckets)))
    # repartition ON the partition column first: otherwise every
    # write task emits a file into every partition dir (tasks x
    # buckets tiny files — measured 8x slower to write AND to probe);
    # hashed on pbkt, each bucket is exactly one task's one file
    (banded.repartition("pbkt")
           .write.mode(mode).partitionBy("pbkt").parquet(path + "/bands"))
    docs = df.select(F.col(id_col).alias("doc"),
                     F.col(text_col).alias("text"),
                     F.pmod(F.xxhash64(F.col(id_col)),
                            F.lit(num_buckets)).alias("dbkt"))
    (docs.repartition("dbkt")
         .write.mode(mode).partitionBy("dbkt").parquet(path + "/docs"))
    spark = df.sparkSession
    (spark.createDataFrame(
        [(k, num_hashes, bands, num_buckets)],
        "k int, num_hashes int, bands int, num_buckets int")
     .coalesce(1).write.mode("overwrite").parquet(path + "/params"))
    # rebuilding over a previous index: drop the cached file listing,
    # or later readers resolve deleted part files (FILE_NOT_EXIST)
    for sub in ("/bands", "/docs", "/params"):
        spark.catalog.refreshByPath(path + sub)


def read_minhash_params(spark, path: str) -> dict:
    row = spark.read.parquet(path + "/params").collect()[0]
    return {"k": row["k"], "num_hashes": row["num_hashes"],
            "bands": row["bands"], "num_buckets": row["num_buckets"]}


def cross_candidates(spark, new_banded: DataFrame, index_path: str,
                     num_buckets: int) -> DataFrame:
    """(doc_a = corpus doc, doc_b = new doc, dbkt_a) candidate pairs:
    the stored bands are scanned only in the partitions named by the
    batch's own bucket hashes (literal ``pbkt`` filter — static
    partition pruning), and the batch side is broadcast, so the
    corpus never shuffles."""
    probe = new_banded.withColumn("pbkt", _pbkt(num_buckets))
    pbkts = sorted(r["pbkt"]
                   for r in probe.select("pbkt").distinct().collect())
    idx = (spark.read.parquet(index_path + "/bands")
           .where(F.col("pbkt").isin(pbkts)))
    return (idx.join(F.broadcast(probe.withColumnRenamed("doc", "doc_b")),
                     ["band", "bucket", "pbkt"])
               .where(F.col("doc") != F.col("doc_b"))
               .select(F.col("doc").alias("doc_a"), "doc_b",
                       F.col("dbkt").alias("dbkt_a"))
               .distinct())


def _corpus_wins_survivors(new_docs: DataFrame, confirmed: DataFrame,
                           corpus_nodes: DataFrame,
                           id_col: str) -> DataFrame:
    """Cluster-correct incremental removal, shared by the MinHash and
    embedding incremental paths: connected components over the
    confirmed pair graph; a new doc survives iff its component holds
    no corpus doc ("corpus wins" — persisted docs are never
    retracted) and it is the min-id new doc of its component.
    ``corpus_nodes``: one ``doc`` column of corpus-side candidate
    ids."""
    labels = connected_components_min_label(
        confirmed.select("doc_a", "doc_b").localCheckpoint())
    new_ids = new_docs.select(F.col(id_col).alias("doc")).distinct()
    # components touching ANY corpus doc: every new member drops
    corpus_comps = (labels.join(corpus_nodes, "doc")
                          .select("label").distinct())
    new_labeled = labels.join(new_ids, "doc")
    reps = (new_labeled.join(corpus_comps, "label", "left_anti")
            .groupBy("label").agg(F.min("doc").alias("rep")))
    drops = (new_labeled.join(corpus_comps, "label", "left_semi")
             .select("doc")
             .union(new_labeled.join(reps, "label")
                    .where(F.col("doc") != F.col("rep"))
                    .select("doc"))
             .distinct()
             .withColumnRenamed("doc", id_col)
             # drops is duplicate-ids-only (bounded by the candidate
             # set); pinning it here lets the caller unpersist/retire
             # every upstream frame (banded batch, cross candidates)
             # without the returned survivor plan re-running the
             # probe joins on its next action
             .localCheckpoint())
    return new_docs.join(F.broadcast(drops), id_col, "left_anti")


def dedup_minhash_incremental(spark, new_docs: DataFrame,
                              index_path: str,
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              threshold: float = 0.8,
                              append: bool = False) -> DataFrame:
    """New-batch rows that survive near-dedup against BOTH the
    persisted corpus index and the batch itself.

    Hashing parameters come from the index's own ``params`` table —
    probing with mismatched (k, num_hashes, bands) can't happen.
    With ``append=True`` the *entire batch* (survivors and duplicates
    alike — see the module docstring for why) is appended to the
    index after the decision."""
    p = read_minhash_params(spark, index_path)
    k, num_hashes, bands = p["k"], p["num_hashes"], p["bands"]
    num_buckets = p["num_buckets"]

    # resume semantics first: ids the index has already seen are not
    # "new" (re-running a batch is a no-op, and append stays
    # duplicate-free).  The seen-id scan is partition-pruned to the
    # batch's own dbkt values; the anti-join's left side is the small
    # batch.
    batch_bkts = sorted(r["b"] for r in new_docs.select(
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_buckets))
        .alias("b")).distinct().collect())
    seen = (spark.read.parquet(index_path + "/docs")
            .where(F.col("dbkt").isin(batch_bkts))
            .select(F.col("doc").alias(id_col)))
    # persist the anti-joined batch: it is read by the banding
    # kernel, the Jaccard verify union, and the survivor-id
    # computation — without this each consumer re-runs the seen-id
    # index scan + anti-join (3 redundant probe-side jobs; the batch
    # is small by construction, so the cache is bounded by the delta,
    # not the corpus)
    orig = new_docs
    new_docs = new_docs.join(seen, id_col, "left_anti").persist()

    nb = _banded(new_docs, id_col, text_col, k, num_hashes,
                 bands).persist()
    # in-batch candidates: band-bucket self-join, (a < b) pairs
    a, b = nb.alias("a"), nb.alias("b")
    batch_cands = (
        a.join(b, on=[F.col("a.band") == F.col("b.band"),
                      F.col("a.bucket") == F.col("b.bucket"),
                      F.col("a.doc") < F.col("b.doc")])
         .select(F.col("a.doc").alias("doc_a"),
                 F.col("b.doc").alias("doc_b"))
         .distinct())
    cross = cross_candidates(spark, nb, index_path,
                             num_buckets).persist()

    # corpus text for candidate docs only: partition-pruned by the
    # dbkt values riding on the matched band rows, then a broadcast
    # semi-join down to exactly the candidate ids
    cand_corpus = (cross.select(F.col("doc_a").alias("doc"), "dbkt_a")
                        .distinct())
    dbkts = sorted({r["dbkt_a"] for r in
                    cand_corpus.select("dbkt_a").distinct().collect()})
    corpus_texts = (
        spark.read.parquet(index_path + "/docs")
        .where(F.col("dbkt").isin(dbkts))
        .join(F.broadcast(cand_corpus.select("doc")), "doc", "left_semi")
        .select(F.col("doc").alias(id_col), F.col("text").alias(text_col)))

    union_df = corpus_texts.unionByName(
        new_docs.select(id_col, text_col))
    all_cands = (batch_cands
                 .unionByName(cross.select("doc_a", "doc_b"))
                 .distinct())
    pins: list = []
    confirmed = jaccard_verify(union_df, all_cands, id_col, text_col,
                               k, threshold, pinned=pins)
    survivors = _corpus_wins_survivors(
        new_docs, confirmed, cand_corpus.select("doc").distinct(),
        id_col)
    # Pin only the survivor ID SET (tiny — ids, not texts: an eager
    # checkpoint of the survivor rows measured 0.9 s/pass slower at
    # bench scale) and hand back a broadcast semi-join of the
    # CALLER's own input against it.  The returned plan reads neither
    # the index nor any cache released below, so (a) every
    # probe-side persist can be dropped — a repeated-delta ingest
    # loop previously leaked one cached batch frame per call (ADVICE
    # r8) — and (b) the append-mode index mutation can't be observed
    # by the result.
    kept = survivors.select(id_col).localCheckpoint()
    survivors = orig.join(F.broadcast(kept), id_col, "left_semi")
    if append:
        # new_docs' plan reads index docs (the seen filter) —
        # checkpoint so the append doesn't read its own write target
        to_add = new_docs.localCheckpoint()
        write_minhash_index(to_add, index_path, id_col, text_col,
                            k=k, num_hashes=num_hashes, bands=bands,
                            num_buckets=num_buckets, mode="append")
    nb.unpersist()
    cross.unpersist()
    new_docs.unpersist()
    for p in pins:
        p.unpersist()
    return survivors


# ---------------------------------------------------------------------------
# Embedding near-dup, incremental: the same delta-batch contract over
# the persisted SRP layout (similarity.write_srp_index) — bucket-
# partitioned unit hyperplane signs instead of MinHash bands.
# ---------------------------------------------------------------------------


def embedding_near_dups_incremental(spark, new_embeddings: DataFrame,
                                    index_path: str, dim: int,
                                    id_col: str = "vec_id",
                                    vec_col: str = "embedding",
                                    threshold: float = 0.9,
                                    num_planes: int | None = None,
                                    append: bool = False) -> DataFrame:
    """New-batch vectors surviving embedding-cosine near-dedup
    against BOTH a persisted :func:`~.similarity.write_srp_index`
    corpus and the batch itself.

    The corpus side is a literal-bucket-pruned scan of the stored
    layout (projections and norms were paid at build time — the
    corpus never recomputes a plane); the batch side is hashed once
    and broadcast.  Components are resolved with the same
    corpus-wins rule as :func:`dedup_minhash_incremental`.  Identical
    vectors hash to identical buckets, so the seen-id resume filter
    also rides the pruned scan.

    ``num_planes=None`` (default) hashes the batch with the plane
    count the index RECORDED at build time (the only count that can
    route probes correctly); an explicit int is cross-checked and a
    mismatch raises.  The plane set is therefore pinned for the
    index's lifetime — when a growing corpus outruns its occupancy
    target (:func:`~.similarity.srp_auto_planes`), rebuild the index
    with ``num_planes="auto"`` rather than appending forever.  With
    ``append=True`` the batch is APPENDED into the bucket layout
    (``mode="append"`` — never an overwrite, which would drop the
    corpus rows sharing the batch's buckets)."""
    from trial_data_ingestion_spark.functions.vector import (
        dot_fixed, l2_norm_fixed,
    )
    from trial_data_ingestion_spark.operators.similarity import (
        _index_planes, srp_bucket, write_srp_index,
    )

    num_planes = _index_planes(spark, index_path, num_planes, dim)
    nb = (new_embeddings
          .select(F.col(id_col).alias("doc"),
                  F.col(vec_col).alias("v"),
                  l2_norm_fixed(vec_col, dim).alias("nrm"),
                  srp_bucket(vec_col, dim, num_planes).alias("bucket"))
          .persist())
    buckets = sorted(r["bucket"] for r in
                     nb.select("bucket").distinct().collect())
    idx = (spark.read.parquet(index_path)
           .where(F.col("bucket").isin(buckets))
           .select(F.col(id_col).alias("doc"),
                   F.col(vec_col).alias("v"),
                   F.col("__nrm").alias("nrm"), "bucket"))

    # resume: ids already stored are not "new"
    seen = idx.select(F.col("doc").alias(id_col)).distinct()
    orig = new_embeddings
    new_embeddings = new_embeddings.join(seen, id_col, "left_anti")
    nb_fresh = nb.join(seen.withColumnRenamed(id_col, "doc"), "doc",
                       "left_anti")

    a, b = nb_fresh.alias("a"), nb_fresh.alias("b")
    batch_pairs = (
        a.join(b, on=[F.col("a.bucket") == F.col("b.bucket"),
                      F.col("a.doc") < F.col("b.doc")])
         .withColumn("cos", dot_fixed("a.v", "b.v", dim)
                     / (F.col("a.nrm") * F.col("b.nrm")))
         .where(F.col("cos") >= threshold)
         .select(F.col("a.doc").alias("doc_a"),
                 F.col("b.doc").alias("doc_b")))
    cross_pairs = (
        idx.alias("c").join(F.broadcast(nb_fresh.alias("n")),
                            on=[F.col("c.bucket") == F.col("n.bucket"),
                                F.col("c.doc") != F.col("n.doc")])
           .withColumn("cos", dot_fixed("c.v", "n.v", dim)
                       / (F.col("c.nrm") * F.col("n.nrm")))
           .where(F.col("cos") >= threshold)
           .select(F.col("c.doc").alias("doc_a"),
                   F.col("n.doc").alias("doc_b"))
           .distinct())
    corpus_nodes = cross_pairs.select(F.col("doc_a").alias("doc")) \
                              .distinct()
    confirmed = batch_pairs.unionByName(cross_pairs).distinct()
    survivors = _corpus_wins_survivors(new_embeddings, confirmed,
                                       corpus_nodes, id_col)
    # same contract as dedup_minhash_incremental: pin the survivor id
    # set, return a broadcast semi-join over the caller's input —
    # index-free and cache-free, so nothing cached outlives the call
    kept = survivors.select(id_col).localCheckpoint()
    survivors = orig.join(F.broadcast(kept), id_col, "left_semi")
    if append:
        to_add = new_embeddings.localCheckpoint()
        write_srp_index(to_add, index_path, dim, id_col=id_col,
                        vec_col=vec_col, num_planes=num_planes,
                        mode="append")
    nb.unpersist()
    return survivors


def compact_minhash_index(spark, index_path: str, out_path: str) -> None:
    """Rewrite an append-accumulated index at ``index_path`` into a
    fresh layout at ``out_path`` with one file per partition again.

    Frequent small delta appends leave each ``pbkt``/``dbkt``
    directory holding one file per append; probe cost grows with
    file count, not data.  Compaction is a pure re-write (no
    re-hashing — signatures are already stored), so it is cheap
    enough to schedule periodically.  Writing to a NEW root keeps
    the operation atomic-by-rename for the caller and sidesteps
    Spark's cached-listing hazards of in-place rewrites (see
    ``write_minhash_index``)."""
    if out_path.rstrip("/") == index_path.rstrip("/"):
        raise ValueError(
            "compact_minhash_index: out_path must differ from "
            "index_path (atomic swap by rename is the caller's step)")
    bands = spark.read.parquet(index_path + "/bands")
    (bands.repartition("pbkt")
          .write.mode("overwrite").partitionBy("pbkt")
          .parquet(out_path + "/bands"))
    docs = spark.read.parquet(index_path + "/docs")
    (docs.repartition("dbkt")
         .write.mode("overwrite").partitionBy("dbkt")
         .parquet(out_path + "/docs"))
    (spark.read.parquet(index_path + "/params")
     .coalesce(1).write.mode("overwrite").parquet(out_path + "/params"))
    for sub in ("/bands", "/docs", "/params"):
        spark.catalog.refreshByPath(out_path + sub)
