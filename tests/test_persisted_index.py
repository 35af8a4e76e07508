"""Persisted ANN index layouts (VERDICT r3 #2): build the cell/bucket
assignment ONCE, answer query batches against the stored layout.  The
tests pin the three properties that make it an index rather than a
scan at 100 TB:

* value parity — the over-index query returns exactly what the
  on-the-fly operator (and the DuckDB oracle) returns;
* partition pruning — the re-query reads ONLY the probed cell/bucket
  directories (asserted on ``inputFiles()`` and ``PartitionFilters``);
* no corpus-side recompute — the re-query plan contains no centroid
  crossJoin and no SRP ``zip_with`` projection over the index.
"""

from __future__ import annotations

import pytest

import re

from pyspark.sql import functions as F

from tests.conftest import SF_DIR_ORACLE
from tests.oracle_harness import compare, run_oracle


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR_ORACLE}/embeddings.parquet")


def _queries(spark):
    return (_emb(spark).where(F.col("vec_id").isin(0, 1, 2))
            .select(F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("query_vec")))


def _plan(spark, df, mode="simple"):
    jmode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString(mode)
    return df._jdf.queryExecution().explainString(jmode)


def _touched_partitions(scan_df, key):
    """Distinct <key>=N partition-directory values among the files an
    EXECUTED scan actually reads (``input_file_name`` is assigned at
    read time, so pruned partitions never appear — unlike
    ``inputFiles()``, which lists the relation's full pre-pruning
    file index)."""
    rows = (scan_df.select(F.input_file_name().alias("f"))
            .distinct().collect())
    vals = set()
    for r in rows:
        m = re.search(rf"{key}=(\d+)", r.f)
        if m:
            vals.add(int(m.group(1)))
    return vals


@pytest.mark.slow
def test_ivf_index_matches_q31_oracle(spark, tmp_path):
    """The q31-shaped query over the persisted layout must hash-match
    the same DuckDB oracle as the on-the-fly q31 (same placeholder
    centroids, k=5, nprobe=4)."""
    from trial_data_ingestion_spark.operators.similarity import (
        first_id_centroids, topk_ivf_over_index, write_ivf_index,
    )
    from trial_data_ingestion_spark.plans import ORACLE
    emb = _emb(spark)
    cents = first_id_centroids(emb, 16)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, cents, path)
    out = topk_ivf_over_index(spark, path, _queries(spark), cents,
                              k=5, nprobe=4)
    out = out.select("query_id", "neighbor_id",
                     F.round("score", 6).alias("score"),
                     F.col("rank").cast("long").alias("rank"))
    odf = run_oracle(ORACLE["q31_ivf_topk"], SF_DIR_ORACLE)
    problems = compare(out, odf)
    assert not problems, "; ".join(problems)


@pytest.mark.slow
def test_ivf_index_append_matches_full_rebuild(spark, tmp_path):
    """Index built from half the corpus + append_to_ivf_index of the
    other half must answer queries IDENTICALLY to a one-shot build
    over everything (same centroids — assignment is deterministic,
    and the query path doesn't care which write placed a row)."""
    from trial_data_ingestion_spark.operators.similarity import (
        append_to_ivf_index, first_id_centroids, topk_ivf_over_index,
        write_ivf_index,
    )
    emb = _emb(spark)
    cents = first_id_centroids(emb, 16)
    full_path = str(tmp_path / "ivf_full")
    inc_path = str(tmp_path / "ivf_inc")
    write_ivf_index(emb, cents, full_path)
    write_ivf_index(emb.where("vec_id % 2 = 0"), cents, inc_path)
    append_to_ivf_index(emb.where("vec_id % 2 = 1"), cents, inc_path)
    q = _queries(spark)
    want = {(r["query_id"], r["neighbor_id"], r["rank"],
             round(r["score"], 9)) for r in
            topk_ivf_over_index(spark, full_path, q, cents,
                                k=5, nprobe=4).collect()}
    got = {(r["query_id"], r["neighbor_id"], r["rank"],
            round(r["score"], 9)) for r in
           topk_ivf_over_index(spark, inc_path, q, cents,
                               k=5, nprobe=4).collect()}
    assert got == want and len(got) > 0
    # appended rows landed in their own delta, same cell values (the
    # r9 delta level makes the append retryable; cell pruning is
    # below it)
    import glob as _glob
    import os
    deltas = [d for d in os.listdir(inc_path) if d.startswith("delta=")]
    assert len(deltas) == 2                   # base + one append
    cells = {os.path.basename(d) for d in
             _glob.glob(f"{inc_path}/delta=*/cell_id=*")}
    assert 0 < len(cells) <= 16


def test_ivf_index_prunes_to_probed_cells(spark, tmp_path):
    """Re-query must read only the probed cell partitions (static
    pruning from literal cell ids) and do no centroid work on the
    corpus side — no crossJoin of any flavor in the plan."""
    from trial_data_ingestion_spark.operators.similarity import (
        kmeans_centroids, topk_ivf_over_index, write_ivf_index,
    )
    emb = _emb(spark)
    cents = kmeans_centroids(emb, num_cells=16, seed=42)
    path = str(tmp_path / "ivf_index")
    write_ivf_index(emb, cents, path, dim=64)
    out = topk_ivf_over_index(spark, path, _queries(spark), cents,
                              k=5, nprobe=3, dim=64)
    plan = _plan(spark, out, "formatted")
    assert "PartitionFilters" in plan and "cell_id" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert out.count() == 15
    # execution-real pruning check: a scan with the same literal cell
    # filter touches only the probed partition directories
    from trial_data_ingestion_spark.operators.similarity import (
        _nearest_cells,
    )
    probed = _nearest_cells(_queries(spark), cents, "query_vec",
                            "query_id", 3, 64)
    cells = {r.cell_id for r in probed.select("cell_id").collect()}
    # 3 queries x nprobe=3 probe at most 9 distinct cells of 16
    assert len(cells) <= 9 < 16
    idx = (spark.read.parquet(path)
           .where(F.col("cell_id").isin(sorted(cells))))
    touched = _touched_partitions(idx, "cell_id")
    assert touched == cells


def test_srp_index_no_bucket_recompute(spark, tmp_path):
    """The persisted-SRP re-query must not recompute bucket
    projections over the corpus (no zip_with in the plan — the only
    vector math left is the element_at rescore) and must read only
    the probed bucket partitions."""
    from trial_data_ingestion_spark.operators.similarity import (
        topk_lsh, topk_lsh_over_index, write_srp_index,
    )
    emb = _emb(spark)
    path = str(tmp_path / "srp_index")
    write_srp_index(emb, path, dim=64, num_planes=8)
    qs = _queries(spark)
    out = topk_lsh_over_index(spark, path, qs, dim=64, k=5,
                              num_planes=8, multiprobe_hamming=1)
    plan = _plan(spark, out, "formatted")
    assert "zip_with" not in plan
    assert "PartitionFilters" in plan and "bucket" in plan
    # execution-real pruning: recompute the probe-bucket set and scan
    # with the same literal filter — only those directories are read
    from trial_data_ingestion_spark.operators.similarity import (
        srp_bucket,
    )
    base = [r.b for r in
            qs.select(srp_bucket("query_vec", 64, 8).alias("b"))
              .collect()]
    probes = {b ^ x for b in base
              for x in [0] + [1 << p for p in range(8)]}
    # 3 queries x (1 + 8 probes) reach at most 27 buckets of 256
    assert len(probes) <= 27 < 256
    idx = (spark.read.parquet(path)
           .where(F.col("bucket").isin(sorted(probes))))
    touched = _touched_partitions(idx, "bucket")
    assert touched <= probes
    assert 0 < len(touched) < 256
    # identical results to the on-the-fly operator
    live = topk_lsh(emb, qs, dim=64, k=5, num_planes=8,
                    multiprobe_hamming=1)
    key = lambda df: {(r.query_id, r.rank): (r.neighbor_id,
                                             round(r.score, 9))
                      for r in df.collect()}
    assert key(out) == key(live)


def test_srp_index_matches_q27_oracle(spark, tmp_path):
    """And the q27-shaped query over the persisted layout hash-matches
    q27's DuckDB oracle (inlined-plane buckets)."""
    from trial_data_ingestion_spark.operators.similarity import (
        topk_lsh_over_index, write_srp_index,
    )
    from trial_data_ingestion_spark.plans import ORACLE
    emb = _emb(spark)
    path = str(tmp_path / "srp_index")
    write_srp_index(emb, path, dim=64, num_planes=8)
    out = topk_lsh_over_index(spark, path, _queries(spark), dim=64,
                              k=5, num_planes=8, multiprobe_hamming=1)
    out = out.select("query_id", "neighbor_id",
                     F.round("score", 6).alias("score"),
                     F.col("rank").cast("long").alias("rank"))
    odf = run_oracle(ORACLE["q27_lsh_topk"], SF_DIR_ORACLE)
    problems = compare(out, odf)
    assert not problems, "; ".join(problems)


def test_srp_index_metadata_round_trip(spark, tmp_path):
    """Round-8: write_srp_index(num_planes='auto') sizes p by the
    occupancy rule and records it (plus dim) in the _srp_meta sidecar;
    the probe defaults to the recorded count (num_planes=None), an
    explicit matching count agrees, a conflicting one raises, and the
    sidecar is invisible to parquet readers of the index root."""
    import pytest

    from trial_data_ingestion_spark.operators.similarity import (
        read_srp_index_meta, srp_auto_planes, topk_lsh_over_index,
        write_srp_index,
    )
    emb = _emb(spark)
    path = str(tmp_path / "srpauto")
    write_srp_index(emb, path, dim=64, num_planes="auto")
    p = srp_auto_planes(emb.count())
    assert read_srp_index_meta(spark, path) == {"num_planes": p,
                                                "dim": 64}
    # the sidecar never leaks into the data: index root reads see
    # exactly the vector columns (+ the r9 delta partition level)
    assert set(spark.read.parquet(path).columns) \
        == set(emb.columns) | {"__nrm", "bucket", "delta"}
    qs = _queries(spark)
    by_meta = topk_lsh_over_index(spark, path, qs, dim=64, k=5).collect()
    assert len(by_meta) > 0
    explicit = topk_lsh_over_index(spark, path, qs, dim=64, k=5,
                                   num_planes=p).collect()
    assert sorted(map(tuple, by_meta)) == sorted(map(tuple, explicit))
    with pytest.raises(ValueError, match="rebuild to resize"):
        topk_lsh_over_index(spark, path, qs, dim=64, k=5,
                            num_planes=p + 1)
    with pytest.raises(ValueError, match="recorded plane"):
        topk_lsh_over_index(spark, path, qs, dim=64, k=5,
                            num_planes="auto")
    with pytest.raises(ValueError, match="num_planes"):
        write_srp_index(emb, str(tmp_path / "bad"), dim=64,
                        num_planes=True)


def test_srp_meta_corrupt_sidecar_raises_not_default(spark, tmp_path):
    """ADVICE r9: a sidecar that EXISTS but is unreadable must raise,
    not silently fall back to the default 8 planes (the exact
    misrouting the sidecar was built to prevent).  A genuinely missing
    sidecar still reads as None (pre-metadata index)."""
    import glob
    import os

    import pytest

    from trial_data_ingestion_spark.operators.similarity import (
        read_srp_index_meta, write_srp_index,
    )
    emb = _emb(spark)
    path = str(tmp_path / "srpmeta")
    write_srp_index(emb, path, dim=64, num_planes=6)
    assert read_srp_index_meta(spark, path) == {"num_planes": 6,
                                                "dim": 64}
    # corrupt the sidecar in place (garbage JSON -> _corrupt_record);
    # drop the local-FS checksum files or the read dies earlier with
    # a ChecksumException (which would ALSO propagate, but the corrupt
    # -content branch is the one under test)
    for f in glob.glob(f"{path}/_srp_meta/part-*.json"):
        with open(f, "w") as fh:
            fh.write("{not json at all")
    for f in glob.glob(f"{path}/_srp_meta/.*.crc"):
        os.remove(f)
    spark.catalog.refreshByPath(path + "/_srp_meta")
    with pytest.raises(ValueError, match="corrupt _srp_meta"):
        read_srp_index_meta(spark, path)
    # a MISSING sidecar is the documented pre-metadata case
    os.system(f"rm -rf {path}/_srp_meta")
    spark.catalog.refreshByPath(path + "/_srp_meta")
    assert read_srp_index_meta(spark, path) is None


def test_ivf_append_retry_is_idempotent(spark, tmp_path):
    """VERDICT r9 item 4: retrying a delta-keyed append_to_ivf_index
    call leaves the index unchanged (the delta overwrites itself),
    and query answers stay identical to the single-append state."""
    from trial_data_ingestion_spark.operators.similarity import (
        append_to_ivf_index, first_id_centroids, topk_ivf_over_index,
        write_ivf_index,
    )
    emb = _emb(spark)
    cents = first_id_centroids(emb, 16)
    path = str(tmp_path / "ivf_retry")
    write_ivf_index(emb.where("vec_id % 2 = 0"), cents, path)
    append_to_ivf_index(emb.where("vec_id % 2 = 1"), cents, path,
                        delta_id="b0001")
    n = spark.read.parquet(path).count()
    q = _queries(spark)
    want = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in
            topk_ivf_over_index(spark, path, q, cents,
                                k=5, nprobe=4).collect()}
    append_to_ivf_index(emb.where("vec_id % 2 = 1"), cents, path,
                        delta_id="b0001")
    assert spark.read.parquet(path).count() == n
    got = {(r["query_id"], r["neighbor_id"], r["rank"]) for r in
           topk_ivf_over_index(spark, path, q, cents,
                               k=5, nprobe=4).collect()}
    assert got == want
