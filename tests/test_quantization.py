"""Product-quantization ANN: recall gates vs exact top-k, encode
determinism, compression accounting, persisted-index equivalence."""

from __future__ import annotations

import numpy as np
import pytest

from trial_data_ingestion_spark.operators.quantization import (
    PQCodebooks, encode_pq, read_pq_codebooks, topk_pq,
    topk_pq_over_index, train_pq_codebooks, write_pq_index,
)
from trial_data_ingestion_spark.operators.similarity import topk_bruteforce

DIM = 64


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    df.cache().count()
    return df


@pytest.fixture(scope="module")
def queries(spark, emb):
    rows = emb.orderBy("vec_id").limit(5).collect()
    return spark.createDataFrame(
        [(r["vec_id"], list(r["embedding"])) for r in rows],
        "query_id bigint, query_vec array<float>")


@pytest.fixture(scope="module")
def codebooks(emb):
    return train_pq_codebooks(emb, dim=DIM, m=8, k=64,
                              sample_size=1000, seed=7)


def _recall(approx, exact, k=10):
    a = {(r["query_id"], r["neighbor_id"]) for r in approx}
    e = {(r["query_id"], r["neighbor_id"]) for r in exact}
    return len(a & e) / len(e)


def test_train_shapes_and_determinism(emb):
    cb1 = train_pq_codebooks(emb, dim=DIM, m=8, k=16,
                             sample_size=400, seed=3)
    cb2 = train_pq_codebooks(emb, dim=DIM, m=8, k=16,
                             sample_size=400, seed=3)
    assert cb1.centroids.shape == (8, 16, 8)
    assert np.array_equal(cb1.centroids, cb2.centroids)


def test_train_rejects_indivisible_dim(emb):
    with pytest.raises(ValueError):
        train_pq_codebooks(emb, dim=DIM, m=7)


def test_encode_is_deterministic_and_bounded(emb, codebooks):
    enc = encode_pq(emb, codebooks).select("vec_id", "pq_code")
    rows1 = {r["vec_id"]: tuple(r["pq_code"]) for r in enc.collect()}
    rows2 = {r["vec_id"]: tuple(r["pq_code"]) for r in enc.collect()}
    assert rows1 == rows2
    assert all(len(c) == 8 for c in rows1.values())
    assert all(0 <= x < 64 for c in rows1.values() for x in c)
    # compression accounting: 8 codes of <=1 byte information vs
    # 64 float32 -> 32x nominal (stored as smallint here: 16x floor)
    assert len(rows1) == emb.count()


def test_pq_recall_vs_bruteforce(emb, queries, codebooks):
    """With refine at 8x k over a 500-vector corpus the PQ path must
    agree almost perfectly with the exact scan."""
    exact = topk_bruteforce(emb, queries, k=10, dim=DIM).collect()
    approx = topk_pq(emb, queries, codebooks, k=10,
                     refine_factor=8).collect()
    rec = _recall(approx, exact)
    assert rec >= 0.9, f"recall@10 {rec:.3f} < 0.9"


def test_pq_scores_are_exact_cosine(emb, queries, codebooks):
    """Refined scores are the EXACT cosine — for neighbors both paths
    agree on, the scores must match to double precision."""
    exact = {(r["query_id"], r["neighbor_id"]): r["score"]
             for r in topk_bruteforce(emb, queries, k=10,
                                      dim=DIM).collect()}
    approx = {(r["query_id"], r["neighbor_id"]): r["score"]
              for r in topk_pq(emb, queries, codebooks, k=10,
                               refine_factor=8).collect()}
    shared = set(exact) & set(approx)
    assert shared
    for key in shared:
        assert exact[key] == pytest.approx(approx[key], abs=1e-9)


def test_persisted_index_matches_inmemory(tmp_path, spark, emb,
                                          queries, codebooks):
    path = str(tmp_path / "pqidx")
    write_pq_index(emb, codebooks, path)
    cb2 = read_pq_codebooks(spark, path)
    assert np.array_equal(cb2.centroids, codebooks.centroids)
    assert (cb2.dim, cb2.metric) == (codebooks.dim, codebooks.metric)
    mem = topk_pq(emb, queries, codebooks, k=10,
                  refine_factor=4).collect()
    stored = topk_pq_over_index(spark, path, queries, k=10,
                                refine_factor=4).collect()
    assert sorted(map(tuple, mem)) == sorted(map(tuple, stored))


def test_l2_metric_path(spark, emb, queries):
    cb = train_pq_codebooks(emb, dim=DIM, m=8, k=64, metric="l2",
                            sample_size=1000, seed=7)
    exact = topk_bruteforce(emb, queries, k=10, metric="l2",
                            dim=DIM).collect()
    approx = topk_pq(emb, queries, cb, k=10, refine_factor=8).collect()
    rec = _recall(approx, exact)
    assert rec >= 0.9, f"l2 recall@10 {rec:.3f} < 0.9"


class TestIVFPQ:
    @pytest.fixture(scope="class")
    def index_path(self, tmp_path_factory, emb):
        from trial_data_ingestion_spark.operators.quantization import (
            build_ivfpq,
        )
        path = str(tmp_path_factory.mktemp("ivfpq") / "idx")
        build_ivfpq(emb, dim=DIM, path=path, num_cells=8, m=8, k=64,
                    sample_size=1000, seed=7)
        return path

    def test_recall_vs_bruteforce(self, spark, emb, queries, index_path):
        from trial_data_ingestion_spark.operators.quantization import (
            topk_ivfpq,
        )
        exact = topk_bruteforce(emb, queries, k=10, dim=DIM).collect()
        # the standard IVF recall/nprobe trade: half the cells probed
        # -> most neighbors; 3/4 probed -> nearly all (measured 0.78 /
        # 0.92 on this corpus)
        half = topk_ivfpq(spark, index_path, queries, k=10,
                          nprobe=4, refine_factor=8).collect()
        rec4 = _recall(half, exact)
        assert rec4 >= 0.75, f"ivfpq nprobe=4 recall {rec4:.3f} < 0.75"
        most = topk_ivfpq(spark, index_path, queries, k=10,
                          nprobe=6, refine_factor=8).collect()
        rec6 = _recall(most, exact)
        assert rec6 >= 0.9, f"ivfpq nprobe=6 recall {rec6:.3f} < 0.9"
        assert rec6 >= rec4

    def test_scan_is_partition_pruned(self, spark, queries, index_path):
        from pyspark.sql import functions as F
        probed = spark.read.parquet(index_path + "/codes") \
                      .where(F.col("cell_id").isin([0, 1]))
        plan = probed._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "cell_id" in plan
        # only the probed directories' files are actually read
        # (input_file_name is assigned at read time, post-pruning —
        # inputFiles() would list the full pre-pruning index)
        files = {r["f"] for r in probed.select(
            F.input_file_name().alias("f")).distinct().collect()}
        assert files and all("/cell_id=0/" in f or "/cell_id=1/" in f
                             for f in files)

    def test_scores_are_exact_cosine(self, spark, emb, queries,
                                     index_path):
        from trial_data_ingestion_spark.operators.quantization import (
            topk_ivfpq,
        )
        exact = {(r["query_id"], r["neighbor_id"]): r["score"]
                 for r in topk_bruteforce(emb, queries, k=10,
                                          dim=DIM).collect()}
        approx = {(r["query_id"], r["neighbor_id"]): r["score"]
                  for r in topk_ivfpq(spark, index_path, queries, k=10,
                                      nprobe=4,
                                      refine_factor=8).collect()}
        shared = set(exact) & set(approx)
        assert shared
        for key in shared:
            assert exact[key] == pytest.approx(approx[key], rel=1e-6)

    def test_full_probe_equals_bruteforce(self, spark, emb, queries,
                                          index_path):
        """nprobe = num_cells and refine over everything must recover
        the exact result — the index is lossless under full probe."""
        from trial_data_ingestion_spark.operators.quantization import (
            topk_ivfpq,
        )
        exact = topk_bruteforce(emb, queries, k=10, dim=DIM).collect()
        full = topk_ivfpq(spark, index_path, queries, k=10, nprobe=8,
                          refine_factor=50).collect()
        assert ({(r["query_id"], r["neighbor_id"], r["rank"])
                 for r in full}
                == {(r["query_id"], r["neighbor_id"], r["rank"])
                    for r in exact})


def test_pq_adc_scan_column_prunes_vectors(tmp_path, spark, emb,
                                           queries, codebooks):
    """The ADC pass over a persisted PQ index must read ONLY
    (id, pq_code) — the raw vector column stays untouched until the
    refine join (that's the 32x IO claim, visible in ReadSchema)."""
    from trial_data_ingestion_spark.operators.quantization import (
        write_pq_index,
    )
    path = str(tmp_path / "pq_prune")
    write_pq_index(emb, codebooks, path)
    stored = spark.read.parquet(path + "/codes")
    scan = stored.select("vec_id", "pq_code")
    plan = scan._jdf.queryExecution().executedPlan().toString()
    m = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert m and "pq_code" in m[0] and "embedding" not in m[0]
