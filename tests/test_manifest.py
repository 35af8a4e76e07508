"""Release-manifest integrity: order-invariance, tamper detection,
file round-trip, and aggregate plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from trial_data_ingestion_spark.sinks.manifest import (
    manifest, read_manifest, verify_manifest, write_manifest,
)

ROWS = [(i, f"doc {i}", ["a", "b", "c"][i % 3]) for i in range(60)]
SCHEMA = "doc_id long, text string, grp string"


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, SCHEMA)


def test_manifest_is_order_and_layout_invariant(spark):
    base = manifest(_df(spark), ["grp"]).collect()
    jumbled = manifest(
        _df(spark, list(reversed(ROWS))).repartition(7), ["grp"]
    ).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, jumbled))
    assert {r.grp: r.n_rows for r in base} == {"a": 20, "b": 20, "c": 20}


def test_verify_clean_copy_is_empty(spark):
    exp = manifest(_df(spark), ["grp"])
    assert verify_manifest(_df(spark).repartition(3), ["grp"],
                           exp).count() == 0


def test_verify_names_each_divergence(spark):
    exp = manifest(_df(spark), ["grp"])
    df = _df(spark)
    tampered = (
        df.where("grp != 'a' or doc_id != 0")          # drop a row: row_count
        .withColumn("text", F.when(
            (F.col("grp") == "b") & (F.col("doc_id") == 1),
            F.lit("EDITED")).otherwise(F.col("text")))  # edit: content
        .where("grp != 'c'")                            # whole grp: missing
        .unionByName(_df(spark, [(99, "new", "d")]))    # new grp: unexpected
    )
    got = {r.grp: r.status
           for r in verify_manifest(tampered, ["grp"], exp).collect()}
    assert got == {"a": "row_count", "b": "content", "c": "missing",
                   "d": "unexpected"}


def test_duplicate_rows_change_the_hash(spark):
    """A XOR fold would cancel a duplicated row pair; the decimal sum
    must not."""
    exp = manifest(_df(spark), ["grp"])
    dup_row = [r for r in ROWS if r[2] == "a"][0]
    duped = _df(spark, ROWS + [dup_row])
    got = {r.grp: r.status
           for r in verify_manifest(duped, ["grp"], exp).collect()}
    assert got == {"a": "row_count"}
    # same count but doubled row vs two distinct rows -> content
    twist = [r for r in ROWS if not (r[2] == "a" and r[0] == 3)]
    duped_same_n = _df(spark, twist + [dup_row])
    got2 = {r.grp: r.status
            for r in verify_manifest(duped_same_n, ["grp"],
                                     exp).collect()}
    assert got2 == {"a": "content"}


def test_null_vs_empty_string_differ(spark):
    a = spark.createDataFrame([(1, None)], "id long, v string")
    b = spark.createDataFrame([(1, "")], "id long, v string")
    assert verify_manifest(b, [], manifest(a, [])).count() == 1


def test_whole_table_manifest_and_validation(spark):
    m = manifest(_df(spark), []).collect()
    assert len(m) == 1 and m[0].n_rows == 60
    with pytest.raises(ValueError, match="no data columns"):
        manifest(_df(spark).select("grp"), ["grp"])


def test_file_round_trip(spark, tmp_path):
    path = str(tmp_path / "manifest.json")
    write_manifest(_df(spark), ["grp"], path)
    loaded = read_manifest(spark, path, ["grp"])
    assert verify_manifest(_df(spark), ["grp"], loaded).count() == 0
    with pytest.raises(ValueError, match="covers partitions"):
        read_manifest(spark, path, ["other"])


def test_training_shard_release_is_verifiable(spark, tmp_path):
    """The release flow: export shards, manifest the export, a later
    reader proves integrity from the written files alone."""
    from trial_data_ingestion_spark.sinks.training_export import (
        write_training_shards,
    )
    out = str(tmp_path / "shards")
    docs = _df(spark)
    write_training_shards(docs, out, key_col="doc_id", n_shards=4)
    exported = spark.read.parquet(out)
    mpath = str(tmp_path / "release.json")
    write_manifest(exported, ["shard"], mpath)
    reread = spark.read.parquet(out)
    assert verify_manifest(
        reread, ["shard"],
        read_manifest(spark, mpath, ["shard"])).count() == 0


def test_manifest_plan_partial_aggregates_with_one_exchange(spark):
    """The pass over the data must be a map-side-combined aggregate:
    HashAggregate pair around exactly one Exchange — constant output
    per partition, no sort, no join on the data path."""
    plan = manifest(_df(spark), ["grp"])._jdf.queryExecution() \
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("simple"))
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan
    assert "SortMergeJoin" not in plan and "Sort " not in plan

def test_manifest_property_roundtrip(spark, tmp_path):
    """Hypothesis-generated tables (unicode, nulls, negative and
    extreme longs) must verify clean through the file round-trip and
    flag any single-row edit."""
    from hypothesis import given, settings, strategies as st

    text = st.one_of(st.none(), st.text(max_size=20))
    longs = st.one_of(st.none(),
                      st.integers(min_value=-2**63, max_value=2**63 - 1))
    row = st.tuples(st.integers(0, 10**6), text, longs,
                    st.sampled_from(["p", "q"]))
    case_counter = [0]

    @settings(max_examples=8, deadline=None)
    @given(st.lists(row, min_size=1, max_size=12, unique_by=lambda r: r[0]))
    def check(rows):
        case_counter[0] += 1
        df = spark.createDataFrame(
            rows, "id long, t string, v long, part string")
        path = str(tmp_path / f"m{case_counter[0]}.json")
        write_manifest(df, ["part"], path)
        loaded = read_manifest(spark, path, ["part"])
        assert verify_manifest(df, ["part"], loaded).count() == 0
        # flip one row's id: its partition must flag as divergent
        rid, _, _, rpart = rows[0]
        edited = spark.createDataFrame(
            [(rid + 10**7, *rows[0][1:])] + rows[1:],
            "id long, t string, v long, part string")
        bad = verify_manifest(edited, ["part"], loaded).collect()
        assert [r.part for r in bad] == [rpart]
        assert bad[0].status == "content"

    check()
