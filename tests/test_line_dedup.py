"""Corpus-wide exact line dedup: known answers (cross-doc, within-doc,
eligibility, byte-preservation), an independent python reference over
real corpus data with constructed line structure, hash/string path
agreement, DuckDB parity, and the skew-proof plan shape."""

from __future__ import annotations

import duckdb

from tests.conftest import SF_DIR


def _py_line_dedup(texts: dict, min_chars: int) -> dict:
    """Independent reference: same semantics, plain python."""
    first = set()
    out = {}
    for d in sorted(texts):
        kept, removed = [], 0
        for line in texts[d].split("\n"):
            if len(line.strip()) < min_chars:
                kept.append(line)
            elif line in first:
                removed += 1
            else:
                first.add(line)
                kept.append(line)
        out[d] = ("\n".join(kept) if removed else texts[d], removed)
    return out


def test_line_dedup_known_answers(spark):
    from trial_data_ingestion_spark.operators.line_dedup import line_dedup

    banner = "accept all cookies to continue reading this site"
    rows = [
        (1, f"alpha article body text\n{banner}\nmore alpha prose"),
        (2, f"{banner}\nbeta article body text\n\nshort"),
        (3, f"gamma original content here\n{banner}"),
        (4, "totally unique document with no duplicated lines"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["text"], r["n_removed_lines"])
           for r in line_dedup(df, min_chars=10).collect()}
    # doc 1 holds the corpus-first occurrence — byte-identical
    assert out[1] == (rows[0][1], 0)
    # later occurrences lose exactly the banner line
    assert out[2] == ("beta article body text\n\nshort", 1)
    assert out[3] == ("gamma original content here", 1)
    assert out[4] == (rows[3][1], 0)


def test_line_dedup_eligibility_and_structure(spark):
    from trial_data_ingestion_spark.operators.line_dedup import line_dedup

    # short lines ("---", blanks) repeat across docs but are below
    # min_chars: never deduped.  Whitespace-distinct variants of an
    # eligible line are distinct keys.
    rows = [
        (1, "---\nthe quick brown fox jumps\n---\n"),
        (2, "---\nthe quick brown fox jumps\n---\n"),
        (3, "---\n  the quick brown fox jumps\n---\n"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: (r["text"], r["n_removed_lines"])
           for r in line_dedup(df, min_chars=5).collect()}
    assert out[1] == (rows[0][1], 0)
    # doc 2 loses the fox line but keeps both separators AND the
    # trailing empty segment (the join must preserve structure)
    assert out[2] == ("---\n---\n", 1)
    # doc 3's leading-whitespace variant is a distinct key — kept
    assert out[3] == (rows[2][1], 0)


def test_line_dedup_within_doc(spark):
    from trial_data_ingestion_spark.operators.line_dedup import line_dedup

    text = "repeated chorus line here\nverse one\nrepeated chorus line here"
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = line_dedup(df, min_chars=10).collect()[0]
    assert r["text"] == "repeated chorus line here\nverse one"
    assert r["n_removed_lines"] == 1


def test_line_dedup_matches_reference_on_corpus(spark):
    """Real-data cross-check: sf0.001 documents restructured into
    lines (sentence-ish splits), hashed and exact key paths both
    equal to the independent reference."""
    from trial_data_ingestion_spark.operators.line_dedup import line_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").collect()
    # build multi-line docs whose lines repeat across the corpus:
    # every doc contributes its 8-word chunks as lines
    texts = {}
    for r in docs:
        toks = r["text"].split()
        lines = [" ".join(toks[i:i + 8]) for i in range(0, len(toks), 8)]
        texts[r["doc_id"]] = "\n".join(lines)
    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")
    want = _py_line_dedup(texts, min_chars=10)
    assert any(n for _, n in want.values()), "fixture must exercise removal"
    for hash_lines in (True, False):
        got = {r["doc_id"]: (r["text"], r["n_removed_lines"])
               for r in line_dedup(df, min_chars=10,
                                   hash_lines=hash_lines).collect()}
        assert got == want, f"hash_lines={hash_lines}"


def test_line_dedup_duckdb_parity(spark):
    """Independent engine: DuckDB window-based first-occurrence
    dedup over the same constructed corpus equals the exact path."""
    from trial_data_ingestion_spark.operators.line_dedup import line_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text").limit(100).collect()
    texts = {}
    for r in docs:
        toks = r["text"].split()
        lines = [" ".join(toks[i:i + 6]) for i in range(0, len(toks), 6)]
        texts[r["doc_id"]] = "\n".join(lines)
    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")
    con = duckdb.connect()
    con.execute("create table docs(doc_id bigint, text varchar)")
    con.executemany("insert into docs values (?, ?)",
                    sorted(texts.items()))
    want = {d: (t, n) for d, t, n in con.execute("""
        WITH split AS (
          SELECT doc_id, string_split(text, chr(10)) AS parts FROM docs
        ), exploded AS (
          SELECT doc_id, unnest(parts) AS line,
                 unnest(range(1, len(parts) + 1)) AS i
          FROM split
        ), occ AS (
          SELECT doc_id, i - 1 AS pos, line,
                 CASE WHEN length(trim(line)) >= 10 THEN row_number()
                      OVER (PARTITION BY CASE WHEN length(trim(line)) >= 10
                                              THEN line END
                            ORDER BY doc_id, i) END AS rn
          FROM exploded
        )
        SELECT doc_id,
               coalesce(string_agg(line, chr(10) ORDER BY pos)
                        FILTER (WHERE rn IS NULL OR rn = 1), '') AS text,
               count(*) FILTER (WHERE rn > 1) AS n
        FROM occ GROUP BY doc_id
    """).fetchall()}
    got = {r["doc_id"]: (r["text"], r["n_removed_lines"])
           for r in line_dedup(df, min_chars=10,
                               hash_lines=False).collect()}
    assert got == want


def test_line_dedup_plan_shape(spark):
    """Scale gates: no Python anywhere, and the first-occurrence
    aggregate runs with map-side partial aggregation (paired
    HashAggregates on the line key), like substring_dedup."""
    from trial_data_ingestion_spark.operators.line_dedup import (
        duplicated_line_occurrences,
        line_dedup,
    )

    df = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plan = line_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Window" not in plan                  # no per-key sort
    occ_plan = duplicated_line_occurrences(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "partial_min" in occ_plan or "HashAggregate" in occ_plan
    assert "RoundRobinPartitioning" in occ_plan  # ensure_parallelism
