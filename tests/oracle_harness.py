"""Local replica of the driver's DuckDB-oracle differential check.

Compares a Spark query result with its oracle SQL run by DuckDB on the
same parquet tables: row count, column names, and an order-insensitive
value comparison (sorted rows, approximate float equality) — a strict
superset of what must hold for the driver's value-hash to match.
"""

from __future__ import annotations

import math

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def run_oracle(sql: str, sf_dir: str):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def _norm_cell(v):
    if v is None:
        return ("n",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", round(v, 9))
    try:
        import pandas as pd
        if v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
            return ("n",)
    except Exception:
        pass
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return ("a", tuple(_norm_cell(x) for x in v))
    return (type(v).__name__[0], v)


def _normalize(df):
    import pandas as pd
    cols = sorted(df.columns)
    rows = []
    for rec in df[cols].itertuples(index=False):
        rows.append(tuple(_norm_cell(v if not (isinstance(v, float) and
                                               pd.isna(v)) else None)
                          for v in rec))
    return cols, sorted(rows)


def compare(spark_df, oracle_pdf) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems = []
    spdf = spark_df.toPandas()
    if len(spdf) != len(oracle_pdf):
        problems.append(f"row count: spark={len(spdf)} oracle={len(oracle_pdf)}")
    scols, srows = _normalize(spdf)
    ocols, orows = _normalize(oracle_pdf)
    if scols != ocols:
        problems.append(f"columns: spark={scols} oracle={ocols}")
        return problems
    if srows != orows:
        n = 0
        for a, b in zip(srows, orows):
            if a != b:
                problems.append(f"row diff: spark={a} oracle={b}")
                n += 1
                if n >= 5:
                    break
        if not problems:
            problems.append("row multiset mismatch (length tail)")
    return problems
