"""Vector distance expressions over ``array<float>`` columns (E6).

The reference configures cosine / l2 / ip on its vector store
(vectorstores/chroma_store.py:13,28-31) but computes nothing itself;
here they are native higher-order-function expressions so similarity
queries stay inside whole-stage codegen — no Python in the hot path.

All arithmetic is done in double precision with a strict left-to-right
``aggregate`` fold, which makes results deterministic regardless of
partitioning (the fold happens per-row, not across rows).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length float arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        a, F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.zip_with(a, b, lambda x, y:
                   (x.cast("double") - y.cast("double"))
                   * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ))


def inner_product(a: Column, b: Column) -> Column:
    """'ip' distance space of the reference's store = raw dot product."""
    return dot(a, b)


# --------------------------------------------------------------------------
# Fixed-dimension variants — unrolled, whole-stage-codegen'd
# --------------------------------------------------------------------------
# Spark's higher-order functions (aggregate/zip_with) are interpreted,
# not codegen'd: on an all-pairs workload (near-dup detection scores
# millions of pairs) the interpreter overhead dominates by ~50x.  When
# the embedding dimension is known statically — it always is for a
# given embedding column — the fold unrolls into a flat sum of
# element_at products that runs inside whole-stage codegen, keeping
# even all-pairs scoring JVM-side with no Python/Arrow transfer.
#
# Each function accepts either a Column or a SQL fragment (column
# name / qualified "alias.col").  PASS STRINGS IN HOT BUILD PATHS:
# the string form renders the whole unrolled expression as one SQL
# text and parses it with a single F.expr py4j round-trip, where the
# Column form issues ~6 gateway calls per dimension (measured ~3 s of
# driver-side build time per 64-dim cosine at dim=64 — more than the
# query's own runtime).  Both forms parse/build to the identical
# Catalyst tree, so results and oracle hashes are unaffected.

def _e(v: Column, i: int) -> Column:
    return F.element_at(v, i).cast("double")


def _esql(v: str, i: int) -> str:
    return f"CAST(element_at({v}, {i}) AS DOUBLE)"


def dot_fixed(a, b, dim: int) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(" + ".join(
            f"{_esql(a, i)} * {_esql(b, i)}" for i in range(1, dim + 1)))
    out = _e(a, 1) * _e(b, 1)
    for i in range(2, dim + 1):
        out = out + _e(a, i) * _e(b, i)
    return out


def _l2_norm_sql(a: str, dim: int) -> str:
    return "SQRT(" + " + ".join(
        f"{_esql(a, i)} * {_esql(a, i)}" for i in range(1, dim + 1)) + ")"


def l2_norm_fixed(a, dim: int) -> Column:
    if isinstance(a, str):
        return F.expr(_l2_norm_sql(a, dim))
    out = _e(a, 1) * _e(a, 1)
    for i in range(2, dim + 1):
        out = out + _e(a, i) * _e(a, i)
    return F.sqrt(out)


def cosine_similarity_fixed(a, b, dim: int) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        dot_sql = " + ".join(
            f"{_esql(a, i)} * {_esql(b, i)}" for i in range(1, dim + 1))
        return F.expr(f"({dot_sql}) / ({_l2_norm_sql(a, dim)}"
                      f" * {_l2_norm_sql(b, dim)})")
    return dot_fixed(a, b, dim) / (l2_norm_fixed(a, dim)
                                   * l2_norm_fixed(b, dim))


def l2_distance_fixed(a, b, dim: int) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        terms = " + ".join(
            f"({_esql(a, i)} - {_esql(b, i)})"
            f" * ({_esql(a, i)} - {_esql(b, i)})"
            for i in range(1, dim + 1))
        return F.expr(f"SQRT({terms})")
    d = _e(a, 1) - _e(b, 1)
    out = d * d
    for i in range(2, dim + 1):
        d = _e(a, i) - _e(b, i)
        out = out + d * d
    return F.sqrt(out)
