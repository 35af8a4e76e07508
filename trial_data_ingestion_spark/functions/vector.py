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
