"""Explicit StructTypes for every dataset the engine touches.

The reference is schemaless (dicts + pandas inference); the Spark
engine declares schemas so scans prune columns and readers reject
drift early (SURVEY.md §1.2).  All fields nullable to mirror the
reference's pervasive Optional fields (data_models/article.py:4-12).
"""

from __future__ import annotations

from pyspark.sql import types as T

# v1 Article row (data_models/article.py:4-12 + normalize.py:36-49);
# meta holds the original record as string pairs.
ARTICLE = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("doi", T.StringType()),
    T.StructField("url", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("full_text", T.StringType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

# Normalized section entry — the engine-wide flat representation of the
# reference's recursive sections dict (SURVEY.md §1.3): document-order
# (section_path, text) pairs with " / "-joined paths.
SECTION = T.StructType([
    T.StructField("section_path", T.StringType()),
    T.StructField("text", T.StringType()),
])

SECTIONS = T.ArrayType(SECTION)

# Canonical v2 fulltext record (fulltext_enricher.py:70-80) with
# normalized sections.
FULLTEXT_RECORD = T.StructType([
    T.StructField("doi", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("journal", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("pmcid", T.StringType()),
    T.StructField("sections", SECTIONS),
    T.StructField("abstract", T.StringType()),
])

# Parsed JATS article (sources/pmc.py:119-152 output shape).
PARSED_ARTICLE = T.StructType([
    T.StructField("pmcid", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("sections", SECTIONS),
    T.StructField("abstract", T.StringType()),
    T.StructField("error", T.StringType()),
])

# BibTeX entry after field extraction (doi_utils.py:30-48).
BIB_ENTRY = T.StructType([
    T.StructField("doi", T.StringType()),
    T.StructField("journal", T.StringType()),
    T.StructField("title", T.StringType()),
    T.StructField("doi_norm", T.StringType()),
])

# v1 chunk row (chunker_archived.py:37-49).
CHUNK_V1 = T.StructType([
    T.StructField("article_id", T.StringType()),
    T.StructField("chunk_id", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("n_tokens", T.IntegerType()),
    T.StructField("meta", T.StructType([
        T.StructField("title", T.StringType()),
        T.StructField("doi", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("source", T.StringType()),
    ])),
])

# Failure side-output (fulltext_enricher.py:199-232).
FAILURE = T.StructType([
    T.StructField("doi", T.StringType()),
    T.StructField("journal", T.StringType()),
    T.StructField("reason", T.StringType()),
])

# Embedding row (embedder_archived.py:20-25).
EMBEDDING = T.StructType([
    T.StructField("chunk_id", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("embedding", T.ArrayType(T.FloatType())),
    T.StructField("embedding_dim", T.IntegerType()),
])
