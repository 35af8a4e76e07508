"""Embedding operators E1-E5 (SURVEY.md §2.8).

The reference embeds chunk batches with SentenceTransformers or the
OpenAI API (``embeddings/embedders.py``).  Spark design: an encoder is
a plain ``encode(list[str]) -> list[list[float]]`` callable created
once per executor (lazy singleton inside ``mapInPandas``) — the
Arrow batch is the embed batch.  Offline default is a deterministic
hash-projection encoder (FIXTURES.md §7) so tests and CI need no
model; HF / OpenAI backends keep the reference's semantics behind
import guards.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, List

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

E5_PREFIX = "passage: "  # E3 — embedder_archived.py:12-18


class HashEmbedder:
    """Deterministic test-double encoder: bag-of-hashed-words.

    Each token deterministically selects a coordinate and sign from
    its md5; vectors are L2-normalized.  Stable across processes,
    partitions, and runs — the property the engine actually needs from
    E1 for its correctness tests (the reference's model choice is
    config, not semantics)."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def encode(self, texts: List[str]) -> List[List[float]]:
        out = []
        for t in texts:
            v = np.zeros(self.dim, dtype=np.float64)
            for tok in (t or "").lower().split():
                h = hashlib.md5(tok.encode()).digest()
                idx = int.from_bytes(h[:4], "big") % self.dim
                sign = 1.0 if h[4] & 1 else -1.0
                v[idx] += sign
            n = np.linalg.norm(v)
            if n > 0:
                v /= n
            out.append(v.astype(np.float32).tolist())
        return out


class HFEmbedder:
    """E1 — SentenceTransformer batch encoder (embedders.py:23-45).
    Import-guarded: unavailable in this environment."""

    def __init__(self, model_name: str = "all-MiniLM-L6-v2",
                 batch_size: int = 64):
        from sentence_transformers import SentenceTransformer
        self._model = SentenceTransformer(model_name)
        self._batch = batch_size

    def encode(self, texts: List[str]) -> List[List[float]]:
        return [v.tolist() for v in
                self._model.encode(texts, batch_size=self._batch)]


class OpenAIEmbedder:
    """E2 — OpenAI embeddings API (embedders.py:47-68). Import-guarded."""

    def __init__(self, model: str = "text-embedding-3-small",
                 batch_size: int = 64):
        from openai import OpenAI
        self._client = OpenAI()
        self._model = model
        self._batch = batch_size

    def encode(self, texts: List[str]) -> List[List[float]]:
        out: List[List[float]] = []
        for i in range(0, len(texts), self._batch):
            resp = self._client.embeddings.create(
                model=self._model, input=texts[i:i + self._batch])
            out.extend(d.embedding for d in resp.data)
        return out


def resolve_backend(name: str, **kwargs) -> Callable[[], object]:
    """E5 — backend registry (embedders.py:70-74) + offline default."""
    factories = {
        "hash": lambda: HashEmbedder(**kwargs),
        "hf": lambda: HFEmbedder(**kwargs),
        "openai": lambda: OpenAIEmbedder(**kwargs),
    }
    if name not in factories:
        raise ValueError(f"Unknown embed backend: {name}")
    return factories[name]


def embed_text(df: DataFrame, text_col: str,
               encoder_factory: Callable[[], object],
               prefix: str | None = None,
               output_col: str = "embedding") -> DataFrame:
    """E1/E3/E4 — attach ``embedding`` + ``embedding_dim`` columns.

    The encoder is constructed lazily once per Python worker (model
    load amortization, §4.3); the optional e5-style prefix is applied
    inside the kernel so the stored text stays unprefixed."""
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(output_col, T.ArrayType(T.FloatType())),
           T.StructField("embedding_dim", T.IntegerType())])
    cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        encoder = encoder_factory()
        for pdf in batches:
            texts = [(prefix + t if prefix and t else t) or ""
                     for t in pdf[text_col]]
            vecs = encoder.encode(texts)
            out = pdf[cols].copy()
            out[output_col] = vecs
            out["embedding_dim"] = [len(v) for v in vecs]
            yield out

    return df.mapInPandas(run, schema)
