"""Unicode normalization for training-data hygiene.

Raw web/PDF text mixes canonically-equivalent byte sequences —
precomposed vs combining accents (NFC vs NFD), full-width ASCII,
ligatures, compatibility forms — which silently defeats exact/near
dedup, fingerprinting, and tokenizer vocabularies.  Training-data
pipelines normalize early (NFKC is the common choice; NFC when
compatibility folding is too lossy).

Spark has no built-in ICU normalizer, so this is the documented slow
path done right: an Arrow-batched ``pandas_udf`` over stdlib
``unicodedata.normalize`` — vectorized batch transfer, no
row-at-a-time Python — applied ONCE at ingest, after which every
downstream operator stays native.  Idempotent (normal forms are
fixed points), null-preserving.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column
from pyspark.sql.functions import pandas_udf

_FORMS = ("NFC", "NFD", "NFKC", "NFKD")
_UDFS: dict = {}


def normalize_unicode(col: Column, form: str = "NFKC") -> Column:
    """``unicodedata.normalize(form, s)`` as an Arrow-batched column
    expression.  ``form`` in NFC/NFD/NFKC/NFKD."""
    if form not in _FORMS:
        raise ValueError(f"unknown normal form {form!r}; "
                         f"expected one of {_FORMS}")
    if form not in _UDFS:

        @pandas_udf("string")
        def _norm(s: pd.Series) -> pd.Series:
            import unicodedata
            return s.map(lambda x: None if x is None
                         else unicodedata.normalize(form, x))

        _UDFS[form] = _norm
    return _UDFS[form](col)
