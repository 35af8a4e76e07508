"""Central env-var-driven settings (reference ``config/settings.py:5-22``).

The reference uses pydantic-settings (BaseSettings + ``.env`` file);
this container has no pydantic, so the same contract — defaults
overridable by environment variables, one cached accessor — is a
frozen dataclass read from ``os.environ`` (upper-cased field names,
pydantic-settings' own convention).  ``.env`` files are deliberately
not parsed: Spark jobs ship env through ``spark-submit --conf
spark.executorEnv.*`` / the driver environment, and a file silently
read from the CWD is a foot-gun on a cluster where driver and
executor CWDs differ.

Library functions keep taking explicit kwargs/`RunConfig` (explicit
beats ambient at call sites); the CLI and notebook users get the
ambient defaults from here.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, fields
from functools import lru_cache


@dataclass(frozen=True)
class Settings:
    raw_dir: str = "data/raw"
    processed_dir: str = "data/processed"
    embeddings_dir: str = "data/embeddings"

    max_tokens: int = 512
    chunk_overlap: int = 50

    embedding_model: str = "hash-64"   # offline-deterministic default
    batch_size: int = 32


def _from_env() -> Settings:
    kwargs = {}
    for f in fields(Settings):
        raw = os.environ.get(f.name.upper())
        if raw is None:
            continue
        if f.type in ("int", int):
            try:
                kwargs[f.name] = int(raw)
            except ValueError:
                raise ValueError(
                    f"env {f.name.upper()}={raw!r} is not an int")
        else:
            kwargs[f.name] = raw
    return Settings(**kwargs)


@lru_cache
def get_settings() -> Settings:
    """Cached accessor (reference ``settings.py:20-22``).  Call
    ``get_settings.cache_clear()`` in tests that mutate the env."""
    return _from_env()
