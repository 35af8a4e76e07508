"""Central settings (reference config/settings.py parity): defaults,
env overrides, int coercion, cached accessor."""

from __future__ import annotations

import pytest

from trial_data_ingestion_spark.config import Settings, get_settings


def test_defaults_match_reference_contract():
    s = Settings()
    assert s.max_tokens == 512
    assert s.chunk_overlap == 50
    assert s.processed_dir == "data/processed"
    assert s.batch_size == 32


def test_env_overrides_and_coercion(monkeypatch):
    monkeypatch.setenv("MAX_TOKENS", "128")
    monkeypatch.setenv("EMBEDDING_MODEL", "e5-small")
    get_settings.cache_clear()
    try:
        s = get_settings()
        assert s.max_tokens == 128
        assert s.embedding_model == "e5-small"
        assert s.chunk_overlap == 50          # untouched default
        # cached: same object until cleared
        assert get_settings() is s
    finally:
        get_settings.cache_clear()


def test_bad_int_env_raises(monkeypatch):
    monkeypatch.setenv("BATCH_SIZE", "lots")
    get_settings.cache_clear()
    try:
        with pytest.raises(ValueError, match="BATCH_SIZE"):
            get_settings()
    finally:
        get_settings.cache_clear()
