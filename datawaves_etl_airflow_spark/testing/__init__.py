"""Deterministic fixtures and test helpers (no Spark imports here)."""
