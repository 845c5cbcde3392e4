"""Committed gate-form resources (generated files live here)."""
