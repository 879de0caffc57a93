"""Utilities: torch checkpoint import, profiling helpers."""
