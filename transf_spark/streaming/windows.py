"""Placeholder — streaming queries (M3)."""
