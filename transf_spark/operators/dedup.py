"""Placeholder — filled in by milestone build plan (SURVEY.md §7)."""
