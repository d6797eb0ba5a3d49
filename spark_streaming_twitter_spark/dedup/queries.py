"""Deduplication query registrations (filled in by dedup modules)."""
