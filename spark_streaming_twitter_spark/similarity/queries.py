"""Similarity-search query registrations (filled in by similarity modules)."""
