"""Text-analysis query registrations (filled in by text modules)."""
