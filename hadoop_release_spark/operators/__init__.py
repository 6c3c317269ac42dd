"""Composite operators (as-of join, top-k, sessionize, dedup, similarity)."""
