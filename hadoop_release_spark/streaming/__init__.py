"""Structured Streaming runners (availableNow batch bridge)."""
