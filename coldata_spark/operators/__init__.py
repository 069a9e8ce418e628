"""Composite operators: similarity search, dedup, upsert-merge, search pipeline."""
