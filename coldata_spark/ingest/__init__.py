"""Crawl/ingest framework (SURVEY.md §2.1 S1-S8, §2.9 R2-R5)."""
